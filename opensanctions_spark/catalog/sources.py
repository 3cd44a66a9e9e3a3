"""Source-scan catalog queries (SURVEY §2.1): each parse path exercised as
serialize → distributed parse → recover, so the DuckDB oracle (which sees
only the original table) checks that the parser is lossless.

All parsing is JVM-side (from_csv / from_json / from_xml / regex) — no
Python executes per row in any of these plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register
from opensanctions_spark.sources import (
    absolutize_href,
    parse_csv_column,
    parse_html_dom,
    parse_html_table,
    parse_json_column,
    parse_xml_column,
    strip_xml_namespaces,
)
from opensanctions_spark.session import materialize


@register(
    "s1_csv_scan",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name,
       CAST(n_regionkey AS BIGINT) AS regionkey
FROM nation
""",
)
def s1_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan (S1): rows rendered to CSV lines then parsed back with
    from_csv — the landed-file DictReader pattern, distributed."""
    nation = load(spark, sf_dir, "nation")
    lines = nation.select(
        F.concat_ws(",", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")).alias("line")
    )
    parsed = lines.select(
        parse_csv_column(F.col("line"), "nationkey LONG, name STRING, regionkey LONG").alias("r")
    )
    return parsed.select("r.nationkey", "r.name", "r.regionkey")


@register(
    "s3_json_scan",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS orderkey, o_orderstatus AS status,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders
""",
)
def s3_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scan (S3, ``zavod/zavod/context.py:362-402``): documents
    serialized per-row then parsed with from_json."""
    orders = load(spark, sf_dir, "orders")
    docs = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
            )
        ).alias("doc")
    )
    parsed = docs.select(
        parse_json_column(F.col("doc"), "orderkey LONG, status STRING, total DECIMAL(18,2)").alias("r")
    )
    return parsed.select(
        "r.orderkey", "r.status", F.col("r.total").cast("double").alias("total")
    )


@register(
    "s2_xml_scan",
    oracle="""
SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name AS name,
       CAST(s_nationkey AS BIGINT) AS nationkey
FROM supplier
""",
)
def s2_xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scan (S2, ``zavod/zavod/context.py:480-491``): namespaced XML
    documents stripped (``zavod/zavod/helpers/xml.py:5``) and parsed with
    from_xml, all JVM-side."""
    supplier = load(spark, sf_dir, "supplier")
    xml = supplier.select(
        F.concat(
            F.lit('<ns:supplier xmlns:ns="http://example.com/s"><ns:suppkey>'),
            F.col("s_suppkey"),
            F.lit("</ns:suppkey><ns:name>"),
            F.col("s_name"),
            F.lit("</ns:name><ns:nationkey>"),
            F.col("s_nationkey"),
            F.lit("</ns:nationkey></ns:supplier>"),
        ).alias("doc")
    )
    stripped = xml.select(strip_xml_namespaces(F.col("doc")).alias("doc"))
    parsed = stripped.select(
        parse_xml_column(F.col("doc"), "suppkey LONG, name STRING, nationkey LONG").alias("r")
    )
    return parsed.select("r.suppkey", "r.name", "r.nationkey")


@register(
    "s5_html_table",
    oracle="""
SELECT CAST(r_regionkey AS BIGINT) AS regionkey, n_name AS name
FROM region JOIN nation ON n_regionkey = r_regionkey
""",
)
def s5_html_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table scan (S5, ``zavod/zavod/helpers/html.py:58-141``): one
    landed HTML document per region containing a <table> of its nations;
    rows+cells recovered via JVM-side regex — the 100 TB path for scraped
    pages."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    pages = (
        nation.groupBy("n_regionkey")
        .agg(
            F.concat(
                F.lit("<table>"),
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat(
                                F.lit("<tr><td>"), F.col("n_name"),
                                F.lit("</td><td><b>"), F.col("n_nationkey"),
                                F.lit("</b></td></tr>"),
                            )
                        )
                    ),
                    "",
                ),
                F.lit("</table>"),
            ).alias("html")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    parsed = parse_html_table(pages, "html")
    return parsed.select(
        F.col("r_regionkey").cast("long").alias("regionkey"),
        F.element_at("cells", 1).alias("name"),
    )


@register(
    "s4_html_dom",
    oracle="""
WITH elems AS (
  SELECT doc_id, 0 AS elem_idx, 'title' AS tag,
         'Doc ' || doc_id AS text, CAST(NULL AS VARCHAR) AS href
  FROM documents
  UNION ALL
  SELECT doc_id, 1, 'a', 'source', 'https://example.com/doc/' || doc_id
  FROM documents
  UNION ALL
  SELECT doc_id, 2, 'p', text || ' source', CAST(NULL AS VARCHAR)
  FROM documents
)
SELECT doc_id, CAST(elem_idx AS INT) AS elem_idx, tag, text, href
FROM elems
""",
)
def s4_html_dom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML DOM parse (S4, ``zavod/zavod/context.py:404-456``): landed
    pages parsed with the event-driven DOM collector (mapInPandas, stdlib
    parser) and link targets made absolute. The page embeds a nested
    <a> inside the <p>, so the oracle checks descendant-text semantics
    (p text includes the anchor text) and element close-order (title,
    a, p), which the regex table path cannot express."""
    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id"),
            F.lit("</title></head><body><p>"),
            F.col("text"),
            F.lit(' <a href="/doc/'),
            F.col("doc_id"),
            F.lit('">source</a></p></body></html>'),
        ).alias("html"),
    )
    dom = parse_html_dom(pages, html_col="html", id_col="doc_id")
    return dom.select(
        "doc_id",
        "elem_idx",
        "tag",
        "text",
        absolutize_href(F.col("href"), "https://example.com").alias("href"),
    )


@register(
    "s8_cache_ttl",
    oracle="""
WITH cache AS (
  SELECT md5('http://src/' || p_partkey) AS url_hash,
         'resp-' || p_partkey AS response,
         TIMESTAMP '2026-08-01 00:00:00'
             + (p_partkey % 20) * INTERVAL 1 DAY AS fetched_at
  FROM part WHERE p_partkey % 2 = 0
),
reqs AS (SELECT 'http://src/' || p_partkey AS url FROM part)
SELECT r.url,
       c.response,
       CAST(epoch_us(c.fetched_at) AS BIGINT) AS fetched_us
FROM reqs r
LEFT JOIN cache c
  ON md5(r.url) = c.url_hash
 AND c.fetched_at >= TIMESTAMP '2026-08-03 00:00:00'
""",
)
def s8_cache_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached HTTP fetch (S8, ``zavod/zavod/context.py:309-360,458-478``):
    the TTL-keyed cache table joined against the request set — fresh
    entries carry their response, stale/missing rows come back NULL for
    the fetch layer. Cache keyed by md5(url), TTL 10 days before the run
    date; the synthetic cache covers even part keys with staggered ages,
    so hit/miss/stale rows all occur."""
    from opensanctions_spark.sources import cache_lookup

    part = load(spark, sf_dir, "part")
    cache = part.filter(F.col("p_partkey") % 2 == 0).select(
        F.md5(F.concat(F.lit("http://src/"), F.col("p_partkey"))).alias("url_hash"),
        F.concat(F.lit("resp-"), F.col("p_partkey")).alias("response"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2026-08-01 00:00:00").cast("timestamp"))
            + (F.col("p_partkey") % 20) * 86400
        ).alias("fetched_at"),
    )
    reqs = part.select(
        F.concat(F.lit("http://src/"), F.col("p_partkey")).alias("url")
    )
    out = cache_lookup(cache, reqs, max_age_days=10, now="2026-08-13 00:00:00")
    return out.select(
        "url",
        "response",
        F.unix_micros("fetched_at").alias("fetched_us"),
    )


@register(
    "s11_llm_extraction",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
)
SELECT doc_id,
       toks[1] AS first_token,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       doc_id % 2 = 0 AS from_cache
FROM t
""",
)
def s11_llm_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM extraction source (S11, ``zavod/zavod/extract/llm.py:45-227``):
    prompt rendering + cache join + driver-side model calls for misses +
    JVM-side typed parse. The model here is the documented deterministic
    fake (no API client in this container): it answers with the doc's
    first token and token count as JSON — which the oracle recomputes
    from the raw text. Even doc_ids are pre-seeded in the cache, odd ones
    exercise the miss path through the injected callable."""
    import json
    import re as _re

    from opensanctions_spark.sources.llm import extraction_requests, run_extraction

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    reqs = extraction_requests(docs, "Extract: {doc}")
    cached_payload = F.to_json(
        F.struct(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
            )[0].alias("first_token"),
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
                )
            ).cast("long").alias("n_tokens"),
        )
    )
    cache = reqs.filter(F.col("doc_id") % 2 == 0).select(
        "request_hash", cached_payload.alias("response_raw")
    )

    def fake_model(prompt: str) -> str:
        doc = prompt.split("Extract: ", 1)[1]
        toks = _re.findall(r"[a-z0-9]+", doc.lower())
        return json.dumps(
            {"first_token": toks[0] if toks else None, "n_tokens": len(toks)}
        )

    out = run_extraction(
        reqs,
        cache,
        "first_token STRING, n_tokens BIGINT",
        extract_fn=fake_model,
    )
    return out.select(
        "doc_id",
        F.col("response.first_token").alias("first_token"),
        F.col("response.n_tokens").alias("n_tokens"),
        (F.col("doc_id") % 2 == 0).alias("from_cache"),
    )


@register(
    "s12_review_workflow",
    oracle="""
WITH extractions AS (
  SELECT 'x-' || p_partkey AS extraction_id, p_name AS value
  FROM part
),
review AS (
  SELECT 'x-' || p_partkey AS extraction_id,
         CASE WHEN p_partkey % 3 = 0 THEN 'accepted'
              WHEN p_partkey % 3 = 1 THEN 'rejected' END AS status,
         CASE WHEN p_partkey % 9 = 0 THEN upper(p_name) END AS reviewed_value
  FROM part WHERE p_partkey % 3 < 2
)
SELECT e.extraction_id,
       COALESCE(r.reviewed_value, e.value) AS value
FROM extractions e
JOIN review r ON e.extraction_id = r.extraction_id
WHERE r.status = 'accepted'
""",
)
def s12_review_workflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human review source (S12, ``zavod/zavod/stateful/review.py:44-538``):
    machine extractions joined to the accept/reject workflow table —
    accepted rows enter the pipeline (with reviewer corrections applied),
    rejected and unreviewed rows are dropped. Key mod 3 partitions the
    synthetic review state into accepted / rejected / unreviewed; every
    ninth row carries a correction."""
    from opensanctions_spark.sources.review import apply_review

    part = load(spark, sf_dir, "part")
    extractions = part.select(
        F.concat(F.lit("x-"), F.col("p_partkey")).alias("extraction_id"),
        F.col("p_name").alias("value"),
    )
    review = part.filter(F.col("p_partkey") % 3 < 2).select(
        F.concat(F.lit("x-"), F.col("p_partkey")).alias("extraction_id"),
        F.when(F.col("p_partkey") % 3 == 0, "accepted")
        .when(F.col("p_partkey") % 3 == 1, "rejected")
        .alias("status"),
        F.when(F.col("p_partkey") % 9 == 0, F.upper(F.col("p_name"))).alias(
            "reviewed_value"
        ),
        F.lit("analyst").alias("reviewer"),
    )
    return apply_review(extractions, review)


@register(
    "s6_excel_distributed",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name,
       CAST(n_regionkey AS BIGINT) AS regionkey
FROM nation
""",
)
def s6_excel_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel scan at scale (S6 via the Spark 4 Python Data Source): the
    nation dimension split into one .xlsx workbook PER REGION (a landing
    directory of many source artifacts, the multi-workbook crawl shape),
    then read back through ``format("xlsx")`` — one input partition per
    file, the stdlib parse running on executors. Same serialize → parse →
    recover oracle as ``s6_excel_scan``; the difference is the scan plan:
    driver-side createDataFrame there, a distributed partition-per-file
    source here."""
    import os
    import tempfile
    from collections import defaultdict

    from opensanctions_spark.sources import write_xlsx
    from opensanctions_spark.sources.xlsx_datasource import XlsxDataSource

    nation = load(spark, sf_dir, "nation")
    by_region: dict[int, list[list[object]]] = defaultdict(list)
    for r in (
        nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ):
        by_region[r["n_regionkey"]].append(
            [r["n_nationkey"], r["n_name"], r["n_regionkey"]]
        )
    out = tempfile.mkdtemp(prefix="osp-xlsx-dist-")
    for region, rows in by_region.items():
        write_xlsx(
            os.path.join(out, f"region{region}.xlsx"),
            ["nationkey", "name", "regionkey"],
            rows,
        )
    spark.dataSource.register(XlsxDataSource)
    df = spark.read.format("xlsx").load(os.path.join(out, "*.xlsx"))
    return df.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("name"),
        F.col("regionkey").cast("long").alias("regionkey"),
    )


@register(
    "s6_excel_scan",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name,
       CAST(n_regionkey AS BIGINT) AS regionkey
FROM nation
""",
)
def s6_excel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel scan (S6, ``zavod/zavod/helpers/excel.py:72-210``): the nation
    dimension rendered to a real .xlsx (stdlib zip+XML writer), parsed back
    with the stdlib worksheet parser — serialize → parse → recover, oracle
    sees the original table. Driver-side by design: workbooks are small
    crawler-landed artifacts (the reference parses them on one node too);
    the fixed-size dimension collect is not a data-scale operation."""
    import os
    import tempfile

    from opensanctions_spark.sources import read_excel_source, write_xlsx

    nation = load(spark, sf_dir, "nation")
    rows = [
        [r["n_nationkey"], r["n_name"], r["n_regionkey"]]
        for r in nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ]
    path = os.path.join(tempfile.mkdtemp(prefix="osp-xlsx-"), "nation.xlsx")
    write_xlsx(path, ["nationkey", "name", "regionkey"], rows)
    df = read_excel_source(spark, path)
    return df.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("name"),
        F.col("regionkey").cast("long").alias("regionkey"),
    )


@register(
    "d4_change_detection",
    oracle="""
WITH artifacts AS (
  SELECT doc_id AS artifact_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              WHEN doc_id % 3 = 0 THEN md5(text || '-stale')
              ELSE md5(text) END AS expected_hash,
         md5(text) AS actual_hash
  FROM documents
)
SELECT artifact_id, expected_hash, actual_hash,
       (expected_hash IS NULL OR expected_hash <> actual_hash) AS changed
FROM artifacts
""",
)
def d4_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change detection (D4, ``zavod/zavod/helpers/change.py:14-129``):
    hash every source artifact and compare against the recorded
    expectation in one map-only pass — docs whose expectation is stale
    (doc_id % 3) or missing (doc_id % 7) flag as changed. The
    fleet-of-crawler-guards form of the reference's per-URL assert."""
    from opensanctions_spark.operators.change import check_hashes

    docs = load(spark, sf_dir, "documents")
    artifacts = docs.select(
        F.col("doc_id").alias("artifact_id"),
        F.col("text").alias("content"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 3 == 0, F.md5(F.concat(F.col("text"), F.lit("-stale"))))
        .otherwise(F.md5(F.col("text")))
        .alias("expected_hash"),
    )
    return check_hashes(artifacts)


@register(
    "s6_xls_scan",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS nationkey, n_name AS name,
       CAST(n_regionkey AS BIGINT) AS regionkey
FROM nation
""",
)
def s6_xls_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy .xls scan (S6's last format gap,
    ``zavod/zavod/helpers/excel.py:72-210`` via xlrd): the nation
    dimension written to a REAL OLE2+BIFF8 workbook (stdlib writer:
    compound-document container, SST shared strings, NUMBER cells) and
    parsed back with the stdlib BIFF reader — serialize → parse →
    recover, oracle sees the original table."""
    import os
    import tempfile

    from opensanctions_spark.sources import read_excel_source
    from opensanctions_spark.sources.xls import write_xls

    nation = load(spark, sf_dir, "nation")
    rows = [
        [r["n_nationkey"], r["n_name"], r["n_regionkey"]]
        for r in nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ]
    path = os.path.join(tempfile.mkdtemp(prefix="osp-xls-"), "nation.xls")
    write_xls(path, ["nationkey", "name", "regionkey"], rows)
    df = read_excel_source(spark, path)
    return df.select(
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("name"),
        F.col("regionkey").cast("long").alias("regionkey"),
    )


@register(
    "s7_pdf_tables",
    oracle="""
SELECT CAST(p_partkey AS VARCHAR) AS partkey, p_name AS name,
       p_brand AS brand, p_type AS type, CAST(p_size AS VARCHAR) AS size
FROM part WHERE p_partkey <= 300
""",
)
def s7_pdf_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF table scan (S7, ``zavod/zavod/helpers/pdf.py:25-147``): a part
    dimension slice rendered to a real multi-page digitally-born PDF
    (stdlib writer, Flate-compressed content streams, headers repeated
    per page like real source PDFs, multi-word cells), parsed back via
    the positional table-recovery parser — serialize → parse → recover,
    oracle sees the original table. Driver-side by design like S6:
    crawler-landed PDFs are small single artifacts (the reference parses
    them on one node too); fleets go through
    ``read_pdf_tables_distributed``."""
    import os
    import tempfile

    from opensanctions_spark.sources import read_pdf_tables
    from opensanctions_spark.sources.pdf import write_pdf_table

    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    rows = [
        [r["p_partkey"], r["p_name"], r["p_brand"], r["p_type"], r["p_size"]]
        for r in part.select(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size"
        )
        .orderBy("p_partkey")
        .collect()
    ]
    path = os.path.join(tempfile.mkdtemp(prefix="osp-pdf-"), "part.pdf")
    write_pdf_table(
        path,
        ["partkey", "name", "brand", "type", "size"],
        rows,
        rows_per_page=40,
        headers_per_page=True,
    )
    df = read_pdf_tables(spark, path, headers_per_page=True)
    return df.select("partkey", "name", "brand", "type", "size")


@register(
    "s7_pdf_distributed",
    oracle="""
SELECT CAST(n_nationkey AS VARCHAR) AS nationkey, n_name AS name,
       CAST(n_regionkey AS VARCHAR) AS regionkey
FROM nation
""",
)
def s7_pdf_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PDF fleet scan (S7 at scale): one PDF per region
    written to a directory, scanned via the ``binaryFile`` source +
    ``mapInPandas`` — one task per file, parsing on executors, the
    driver never touches file bytes. Same serialize → parse → recover
    oracle as ``s7_pdf_tables``."""
    import os
    import tempfile
    from collections import defaultdict

    from opensanctions_spark.sources.pdf import (
        read_pdf_tables_distributed,
        write_pdf_table,
    )

    nation = load(spark, sf_dir, "nation")
    by_region: dict[int, list[list[object]]] = defaultdict(list)
    for r in (
        nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ):
        by_region[r["n_regionkey"]].append(
            [r["n_nationkey"], r["n_name"], r["n_regionkey"]]
        )
    out = tempfile.mkdtemp(prefix="osp-pdf-dist-")
    for region, rows in by_region.items():
        write_pdf_table(
            os.path.join(out, f"region{region}.pdf"),
            ["nationkey", "name", "regionkey"],
            rows,
        )
    df = read_pdf_tables_distributed(
        spark, os.path.join(out, "*.pdf"), ["nationkey", "name", "regionkey"]
    )
    return df.select("nationkey", "name", "regionkey")


@register(
    "s7_pdf_scanned",
    oracle="""
SELECT CAST(n_nationkey AS VARCHAR) AS nationkey, n_name AS name,
       CAST(n_regionkey AS VARCHAR) AS regionkey
FROM nation
""",
)
def s7_pdf_scanned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanned-PDF fleet scan (S7's OCR-adjacent path,
    ``zavod/zavod/helpers/pdf.py:25-43``): image-only PDFs (one per
    region, one embedded page image per 10 nations) scanned via
    ``binaryFile`` + ``mapInPandas`` into (path, page, image, format)
    rows, then a pluggable OCR engine maps image bytes → text in Arrow
    batches. The container has no OCR engine, so the fake here is
    DETERMINISTIC (the synthetic "scan" bytes are the latin-1 rendering
    of the page's rows and the fake OCR decodes them) — the Spark
    plumbing (binary extraction, per-page fan-out, Arrow-batched OCR
    stage, downstream JVM line parsing) is the real production path."""
    import os
    import tempfile
    from collections import defaultdict

    from opensanctions_spark.sources.pdf import (
        ocr_pages,
        read_pdf_pages_distributed,
        write_scanned_pdf,
    )

    nation = load(spark, sf_dir, "nation")
    by_region: dict[int, list[str]] = defaultdict(list)
    for r in (
        nation.select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    ):
        by_region[r["n_regionkey"]].append(
            f'{r["n_nationkey"]}|{r["n_name"]}|{r["n_regionkey"]}'
        )
    out = tempfile.mkdtemp(prefix="osp-pdf-scan-")
    for region, lines in by_region.items():
        pages = [
            "\n".join(lines[i : i + 10]).encode("latin-1")
            for i in range(0, len(lines), 10)
        ]
        write_scanned_pdf(os.path.join(out, f"region{region}.pdf"), pages)

    pages_df = read_pdf_pages_distributed(spark, os.path.join(out, "*.pdf"))
    texted = ocr_pages(
        pages_df, ocr_fn=lambda img, fmt: img.decode("latin-1")
    )
    lines = texted.select(
        F.explode(F.split(F.col("text"), "\\n")).alias("line")
    )
    parts = F.split(F.col("line"), "\\|")
    return (
        lines.filter(F.length("line") > 0)
        .select(
            parts.getItem(0).alias("nationkey"),
            parts.getItem(1).alias("name"),
            parts.getItem(2).alias("regionkey"),
        )
    )


@register(
    "audit_source_columns",
    oracle="""
SELECT 'p_type' AS column, COUNT(p_type) AS n_filled,
       COUNT(DISTINCT p_type) AS n_distinct FROM part
UNION ALL
SELECT 'p_size', COUNT(p_size), COUNT(DISTINCT p_size) FROM part
UNION ALL
SELECT 'p_retailprice', COUNT(p_retailprice),
       COUNT(DISTINCT p_retailprice) FROM part
""",
)
def audit_source_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-field coverage audit (the ``audit_data`` analogue,
    ``zavod/zavod/context.py:600-620``): the reference warns when a
    crawler leaves source fields unconsumed; here the pipeline declares
    its consumed columns and this check profiles the rest (fill count +
    distinct count per leftover column) so silently-dropped signal shows
    up in review.

    One aggregate pass computes every leftover column's profile, then a
    stack unpivots the single row — no per-column scans, no shuffle
    beyond the global agg. At 100 TB this is the cheapest query in the
    repo: Parquet statistics could even short-circuit the null counts."""
    part = load(spark, sf_dir, "part")
    consumed = {"p_partkey", "p_name", "p_brand"}
    leftover = [c for c in part.columns if c not in consumed]
    aggs = []
    for c in leftover:
        aggs.append(F.count(F.col(c)).alias(f"__f_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
    one = part.agg(*aggs)
    stack = "stack({n}, {args}) as (column, n_filled, n_distinct)".format(
        n=len(leftover),
        args=", ".join(f"'{c}', __f_{c}, __d_{c}" for c in leftover),
    )
    return one.select(F.expr(stack))


@register(
    "s10_archive_backfill",
    oracle="""
SELECT 'drifting' AS dataset,
       CAST(COUNT(*) AS BIGINT) AS n_statements,
       CAST(SUM(CAST(CAST(ROUND((c_acctbal + 1) * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS balance_sum
FROM customer
UNION ALL
SELECT 'stale' AS dataset,
       CAST(COUNT(*) AS BIGINT) AS n_statements,
       CAST(SUM(CAST(CAST(ROUND(c_acctbal * 100) AS DECIMAL(20,0)) / 100 AS DECIMAL(18,2))) AS DOUBLE) AS balance_sum
FROM customer
""",
)
def s10_archive_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive backfill (S10, ``zavod/zavod/archive/__init__.py:155-231``):
    version=None reads fall back to each dataset's LATEST SUCCESSFUL
    version via the versions.json manifest — never a directory listing of
    data files. Exercised end-to-end: a 'drifting' dataset written at two
    versions (the fallback must pick the later: balances +1) and a
    'stale' dataset written only at the first (the fallback must reach
    back to it). The oracle states what each fallback read must contain."""
    import tempfile

    from pyspark.sql import types as T

    from opensanctions_spark.sources.archive import StatementArchive

    cust = load(spark, sf_dir, "customer")

    def stmts(balance_shift: int) -> DataFrame:
        return cust.select(
            F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
            F.lit("balance").alias("prop"),
            (
                F.round((F.col("c_acctbal") + balance_shift) * 100)
                .cast("decimal(20,0)")
                / 100
            )
            .cast(T.DecimalType(18, 2))
            .alias("balance"),
            F.lit(False).alias("external"),
        )

    with tempfile.TemporaryDirectory() as tmp:
        archive = StatementArchive(spark, tmp)
        archive.write(stmts(0), "drifting", version="20260801-000000")
        archive.write(stmts(0), "stale", version="20260801-000000")
        archive.write(stmts(1), "drifting", version="20260813-000000")

        frames = []
        for name in ("drifting", "stale"):
            df = archive.read(name)  # version=None → latest successful
            frames.append(
                df.groupBy(F.lit(name).alias("dataset")).agg(
                    F.count(F.lit(1)).alias("n_statements"),
                    F.sum("balance").cast("double").alias("balance_sum"),
                )
            )
        out = frames[0].unionByName(frames[1])
        # the tempdir dies with this function — cut lineage into executor
        # block storage (stays distributed; no driver round-trip)
        return out.transform(materialize, eager=True, sever=True)


@register(
    "s11_name_extraction",
    oracle="""
SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS entity_id,
       'name' AS prop, c_name AS value
FROM customer
UNION ALL
SELECT 'c-' || CAST(c_custkey AS VARCHAR),
       CASE WHEN c_custkey % 3 = 0 THEN 'previousName' ELSE 'alias' END,
       (CASE WHEN c_custkey % 3 = 0 THEN 'Old-' ELSE 'Ali-' END)
         || CAST(c_custkey AS VARCHAR)
FROM customer
""",
)
def s11_name_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM name-extraction pack
    (``zavod/zavod/extract/names/clean.py`` on the S11 machinery):
    every customer carries a raw-name list — the primary name, a
    marker-prefixed alias or former name, a blank and a duplicate (both
    dropped by the in-row cleaning) — rendered to the SimpleNames
    prompt. Even custkeys are pre-seeded in the response cache, odd
    ones go through the injected deterministic fake model (no API
    client in this container); both produce the same SimpleNames JSON,
    which ``names_to_statements`` explodes into per-(prop, value) name
    statements that the oracle recomputes from the source columns."""
    import json as _json

    from opensanctions_spark.sources.names_extract import (
        INPUT_MARKER,
        extract_names,
        name_extraction_requests,
        names_to_statements,
    )

    cust = load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    second = F.when(
        ck % 3 == 0, F.concat(F.lit("f/k/a Old-"), ck)
    ).otherwise(F.concat(F.lit("a.k.a. Ali-"), ck))
    base = cust.select(
        F.concat(F.lit("c-"), ck).alias("entity_id"),
        ck.alias("custkey"),
        F.lit("Person").alias("schema"),
        F.array(
            F.col("c_name"), second, F.lit("  "), F.col("c_name")
        ).alias("raw_names"),
    )
    reqs = name_extraction_requests(base)
    cached_payload = F.to_json(
        F.struct(
            F.array(F.col("c_name")).alias("name"),
            F.when(
                ck % 3 != 0, F.array(F.concat(F.lit("Ali-"), ck))
            ).otherwise(F.array().cast("array<string>")).alias("alias"),
            F.array().cast("array<string>").alias("weakAlias"),
            F.when(
                ck % 3 == 0, F.array(F.concat(F.lit("Old-"), ck))
            ).otherwise(F.array().cast("array<string>")).alias("previousName"),
            F.array().cast("array<string>").alias("abbreviation"),
        )
    )
    cache = (
        cust.filter(ck % 2 == 0)
        .select(F.concat(F.lit("c-"), ck).alias("entity_id"), "c_name", ck)
        .join(reqs.select("entity_id", "request_hash"), "entity_id")
        .select("request_hash", cached_payload.alias("response_raw"))
    )

    def fake_names_model(prompt: str) -> str:
        payload = _json.loads(prompt.split(INPUT_MARKER, 1)[1])
        out: dict[str, list[str]] = {
            "name": [], "alias": [], "weakAlias": [],
            "previousName": [], "abbreviation": [],
        }
        for s in payload["strings"]:
            if s.startswith("f/k/a "):
                out["previousName"].append(s[len("f/k/a "):])
            elif s.startswith("a.k.a. "):
                out["alias"].append(s[len("a.k.a. "):])
            else:
                out["name"].append(s)
        return _json.dumps(out, ensure_ascii=False)

    extracted = extract_names(reqs, cache, extract_fn=fake_names_model)
    stmts = names_to_statements(
        extracted, dataset="names", entity_col="entity_id"
    )
    return stmts.select("entity_id", "prop", "value")


@register(
    "s12_reviewed_names_emit",
    oracle="""
WITH originals AS (
  SELECT 'c-' || c_custkey AS entity_id, 'name' AS prop, c_name AS value,
         c_custkey AS k
  FROM customer
),
decisions AS (
  SELECT 'c-' || c_custkey AS entity_id,
         CASE WHEN c_custkey % 5 = 0 THEN 'accepted' ELSE 'rejected' END AS status
  FROM customer WHERE c_custkey % 5 IN (0, 1) AND c_custkey <= 4000
)
SELECT o.entity_id,
       CASE WHEN d.status = 'accepted' THEN 'alias' ELSE o.prop END AS prop,
       CASE WHEN d.status = 'accepted' THEN upper(o.value) ELSE o.value END AS value,
       CASE WHEN d.status = 'accepted' THEN 'analyst' END AS origin
FROM originals o LEFT JOIN decisions d USING (entity_id)
""",
)
def s12_reviewed_names_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reviewed-names emit (the round-6 reviewed-names surface,
    ``zavod/zavod/helpers/names.py:729-790`` bulk form): the review
    table's accepted rows carry a ``{prop: [values]}`` JSON payload —
    the exact shape the driver-side bridge writes
    (``helpers.reviews_to_rows``) — which REPLACES the entity's original
    name rows with the reviewed categorisation (here: name → alias,
    uppercased by the reviewer) and stamps the reviewer as origin;
    rejected and unposted entities keep their original rows. Plan:
    broadcast anti-join + map-only payload explode — the
    fact-proportional originals never shuffle. The fixture review table
    carries a FIXED id cap (custkey ≤ 4000) on top of the mod-5 split:
    a real review table is bounded by analyst throughput, and the
    exhibit must keep the broadcast defensible at every SF rather than
    broadcast a table that scales with the corpus."""
    from opensanctions_spark.sources.review import apply_reviewed_names

    cust = load(spark, sf_dir, "customer")
    originals = cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        F.lit("name").alias("prop"),
        F.col("c_name").alias("value"),
    )
    review = cust.filter(
        (F.col("c_custkey") % 5 < 2) & (F.col("c_custkey") <= 4000)
    ).select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("extraction_id"),
        F.when(F.col("c_custkey") % 5 == 0, "accepted")
        .otherwise("rejected")
        .alias("status"),
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.to_json(F.struct(F.array(F.upper(F.col("c_name"))).alias("alias"))),
        ).alias("reviewed_value"),
        F.lit("analyst").alias("reviewer"),
    )
    return apply_reviewed_names(originals, review)


@register(
    "s14_un_sc_parse",
    oracle="""
WITH base AS (
  SELECT n_nationkey AS k, n_name AS nm FROM nation WHERE n_nationkey % 2 = 0
)
SELECT 'unsc-' || CAST(1000 + k AS VARCHAR) AS entity_id, 'firstName' AS prop,
       nm AS value
FROM base
UNION ALL
SELECT 'unsc-' || CAST(1000 + k AS VARCHAR), 'lastName', 'UNIT' FROM base
UNION ALL
SELECT 'unsc-' || CAST(1000 + k AS VARCHAR), 'name', nm || ' UNIT' FROM base
UNION ALL
SELECT 'unsc-' || CAST(1000 + k AS VARCHAR), 'topics', 'sanction' FROM base
""",
)
def s14_un_sc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UN Security Council consolidated-list parse
    (``zavod/zavod/shed/un_sc.py`` via the round-6 compat port): a
    UN-shaped XML document synthesized from the nation DIMENSION (25
    rows at every SF — the driver-side parse loop is bounded by
    construction, like the S4/S5 HTML exhibits), parsed with the shed's
    regime-prefix filter (QD entries = even keys kept, KP = odd keys
    filtered out) and the UN first/last-name-only semantics, emitted
    through the compat context and compared as statements. Proves the
    crawler-boundary parse family against the same DuckDB gate as the
    engine operators."""
    from types import SimpleNamespace
    from xml.etree import ElementTree

    from opensanctions_spark.crawler import CrawlerContext
    from opensanctions_spark.shed import un_sc

    nation = load(spark, sf_dir, "nation")
    rows = nation.select("n_nationkey", "n_name").collect()  # 25: dimension
    parts = ["<CONSOLIDATED_LIST><INDIVIDUALS>"]
    for r in sorted(rows, key=lambda x: x["n_nationkey"]):
        regime = "QDi" if r["n_nationkey"] % 2 == 0 else "KPi"
        parts.append(
            f"<INDIVIDUAL><DATAID>{1000 + r['n_nationkey']}</DATAID>"
            f"<REFERENCE_NUMBER>{regime}.{r['n_nationkey']:03d}</REFERENCE_NUMBER>"
            f"<FIRST_NAME>{r['n_name']}</FIRST_NAME>"
            f"<SECOND_NAME>UNIT</SECOND_NAME></INDIVIDUAL>"
        )
    parts.append("</INDIVIDUALS></CONSOLIDATED_LIST>")
    doc = ElementTree.fromstring("".join(parts))

    ctx = CrawlerContext(
        spark, SimpleNamespace(name="unsc", metadata={}, lookups={})
    )
    for _node, entity in un_sc.get_persons(
        ctx, "unsc", doc, [un_sc.Regime.DAESH_AL_QAIDA]
    ):
        ctx.emit(entity)
    return ctx.statements_df().select("entity_id", "prop", "value")


@register(
    "s14_fsf_parse",
    oracle="""
WITH base AS (
  SELECT n_nationkey AS k, n_name AS nm FROM nation WHERE n_nationkey % 2 = 0
)
SELECT 'eu-fsf-eu-' || CAST(1000 + k AS VARCHAR) || '-0' AS entity_id,
       'name' AS prop, nm || ' UNIT' AS value
FROM base
UNION ALL
SELECT 'eu-fsf-eu-' || CAST(1000 + k AS VARCHAR) || '-0', 'firstName', nm
FROM base
UNION ALL
SELECT 'eu-fsf-eu-' || CAST(1000 + k AS VARCHAR) || '-0', 'lastName', 'UNIT'
FROM base
UNION ALL
SELECT 'eu-fsf-eu-' || CAST(1000 + k AS VARCHAR) || '-0', 'topics', 'sanction'
FROM base
""",
)
def s14_fsf_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EU Financial Sanctions Files parse (``zavod/zavod/shed/fsf.py`` via
    the round-6 compat port — the family the verbatim ``datasets/eu/fsf``
    crawler drives in tests/test_crawler_import_swap.py): an FSF-shaped
    XML export synthesized from the nation DIMENSION (25 rows at every SF
    — driver-side parse bounded by construction), with even keys as
    ``person`` subject types (parsed: strong name alias → name/first/last
    + the sanction topic) and odd keys under an unmapped subject type
    (skipped with a warning — the reference's unknown-subject guard,
    fsf.py:116-127). Statements compared against the closed form."""
    from types import SimpleNamespace
    from xml.etree import ElementTree

    from opensanctions_spark.crawler import CrawlerContext
    from opensanctions_spark.functions.lookups import Lookup, LookupOption
    from opensanctions_spark.shed import fsf

    nation = load(spark, sf_dir, "nation")
    rows = nation.select("n_nationkey", "n_name").collect()  # 25: dimension
    parts = ["<export>"]
    for r in sorted(rows, key=lambda x: x["n_nationkey"]):
        k = r["n_nationkey"]
        code = "person" if k % 2 == 0 else "vessel"  # vessel: unmapped
        parts.append(
            f'<sanctionEntity euReferenceNumber="EU.{1000 + k}.0">'
            f'<subjectType code="{code}"/>'
            f'<nameAlias wholeName="{r["n_name"]} UNIT"'
            f' firstName="{r["n_name"]}" lastName="UNIT" strong="true"'
            f' nameLanguage="en"/>'
            f"</sanctionEntity>"
        )
    parts.append("</export>")
    doc = ElementTree.fromstring("".join(parts))

    lookups = {
        "subject_type": Lookup("subject_type", [
            LookupOption(match=["person"], result={"value": "Person"}),
        ]),
    }
    ctx = CrawlerContext(
        spark, SimpleNamespace(name="eu_fsf", metadata={}, lookups=lookups)
    )
    for entry in doc.findall("./sanctionEntity"):
        fsf.parse_entry(ctx, entry)
    return ctx.statements_df().select("entity_id", "prop", "value")
