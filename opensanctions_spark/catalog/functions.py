"""Scalar-function catalog queries (SURVEY §2.8 F1/F5/F6/F7/F10/F11/F13):
each cleaning family applied to synthetically-dirtied table values, with
the DuckDB oracle computing the expected clean form directly from the
source columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register
from opensanctions_spark.functions.addresses import (
    compose_address,
    extract_po_box,
    normalize_address,
)
from opensanctions_spark.functions.crypto import extract_wallets
from opensanctions_spark.functions.dates import (
    check_person_cutoff,
    parse_date,
    within_max_age,
)
from opensanctions_spark.functions.identifiers import valid_imo, valid_inn
from opensanctions_spark.functions.names import (
    clean_name,
    is_name_regular,
    reorder_comma_name,
)
from opensanctions_spark.functions.numbers import extract_amount, extract_unit, normalize_unit
from opensanctions_spark.functions.positions import occupancy_status

RUN_DATE = "2026-08-13"


@register(
    "f1_f2_date_parse",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
       CASE o_orderkey % 3
         WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
         WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
         ELSE strftime(o_orderdate, '%Y')
       END AS parsed,
       (CASE o_orderkey % 3
         WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
         WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
         ELSE strftime(o_orderdate, '%Y')
       END) >= CAST(CAST('2026-08-13' AS DATE) - INTERVAL 35 YEAR AS VARCHAR)
       AS recent
FROM orders
""",
)
def f1_f2_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parse → ISO prefix strings (F1/F2) + recency
    predicate on prefixes (P6). Input dates are rendered in three source
    formats (German dotted, US slashed, bare year) and must come back as
    day- or year-precision ISO prefixes."""
    orders = load(spark, sf_dir, "orders")
    messy = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "dd.MM.yyyy"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "yyyy"))
    )
    parsed = parse_date(messy, ["dd.MM.yyyy", "MM/dd/yyyy"])
    return orders.select(
        F.col("o_orderkey").alias("orderkey"),
        parsed.alias("parsed"),
        within_max_age(parsed, RUN_DATE, 35).alias("recent"),
    )


@register(
    "f5_name_cleaning",
    oracle="""
SELECT 'c-' || c_custkey AS id,
       CASE WHEN c_custkey % 2 = 0
            THEN c_name || ' ' || c_mktsegment
            ELSE c_name END AS cleaned,
       TRUE AS regular
FROM customer
""",
)
def f5_name_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name cleaning chain (F5): honorific stripping, comma-form
    reordering ("SEGMENT, Name" → "Name SEGMENT"), whitespace squashing,
    plausibility heuristic — regex column fns only."""
    cust = load(spark, sf_dir, "customer")
    messy = (
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(F.lit("Dr.  "), F.col("c_mktsegment"), F.lit(" ,  "), F.col("c_name")),
        )
        .otherwise(F.concat(F.lit("Mr. Prof. "), F.col("c_name")))
    )
    # comma reorder needs the squashed form: "SEGMENT, Name" (strip first)
    cleaned = clean_name(reorder_comma_name(clean_name(messy)))
    return cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("id"),
        cleaned.alias("cleaned"),
        is_name_regular(cleaned).alias("regular"),
    )


@register(
    "f6_number_parse",
    oracle="""
SELECT 'p-' || p_partkey AS id,
       CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 1000 AS DOUBLE) AS grams,
       'g' AS unit
FROM part
""",
)
def f6_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number + unit normalization (F6): '1234.56 kg' → (1234560.0, 'g')
    via regex extract, decimal cast, factor-table multiply."""
    part = load(spark, sf_dir, "part")
    messy = F.concat(
        F.col("p_retailprice").cast("decimal(18,2)").cast("string"), F.lit(" kg")
    )
    amount = extract_amount(messy)
    unit = extract_unit(messy)
    grams, canonical = normalize_unit(amount, unit)
    return part.select(
        F.concat(F.lit("p-"), F.col("p_partkey")).alias("id"),
        grams.alias("grams"),
        canonical.alias("unit"),
    )


@register(
    "f7_identifier_checksums",
    oracle="""
WITH base AS (
  SELECT s_suppkey,
         lpad(CAST((s_suppkey * 37) % 1000000 AS VARCHAR), 6, '0') AS b6
  FROM supplier
),
calc AS (
  SELECT s_suppkey, b6,
         (CAST(substr(b6,1,1) AS INT) * 7 + CAST(substr(b6,2,1) AS INT) * 6 +
          CAST(substr(b6,3,1) AS INT) * 5 + CAST(substr(b6,4,1) AS INT) * 4 +
          CAST(substr(b6,5,1) AS INT) * 3 + CAST(substr(b6,6,1) AS INT) * 2) % 10
         AS check_digit
  FROM base
)
SELECT 's-' || s_suppkey AS id,
       b6 || CAST(CASE WHEN s_suppkey % 2 = 0 THEN check_digit
                       ELSE (check_digit + 1) % 10 END AS VARCHAR) AS imo,
       s_suppkey % 2 = 0 AS imo_ok
FROM calc
""",
)
def f7_identifier_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identifier checksum validation (F7): synthesize IMO numbers with a
    correct check digit for even suppliers and a corrupted one for odd —
    ``valid_imo`` (pure column math) must recover exactly the parity."""
    supplier = load(spark, sf_dir, "supplier")
    b6 = F.lpad(((F.col("s_suppkey") * 37) % 1000000).cast("string"), 6, "0")
    check = sum(
        F.substring(b6, i, 1).cast("int") * (8 - i) for i in range(1, 7)
    ) % 10
    digit = F.when(F.col("s_suppkey") % 2 == 0, check).otherwise((check + 1) % 10)
    imo = F.concat(b6, digit.cast("string"))
    return supplier.select(
        F.concat(F.lit("s-"), F.col("s_suppkey")).alias("id"),
        imo.alias("imo"),
        valid_imo(imo).alias("imo_ok"),
    )


@register(
    "f10_address_compose",
    oracle="""
SELECT 's-' || s_suppkey AS id,
       s_name || ' Street 5, ' || n_name AS composed,
       CASE WHEN s_suppkey % 4 = 0 THEN CAST(s_suppkey AS VARCHAR) END AS po_box
FROM supplier JOIN nation ON n_nationkey = s_nationkey
""",
)
def f10_address_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address composition + PO-box split (F10): compose (street, country)
    with empty-part skipping; extract the box number from 'P.O. Box N'
    forms every 4th row."""
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    joined = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    street = F.concat(F.col("s_name"), F.lit("  Street 5"))
    composed = normalize_address(
        compose_address(street, F.lit(""), F.col("n_name"))
    )
    with_box = F.when(
        F.col("s_suppkey") % 4 == 0,
        F.concat(F.lit("P.O. Box "), F.col("s_suppkey"), F.lit(", "), composed),
    ).otherwise(composed)
    return joined.select(
        F.concat(F.lit("s-"), F.col("s_suppkey")).alias("id"),
        composed.alias("composed"),
        extract_po_box(with_box).alias("po_box"),
    )


@register(
    "f11_crypto_wallets",
    oracle="""
SELECT 'c-' || c_custkey AS id,
       CASE WHEN c_custkey % 3 = 0
            THEN '0x' || substr(md5(c_name), 1, 32) || substr(md5(c_mktsegment), 1, 8)
       END AS wallet
FROM customer
""",
)
def f11_crypto_wallets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto-wallet extraction (F11): pull ETH addresses out of free text
    with regexp_extract_all; rows without a wallet yield null."""
    cust = load(spark, sf_dir, "customer")
    addr = F.concat(
        F.lit("0x"),
        F.substring(F.md5(F.col("c_name")), 1, 32),
        F.substring(F.md5(F.col("c_mktsegment")), 1, 8),
    )
    text = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(F.lit("send funds to "), addr, F.lit(" asap")),
    ).otherwise(F.lit("no wallet here, just 0xZZ and noise"))
    wallets = extract_wallets(text, "ETH")
    return cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("id"),
        F.get(wallets, 0).alias("wallet"),
    )


@register(
    "f13_occupancy_status",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
       CASE
         WHEN o_orderkey % 4 = 0 THEN            -- has end date
           CASE
             WHEN strftime(o_orderdate + INTERVAL 2 YEAR, '%Y-%m-%d') > '2026-08-13'
               THEN 'current'
             WHEN CAST(CAST(strftime(o_orderdate + INTERVAL 2 YEAR, '%Y') AS INT) + 5 AS VARCHAR)
                  || substr(strftime(o_orderdate + INTERVAL 2 YEAR, '%Y-%m-%d'), 5, 6) >= '2026-08-13'
               THEN 'ended'
           END
         WHEN o_orderkey % 4 = 1 THEN 'unknown'  -- no dates at all
         ELSE 'current'                          -- start in the past, no end
       END AS status
FROM orders
""",
)
def f13_occupancy_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEP occupancy state machine (F13): dated-end → current/ended/expired
    by the after-office grace window; open-ended with past start →
    current; dateless → unknown. All string comparisons on ISO prefixes."""
    orders = load(spark, sf_dir, "orders")
    start = F.when(
        F.col("o_orderkey") % 4 != 1, F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    end = F.when(
        F.col("o_orderkey") % 4 == 0,
        F.date_format(F.expr("o_orderdate + INTERVAL 2 YEAR"), "yyyy-MM-dd"),
    )
    status = occupancy_status(start, end, F.lit("gov.national"), RUN_DATE)
    return orders.select(
        F.col("o_orderkey").alias("orderkey"), status.alias("status")
    )


@register(
    "p7_person_cutoff",
    oracle="""
SELECT 'c-' || c_custkey AS id,
       '19' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') AS birth,
       CASE WHEN c_custkey % 5 = 0
            THEN CAST(1990 + c_custkey % 40 AS VARCHAR) END AS death,
       (c_custkey % 5 = 0 AND 1990 + c_custkey % 40 <= 2026)
       OR ('19' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')) < '1916-08-13'
       AS dropped
FROM customer
""",
)
def p7_person_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person cutoff filter (P7): drop long-dead or implausibly-old
    persons before enrichment expansion — prefix-date string compares
    only (birth year 19XX from the key; every 5th person has a death
    year)."""
    cust = load(spark, sf_dir, "customer")
    birth = F.concat(
        F.lit("19"), F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0")
    )
    death = F.when(
        F.col("c_custkey") % 5 == 0,
        (F.lit(1990) + F.col("c_custkey") % 40).cast("string"),
    )
    return cust.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("id"),
        birth.alias("birth"),
        death.alias("death"),
        check_person_cutoff(birth, death, RUN_DATE).alias("dropped"),
    )


@register(
    "wikidata_deref",
    oracle="""
WITH subjects AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN 'bogus-' || c_custkey
              ELSE 'Q' || (c_custkey + 1) END AS qid
  FROM customer
),
redirects AS (
  SELECT 'Q' || (o_custkey + 1) AS qid,
         'Q' || (o_custkey + 1000000) AS target
  FROM orders WHERE o_orderkey % 97 = 0
),
dedup AS (
  SELECT qid, MIN(target) AS target FROM redirects GROUP BY qid
)
SELECT s.c_custkey AS custkey,
       CASE WHEN s.qid NOT LIKE 'Q%' THEN NULL
            ELSE COALESCE(d.target, s.qid) END AS qid
FROM subjects s LEFT JOIN dedup d ON s.qid = d.qid
""",
)
def wikidata_deref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikidata QID dereferencing
    (``zavod/zavod/helpers/wikidata.py:8-46``): invalid ids null out,
    merge-redirected QIDs resolve through the cached redirects table in
    one join, everything else passes through — the static-source
    hygiene pass run over a whole column instead of per-entity API
    calls."""
    from opensanctions_spark.functions.wikidata import deref_qids

    cust = load(spark, sf_dir, "customer")
    subjects = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.when(
            F.col("c_custkey") % 11 == 0,
            F.concat(F.lit("bogus-"), F.col("c_custkey")),
        )
        .otherwise(F.concat(F.lit("Q"), F.col("c_custkey") + 1))
        .alias("qid"),
    )
    orders = load(spark, sf_dir, "orders")
    redirects = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.concat(F.lit("Q"), F.col("o_custkey") + 1).alias("qid"),
            F.concat(F.lit("Q"), F.col("o_custkey") + 1000000).alias("target"),
        )
        .groupBy("qid")
        .agg(F.min("target").alias("target"))
    )
    return deref_qids(subjects, "qid", redirects)


@register(
    "f16_make_security",
    oracle="""
WITH base AS (
  SELECT (CASE s_suppkey % 7 WHEN 0 THEN 'us' WHEN 1 THEN 'de'
          WHEN 2 THEN 'xs' WHEN 3 THEN 'gb' WHEN 4 THEN 'cs'
          WHEN 5 THEN 'fr' ELSE 'jp' END)
         || lpad(CAST(s_suppkey AS VARCHAR), 10, '0') AS isin
  FROM supplier
),
rows AS (
  SELECT 'isin-' || upper(isin) AS entity_id, 'isin' AS prop,
         upper(isin) AS value, CAST(NULL AS VARCHAR) AS origin
  FROM base
  UNION ALL
  SELECT 'isin-' || upper(isin), 'country', substr(upper(isin), 1, 2),
         'inferred'
  FROM base
  WHERE substr(upper(isin), 1, 2) NOT IN ('XS','XD','XC','XF','CS','QS')
)
SELECT entity_id, prop, value, origin FROM rows
""",
)
def f16_make_security(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Security-entity helper (``zavod/zavod/helpers/securities.py:8-17``):
    lowercase source ISINs (synthesized from supplier keys, every 3rd/5th
    drawing an XS/CS pseudo-prefix) → ``isin-`` ids, the upper-cased isin
    statement, and the prefix country with ``origin='inferred'`` — pseudo
    prefixes emit no country row. Map-only projection, P5 guard does the
    country filtering."""
    from opensanctions_spark.functions.securities import make_security_statements

    sup = load(spark, sf_dir, "supplier")
    prefix = (
        F.when(F.col("s_suppkey") % 7 == 0, "us")
        .when(F.col("s_suppkey") % 7 == 1, "de")
        .when(F.col("s_suppkey") % 7 == 2, "xs")
        .when(F.col("s_suppkey") % 7 == 3, "gb")
        .when(F.col("s_suppkey") % 7 == 4, "cs")
        .when(F.col("s_suppkey") % 7 == 5, "fr")
        .otherwise("jp")
    )
    base = sup.select(
        F.concat(
            prefix, F.lpad(F.col("s_suppkey").cast("string"), 10, "0")
        ).alias("isin")
    )
    return make_security_statements(base, "isin", dataset="sec").select(
        "entity_id", "prop", "value", "origin"
    )


@register(
    "f17_make_identification",
    oracle="""
WITH base AS (
  SELECT 'c-' || c_custkey AS holder_id,
         CASE WHEN c_custkey % 5 = 0 THEN NULL
              ELSE 'P' || lpad(CAST(c_custkey AS VARCHAR), 8, '0') END AS number,
         CASE c_custkey % 3 WHEN 0 THEN 'passport'
                            WHEN 1 THEN 'national id'
                            ELSE NULL END AS doc_type,
         CASE WHEN c_custkey % 4 = 0 THEN NULL
              ELSE (CASE c_custkey % 6 WHEN 0 THEN 'us' WHEN 1 THEN 'de'
                    WHEN 2 THEN 'fr' WHEN 3 THEN 'gb' WHEN 4 THEN 'jp'
                    ELSE 'br' END) END AS country
  FROM customer
),
live AS (
  SELECT *,
         'id-' || md5(holder_id || '|' || number || '|'
                      || coalesce(doc_type, '')) AS ident_id,
         CASE WHEN doc_type = 'passport'
              THEN 'Passport' ELSE 'Identification' END AS ident_schema
  FROM base WHERE number IS NOT NULL
),
rows AS (
  SELECT ident_id AS entity_id, ident_schema AS "schema",
         'holder' AS prop, holder_id AS value FROM live
  UNION ALL
  SELECT ident_id, ident_schema, 'number', number FROM live
  UNION ALL
  SELECT ident_id, ident_schema, 'type', doc_type FROM live
  WHERE doc_type IS NOT NULL
  UNION ALL
  SELECT ident_id, ident_schema, 'country', country FROM live
  WHERE country IS NOT NULL
  UNION ALL
  SELECT holder_id, 'Person',
         CASE WHEN doc_type = 'passport'
              THEN 'passportNumber' ELSE 'idNumber' END,
         number
  FROM live
)
SELECT entity_id, "schema", prop, value FROM rows
""",
)
def f17_make_identification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identification/Passport factory
    (``zavod/zavod/helpers/identification.py:9-76``): synthesized
    document rows over customers (every 5th number NULL → dropped, the
    reference's number-is-None early return; doc_type cycles
    passport / national id / NULL) → one map-only stack projection
    emitting the Identification entity's holder/number/type/country
    statements plus the holder's idNumber/passportNumber back-reference.
    Passport rows take the Passport schema, exactly the reference's
    ``passport=`` branch."""
    from opensanctions_spark.functions.identifications import (
        make_identification_statements,
    )

    cust = load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    country = F.when(
        ck % 4 != 0,
        F.when(ck % 6 == 0, "us")
        .when(ck % 6 == 1, "de")
        .when(ck % 6 == 2, "fr")
        .when(ck % 6 == 3, "gb")
        .when(ck % 6 == 4, "jp")
        .otherwise("br"),
    )
    base = cust.select(
        F.concat(F.lit("c-"), ck).alias("holder_id"),
        F.when(
            ck % 5 != 0, F.concat(F.lit("P"), F.lpad(ck.cast("string"), 8, "0"))
        ).alias("number"),
        F.when(ck % 3 == 0, "passport")
        .when(ck % 3 == 1, "national id")
        .alias("doc_type"),
        country.alias("country"),
    )
    out = make_identification_statements(
        base,
        dataset="ids",
        holder_col="holder_id",
        number_col="number",
        doc_type_col="doc_type",
        country_col="country",
        passport=F.col("doc_type") == "passport",
    )
    return out.select("entity_id", "schema", "prop", "value")


@register(
    "f18_make_sanction",
    oracle="""
WITH base AS (
  SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS entity_id,
         CASE WHEN c_custkey % 2 = 0 THEN 'Person' ELSE 'LegalEntity' END
           AS subj_schema,
         CASE WHEN c_custkey % 3 = 0 THEN NULL
              ELSE 'k' || CAST(c_custkey % 3 AS VARCHAR) END AS key,
         'Program ' || CAST(c_custkey % 4 AS VARCHAR) AS program_name,
         CASE c_custkey % 4 WHEN 0 THEN 'UN-SCISIL' WHEN 1 THEN 'US-BIS-DPL'
              WHEN 2 THEN 'XX-UNKNOWN' ELSE NULL END AS program_key,
         'src-' || CAST(c_custkey % 4 AS VARCHAR) AS source_program_key,
         CASE c_custkey % 5 WHEN 1 THEN '2019' WHEN 2 THEN '2024-05'
              WHEN 3 THEN '2026-01-04' WHEN 4 THEN '2027' ELSE NULL END
           AS start_raw,
         CASE c_custkey % 6 WHEN 1 THEN '2020-01-01' WHEN 2 THEN '2026'
              WHEN 3 THEN '2099-12-31' WHEN 4 THEN 'see annex'
              WHEN 5 THEN '2026-08' ELSE NULL END AS end_raw
  FROM customer
),
live AS (
  SELECT *,
    'osp-' || md5('Sanction|' || entity_id ||
                  CASE WHEN key IS NULL THEN '' ELSE '|' || key END) AS sid,
    CASE WHEN start_raw IS NOT NULL
          AND regexp_matches(start_raw, '^\\d{4}(-\\d{2}(-\\d{2})?)?$')
         THEN start_raw END AS start_c,
    CASE WHEN end_raw IS NOT NULL
          AND regexp_matches(end_raw, '^\\d{4}(-\\d{2}(-\\d{2})?)?$')
         THEN end_raw END AS end_c,
    COALESCE(program_key IN ('UN-SCISIL', 'US-BIS-DPL'), FALSE) AS resolved
  FROM base
),
status AS (
  SELECT *,
    CASE WHEN end_c IS NOT NULL THEN
      CASE WHEN (start_c IS NULL OR
                 start_c || substr('0000-01-01', length(start_c) + 1)
                   <= '2026-08-13')
            AND (end_c || substr('9999-12-31', length(end_c) + 1)
                   >= '2026-08-13')
           THEN 'active' ELSE 'inactive' END
    END AS status_v
  FROM live
),
rows AS (
  SELECT sid AS entity_id, 'Sanction' AS "schema", 'entity' AS prop,
         entity_id AS value, CAST(NULL AS VARCHAR) AS origin,
         CAST(NULL AS VARCHAR) AS original_value
  FROM status
  UNION ALL
  SELECT sid, 'Sanction', 'country', 'us', 'metadata', NULL FROM status
  UNION ALL
  SELECT sid, 'Sanction', 'authority', 'Test Authority', 'metadata', NULL
  FROM status
  UNION ALL
  SELECT sid, 'Sanction', 'sourceUrl', 'https://example.com/sanctions',
         'metadata', NULL
  FROM status
  UNION ALL
  SELECT sid, 'Sanction', 'program', program_name, NULL, NULL FROM status
  UNION ALL
  SELECT sid, 'Sanction', 'programId', program_key, 'metadata',
         source_program_key
  FROM status WHERE resolved
  UNION ALL
  SELECT sid, 'Sanction', 'programUrl',
         CASE program_key WHEN 'UN-SCISIL' THEN 'https://un.example/scisil'
              WHEN 'US-BIS-DPL' THEN 'https://bis.example/dpl' END,
         'metadata', NULL
  FROM status WHERE resolved
  UNION ALL
  SELECT entity_id, subj_schema, 'programId', program_key, 'metadata', NULL
  FROM status WHERE resolved
  UNION ALL
  SELECT sid, 'Sanction', 'startDate', start_c, NULL, NULL
  FROM status WHERE start_c IS NOT NULL
  UNION ALL
  SELECT sid, 'Sanction', 'endDate', end_c, NULL, NULL
  FROM status WHERE end_c IS NOT NULL
  UNION ALL
  SELECT sid, 'Sanction', 'status', status_v, NULL, NULL
  FROM status WHERE status_v IS NOT NULL
)
SELECT entity_id, "schema", prop, value, origin, original_value FROM rows
""",
)
def f18_make_sanction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sanction factory (``zavod/zavod/helpers/sanctions.py:21-113`` —
    the reference's most-used crawler helper): synthesized designation
    rows over customers exercise every branch — keyed vs unkeyed ids,
    publisher country/authority/sourceUrl with ``origin=metadata``,
    program-registry resolution (one unknown key that must emit
    nothing), prefix-date start/end at year/month/day precision, one
    unparseable end date (``see annex`` — dropped, ValueError parity via
    ``invalid_prefix_dates``), and the construction-time active/inactive
    status at RUN_TIME. One map-only stack projection, no shuffle."""
    from opensanctions_spark.functions.sanctions import make_sanction_statements

    cust = load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    base = cust.select(
        F.concat(F.lit("c-"), ck).alias("entity_id"),
        F.when(ck % 2 == 0, "Person").otherwise("LegalEntity").alias("subj_schema"),
        F.when(ck % 3 != 0, F.concat(F.lit("k"), ck % 3)).alias("key"),
        F.concat(F.lit("Program "), ck % 4).alias("program_name"),
        F.when(ck % 4 == 0, "UN-SCISIL")
        .when(ck % 4 == 1, "US-BIS-DPL")
        .when(ck % 4 == 2, "XX-UNKNOWN")
        .alias("program_key"),
        F.concat(F.lit("src-"), ck % 4).alias("source_program_key"),
        F.when(ck % 5 == 1, "2019")
        .when(ck % 5 == 2, "2024-05")
        .when(ck % 5 == 3, "2026-01-04")
        .when(ck % 5 == 4, "2027")
        .alias("start_raw"),
        F.when(ck % 6 == 1, "2020-01-01")
        .when(ck % 6 == 2, "2026")
        .when(ck % 6 == 3, "2099-12-31")
        .when(ck % 6 == 4, "see annex")
        .when(ck % 6 == 5, "2026-08")
        .alias("end_raw"),
    )
    out = make_sanction_statements(
        base,
        dataset="sanc",
        entity_col="entity_id",
        publisher_name="Test Authority",
        publisher_country="us",
        source_url="https://example.com/sanctions",
        key_col="key",
        program_name_col="program_name",
        program_key_col="program_key",
        source_program_key_col="source_program_key",
        start_col="start_raw",
        end_col="end_raw",
        entity_schema=F.col("subj_schema"),
        program_urls={
            "UN-SCISIL": "https://un.example/scisil",
            "US-BIS-DPL": "https://bis.example/dpl",
        },
        run_time="2026-08-13T00:00:00",
    )
    return out.select(
        "entity_id", "schema", "prop", "value", "origin", "original_value"
    )


@register(
    "f19_make_occupancy",
    oracle="""
WITH occ_src AS (
  SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS person_id,
         c_custkey % 25 AS pos_idx,
         CASE c_custkey % 4 WHEN 1 THEN '2015-03-01' WHEN 2 THEN '2024-01'
              WHEN 3 THEN '2026-05-01' ELSE NULL END AS start_d,
         CASE c_custkey % 5 WHEN 1 THEN '2019-06-30' WHEN 2 THEN '2023'
              WHEN 3 THEN '2026-12-31' WHEN 4 THEN '2027-01'
              ELSE NULL END AS end_d,
         CASE WHEN c_custkey % 6 = 0 THEN '2014' ELSE NULL END AS pstart,
         CASE c_custkey % 7 WHEN 0 THEN '2021-12-31' WHEN 1 THEN '2026-10'
              ELSE NULL END AS pend,
         CASE WHEN c_custkey % 8 = 0 THEN '2013-11-05' ELSE NULL END
           AS election,
         c_custkey % 11 <> 0 AS is_pep,
         c_custkey % 2 = 0 AS nei
  FROM customer
),
pos_attrs AS (
  SELECT DISTINCT pos_idx,
         'Office ' || CAST(pos_idx AS VARCHAR) AS pos_name,
         CASE pos_idx % 5 WHEN 0 THEN 'us' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
              WHEN 3 THEN 'gb' ELSE 'jp' END AS pos_country,
         CASE pos_idx % 4 WHEN 0 THEN 'gov.national' WHEN 1 THEN 'gov.state'
              WHEN 2 THEN 'gov.muni' ELSE NULL END AS pos_topic,
         CASE pos_idx % 3 WHEN 1 THEN '1995' WHEN 2 THEN '2003-07'
              ELSE NULL END AS inception
  FROM occ_src
),
pos_ids AS (
  SELECT *,
         'osp-' || md5(concat_ws('|', 'position', pos_name, pos_country,
                                 inception)) AS position_id
  FROM pos_attrs
),
position_rows AS (
  SELECT position_id AS entity_id, 'Position' AS "schema", 'name' AS prop,
         pos_name AS value, CAST(NULL AS VARCHAR) AS origin
  FROM pos_ids
  UNION ALL
  SELECT position_id, 'Position', 'country', pos_country, NULL FROM pos_ids
  UNION ALL
  SELECT position_id, 'Position', 'topics', pos_topic, NULL
  FROM pos_ids WHERE pos_topic IS NOT NULL
  UNION ALL
  SELECT position_id, 'Position', 'inceptionDate', inception, NULL
  FROM pos_ids WHERE inception IS NOT NULL
),
joined AS (
  SELECT o.*, p.position_id, p.pos_topic
  FROM occ_src o JOIN pos_ids p ON o.pos_idx = p.pos_idx
),
statused AS (
  SELECT *,
    CASE WHEN end_d IS NOT NULL AND end_d > '2026-08-13' THEN 'current'
         WHEN end_d IS NOT NULL AND
              CAST(CAST(substr(end_d, 1, 4) AS INT) +
                   (CASE pos_topic WHEN 'gov.national' THEN 5
                         WHEN 'gov.state' THEN 2 WHEN 'gov.muni' THEN 1
                         ELSE 5 END) AS VARCHAR) || substr(end_d, 5)
                >= '2026-08-13' THEN 'ended'
         WHEN end_d IS NOT NULL THEN NULL
         WHEN pend IS NOT NULL AND pend <= '2026-08-13' AND
              CAST(CAST(substr(pend, 1, 4) AS INT) +
                   (CASE pos_topic WHEN 'gov.national' THEN 5
                         WHEN 'gov.state' THEN 2 WHEN 'gov.muni' THEN 1
                         ELSE 5 END) AS VARCHAR) || substr(pend, 5)
                >= '2026-08-13' THEN 'ended'
         WHEN pend IS NOT NULL AND pend <= '2026-08-13' THEN NULL
         WHEN end_d IS NULL AND pend IS NULL
              AND COALESCE(start_d, pstart, election) IS NULL
              AND NOT nei THEN NULL
         WHEN nei THEN 'current'
         ELSE 'unknown' END AS status_v
  FROM joined
),
live AS (
  SELECT *,
    'osp-' || md5(concat_ws('|', person_id, position_id, 'started',
                            COALESCE(start_d, 'unknown'), 'ended',
                            COALESCE(end_d, 'unknown'),
                            CASE WHEN pstart IS NOT NULL
                                 THEN 'period_start' END, pstart,
                            CASE WHEN pend IS NOT NULL
                                 THEN 'period_end' END, pend)) AS oid
  FROM statused
  WHERE is_pep AND status_v IS NOT NULL
),
occupancy_rows AS (
  SELECT oid AS entity_id, 'Occupancy' AS "schema", 'holder' AS prop,
         person_id AS value, CAST(NULL AS VARCHAR) AS origin
  FROM live
  UNION ALL
  SELECT oid, 'Occupancy', 'post', position_id, NULL FROM live
  UNION ALL
  SELECT oid, 'Occupancy', 'startDate', start_d, NULL
  FROM live WHERE start_d IS NOT NULL
  UNION ALL
  SELECT oid, 'Occupancy', 'endDate', end_d, NULL
  FROM live WHERE end_d IS NOT NULL
  UNION ALL
  SELECT oid, 'Occupancy', 'periodStart', pstart, NULL
  FROM live WHERE pstart IS NOT NULL
  UNION ALL
  SELECT oid, 'Occupancy', 'periodEnd', pend, NULL
  FROM live WHERE pend IS NOT NULL
  UNION ALL
  SELECT oid, 'Occupancy', 'electionDate', election, NULL
  FROM live WHERE election IS NOT NULL
  UNION ALL
  SELECT oid, 'Occupancy', 'status', status_v, NULL
  FROM live WHERE status_v <> 'unknown'
  UNION ALL
  SELECT person_id, 'Person', 'topics', 'role.pep', 'inferred' FROM live
)
SELECT entity_id, "schema", prop, value, origin FROM position_rows
UNION ALL
SELECT entity_id, "schema", prop, value, origin FROM occupancy_rows
""",
)
def f19_make_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position + Occupancy factories
    (``zavod/zavod/helpers/positions.py:21-131,132-273``): 25 synthetic
    positions (distinct attribute projection → one emit each; id hashes
    name/country/inception with make_id's NULL-skip) and one occupancy
    per customer exercising the full state machine — future/graced/
    expired end dates with topic-dependent after-office windows, past
    and future period ends, the T5 effective-start chain, the
    no-dates-and-not-well-maintained drop, the non-PEP categorisation
    gate (every 11th row), status omitted when 'unknown', and the
    holder's inferred role.pep topic. Both factories are map-only stack
    projections; the only shuffle is the DISTINCT on 25 position rows."""
    from opensanctions_spark.functions.positions import (
        make_occupancy_statements,
        make_position_statements,
    )

    cust = load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    pos_idx = (ck % 25).alias("pos_idx")
    occ_src = cust.select(
        F.concat(F.lit("c-"), ck).alias("person_id"),
        pos_idx,
        F.when(ck % 4 == 1, "2015-03-01")
        .when(ck % 4 == 2, "2024-01")
        .when(ck % 4 == 3, "2026-05-01")
        .alias("start_d"),
        F.when(ck % 5 == 1, "2019-06-30")
        .when(ck % 5 == 2, "2023")
        .when(ck % 5 == 3, "2026-12-31")
        .when(ck % 5 == 4, "2027-01")
        .alias("end_d"),
        F.when(ck % 6 == 0, "2014").alias("pstart"),
        F.when(ck % 7 == 0, "2021-12-31")
        .when(ck % 7 == 1, "2026-10")
        .alias("pend"),
        F.when(ck % 8 == 0, "2013-11-05").alias("election"),
        (ck % 11 != 0).alias("is_pep"),
        (ck % 2 == 0).alias("nei"),
    )
    pi = F.col("pos_idx")
    pos_attrs = occ_src.select(
        pi,
        F.concat(F.lit("Office "), pi).alias("pos_name"),
        F.when(pi % 5 == 0, "us")
        .when(pi % 5 == 1, "de")
        .when(pi % 5 == 2, "fr")
        .when(pi % 5 == 3, "gb")
        .otherwise("jp")
        .alias("pos_country"),
        F.when(pi % 4 == 0, "gov.national")
        .when(pi % 4 == 1, "gov.state")
        .when(pi % 4 == 2, "gov.muni")
        .alias("pos_topic"),
        F.when(pi % 3 == 1, "1995").when(pi % 3 == 2, "2003-07").alias("inception"),
    ).distinct()

    position_stmts = make_position_statements(
        pos_attrs,
        dataset="peps",
        name_col="pos_name",
        country_col="pos_country",
        topics_col="pos_topic",
        inception_col="inception",
    )

    from opensanctions_spark.functions.positions import make_position_id

    pos_ids = pos_attrs.select(
        pi,
        F.col("pos_topic"),
        make_position_id(
            F.col("pos_name"), country=F.col("pos_country"),
            inception=F.col("inception"),
        ).alias("position_id"),
    )
    joined = occ_src.join(F.broadcast(pos_ids), "pos_idx")
    occupancy_stmts = make_occupancy_statements(
        joined,
        dataset="peps",
        person_col="person_id",
        position_col="position_id",
        start_col="start_d",
        end_col="end_d",
        period_start_col="pstart",
        period_end_col="pend",
        election_col="election",
        topic_col="pos_topic",
        is_pep_col="is_pep",
        no_end_implies_current=F.col("nei"),
        current_time="2026-08-13T00:00:00",
    )
    cols = ["entity_id", "schema", "prop", "value", "origin"]
    return position_stmts.select(*cols).unionByName(occupancy_stmts.select(*cols))


@register(
    "f20_make_address",
    oracle="""
WITH base AS (
  SELECT 'c-' || CAST(c_custkey AS VARCHAR) AS holder_id,
         CASE WHEN c_custkey % 2 = 0 THEN 'Person' ELSE 'Company' END
           AS holder_schema,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 3 = 0
              THEN 'Main Street ' || CAST(c_custkey % 50 AS VARCHAR)
              END AS full_raw,
         CASE WHEN c_custkey % 13 = 0 OR c_custkey % 3 = 0 THEN NULL
              ELSE 'Street ' || CAST(c_custkey % 100 AS VARCHAR)
              END AS street,
         CASE WHEN c_custkey % 13 = 0 OR c_custkey % 4 = 0 THEN NULL
              ELSE 'City ' || CAST(c_custkey % 40 AS VARCHAR) END AS city,
         CASE WHEN c_custkey % 13 = 0 OR c_custkey % 5 = 0 THEN NULL
              ELSE lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0')
              END AS postal,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 6 = 0 THEN 'Bavaria'
              WHEN c_custkey % 6 = 1 THEN 'Texas' END AS state,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 6 = 1 THEN 'Texas'
              WHEN c_custkey % 6 = 2 THEN 'North' END AS region,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 7 = 0 THEN 'Germany'
              WHEN c_custkey % 7 = 1 THEN 'fr'
              WHEN c_custkey % 7 = 2 THEN NULL
              ELSE 'United States' END AS country,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 8 = 0 THEN 'US' END AS code_in,
         CASE WHEN c_custkey % 13 = 0 THEN NULL
              WHEN c_custkey % 9 = 0 THEN 'k9' END AS key
  FROM customer
),
derived AS (
  SELECT *,
    -- a resolved country NAME overrides an explicit code (the
    -- registry.country.clean semantics; this fixture's names are
    -- 'Germany' and 'United States')
    COALESCE(CASE lower(CASE WHEN length(country) <> 2 THEN country END)
               WHEN 'germany' THEN 'de'
               WHEN 'united states' THEN 'us' END,
             lower(COALESCE(code_in,
                   CASE WHEN length(country) = 2 THEN country END))) AS code,
    CASE WHEN length(country) <> 2 THEN country END AS cname,
    CASE WHEN region = state THEN NULL ELSE region END AS region_f
  FROM base
),
fulled AS (
  SELECT *,
    COALESCE(full_raw,
             NULLIF(concat_ws(', ', street, city, region_f, state, postal,
                              COALESCE(cname, code)), '')) AS full0
  FROM derived
),
addr AS (
  SELECT *,
    CASE WHEN full0 = COALESCE(cname, '') OR full0 = COALESCE(code, '')
         THEN NULL ELSE full0 END AS full_v
  FROM fulled
),
ids AS (
  SELECT *,
    CASE WHEN full_raw IS NULL AND full_v IS NOT NULL
         THEN 'inferred' END AS full_origin,
    NULLIF(regexp_replace(regexp_replace(lower(trim(full_v)),
                                         '[^a-z0-9]+', '-', 'g'),
                          '^-+|-+$', '', 'g'), '') AS slug,
    COALESCE(code_in, country) AS original_country
  FROM addr
),
live AS (
  SELECT *,
    CASE WHEN concat_ws('|', code, slug, key) <> ''
         THEN 'addr-' || md5(concat_ws('|', code, slug, key)) END AS aid
  FROM ids
),
keep AS (SELECT * FROM live WHERE aid IS NOT NULL),
rows AS (
  SELECT aid AS entity_id, 'Address' AS "schema", 'full' AS prop,
         full_v AS value, full_origin AS origin,
         CAST(NULL AS VARCHAR) AS original_value
  FROM keep WHERE full_v IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'street', street, NULL, NULL
  FROM keep WHERE street IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'city', city, NULL, NULL
  FROM keep WHERE city IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'postalCode', postal, NULL, NULL
  FROM keep WHERE postal IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'region', region_f, NULL, NULL
  FROM keep WHERE region_f IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'state', state, NULL, NULL
  FROM keep WHERE state IS NOT NULL
  UNION ALL
  SELECT aid, 'Address', 'country', code, NULL, original_country
  FROM keep WHERE code IS NOT NULL
  UNION ALL
  SELECT holder_id, holder_schema, 'country', code, NULL, NULL
  FROM keep WHERE code IS NOT NULL
  UNION ALL
  SELECT holder_id, holder_schema, 'addressEntity', aid, NULL, NULL
  FROM keep WHERE full_v IS NOT NULL
  UNION ALL
  SELECT holder_id, holder_schema, 'address', full_v, NULL, NULL
  FROM keep WHERE full_v IS NOT NULL
)
SELECT entity_id, "schema", prop, value, origin, original_value FROM rows
""",
)
def f20_make_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Address factory (``zavod/zavod/helpers/addresses.py:107-262``):
    synthesized address rows over customers exercise every branch —
    given vs composed full lines (``origin='inferred'``), the
    two-letter-country-as-code rule, case-normalized country codes in
    the id hash, region==state dedup, full==country suppression, keyed
    ids, all-NULL rows dropped (NULL id), and the ``apply_address``
    holder back-refs (country always; addressEntity/address only when a
    full line exists) carrying the holder's own schema. One map-only
    stack projection."""
    from opensanctions_spark.functions.addresses import make_address_statements

    cust = load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    dead = ck % 13 == 0
    n = F.lit(None).cast("string")
    base = cust.select(
        F.concat(F.lit("c-"), ck).alias("holder_id"),
        F.when(ck % 2 == 0, "Person").otherwise("Company").alias("holder_schema"),
        F.when(
            ~dead & (ck % 3 == 0),
            F.concat(F.lit("Main Street "), ck % 50),
        ).alias("full_raw"),
        F.when(
            ~dead & (ck % 3 != 0), F.concat(F.lit("Street "), ck % 100)
        ).alias("street"),
        F.when(
            ~dead & (ck % 4 != 0), F.concat(F.lit("City "), ck % 40)
        ).alias("city"),
        F.when(
            ~dead & (ck % 5 != 0),
            F.lpad((ck % 100000).cast("string"), 5, "0"),
        ).alias("postal"),
        F.when(~dead, F.when(ck % 6 == 0, "Bavaria").when(ck % 6 == 1, "Texas")
               .otherwise(n)).alias("state"),
        F.when(~dead, F.when(ck % 6 == 1, "Texas").when(ck % 6 == 2, "North")
               .otherwise(n)).alias("region"),
        F.when(
            ~dead,
            F.when(ck % 7 == 0, "Germany")
            .when(ck % 7 == 1, "fr")
            .when(ck % 7 == 2, n)
            .otherwise("United States"),
        ).alias("country"),
        F.when(~dead & (ck % 8 == 0), "US").alias("code_in"),
        F.when(~dead & (ck % 9 == 0), "k9").alias("key"),
    )
    out = make_address_statements(
        base,
        dataset="addrs",
        full_col="full_raw",
        street_col="street",
        city_col="city",
        postal_code_col="postal",
        state_col="state",
        region_col="region",
        country_col="country",
        country_code_col="code_in",
        key_col="key",
        holder_col="holder_id",
        holder_schema=F.col("holder_schema"),
    )
    return out.select(
        "entity_id", "schema", "prop", "value", "origin", "original_value"
    )
