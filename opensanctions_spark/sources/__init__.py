"""Sources (SURVEY §2.1 S1-S12): scans into the statement pipeline.

The reference's crawlers fetch + parse source documents driver-side
(``zavod/zavod/context.py:309-491``). The Spark boundary is the *landed
file*: HTTP fetching stays an ingestion concern (S8 cache table below);
parsing is distributed — CSV/JSON via native readers, XML/HTML via
``from_xml`` / JVM-side regex extraction over a text column, so no Python
runs per row for any structured format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# S1: CSV scan (crawler DictReader pattern,
# zavod/zavod/tests/fixtures/testdataset1/testentrypoint1.py:70-74)


def read_csv_source(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Header CSV scan with a corrupt-record side channel — bad rows land in
    ``_corrupt_record`` instead of failing the job (the issue-channel
    analogue of ``zavod/zavod/runtime/issues.py``)."""
    reader = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        reader = reader.schema(schema + ", _corrupt_record STRING")
    return reader.csv(path)


def parse_csv_column(col: Column, schema: str, sep: str = ",") -> Column:
    """Parse an embedded CSV line column (from_csv — JVM-side)."""
    return F.from_csv(col, schema, {"sep": sep})


# --------------------------------------------------------------------------
# S3: JSON scan (zavod/zavod/context.py:362-402)


def read_json_source(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    return spark.read.option("multiLine", multiline).json(path)


def parse_json_column(col: Column, schema: str) -> Column:
    """Parse an embedded JSON document column (from_json — JVM-side)."""
    return F.from_json(col, schema)


# --------------------------------------------------------------------------
# S2: XML scan (zavod/zavod/context.py:480-491; namespace strip
# zavod/zavod/helpers/xml.py:5)


def strip_xml_namespaces(col: Column) -> Column:
    """Drop xmlns declarations and prefixed tag names — the distributed
    equivalent of the reference's etree namespace strip."""
    no_decl = F.regexp_replace(col, r"""\sxmlns(:\w+)?="[^"]*\"""", "")
    return F.regexp_replace(no_decl, r"(</?)\w+:", r"$1")


def parse_xml_column(col: Column, schema: str) -> Column:
    """Parse an embedded XML document column (from_xml — JVM-side)."""
    return F.from_xml(col, schema)


# --------------------------------------------------------------------------
# S5: HTML table scan (zavod/zavod/helpers/html.py:58-141)

_ROW_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"
_TAG_RE = r"<[^>]+>"


def parse_html_table(df: DataFrame, html_col: str) -> DataFrame:
    """<table> → one row per <tr>, cells as a trimmed string array.

    Entirely JVM-side (regexp_extract_all + transform): the reference's
    lxml ``parse_html_table`` runs per-document in Python; here a 100 TB
    pile of landed HTML parses inside whole-stage codegen. Returns the
    input columns + (row_idx, cells array<string>).
    """
    # posexplode_outer + null filter, not plain posexplode: exploding a
    # computed array column triggers InferFiltersFromGenerate, and
    # pushdown substitutes the regexp_extract_all into the inferred
    # size() filter — re-running the row regex per document (see
    # operators/blocking.tokenize for the measured cost)
    rows = (
        df.withColumn(
            "_rows", F.expr(f"regexp_extract_all({html_col}, '{_ROW_RE}', 1)")
        )
        .select("*", F.posexplode_outer("_rows").alias("row_idx", "_row"))
        .filter(F.col("_row").isNotNull())
        .drop("_rows")
    )
    cells = F.expr(f"regexp_extract_all(_row, '{_CELL_RE}', 1)")
    cleaned = F.transform(
        cells, lambda c: F.trim(F.regexp_replace(c, _TAG_RE, ""))
    )
    return rows.withColumn("cells", cleaned).drop("_row")


# --------------------------------------------------------------------------
# S4: HTML fetch + DOM (zavod/zavod/context.py:404-456) — the fetch is an
# ingestion-layer concern (S8 cache); the DOM side is a real parser over the
# landed HTML column. The regex table path (S5) covers well-formed tables;
# this one uses the stdlib event-driven parser for attribute access, nesting
# and malformed markup, Arrow-batched so each task parses columnar batches.

_DOM_SCHEMA = "doc_id BIGINT, elem_idx INT, tag STRING, text STRING, href STRING"


def parse_html_dom(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    tags: tuple = ("title", "p", "a"),
) -> DataFrame:
    """DOM-parse an HTML column: one output row per matched element, in
    element-close order, with its text content and href attribute.

    The reference parses fetched pages into an lxml DOM and makes links
    absolute (``zavod/zavod/context.py:404-456``); here the parse runs as
    a ``mapInPandas`` stage (stdlib ``html.parser`` — no external libs),
    so a 100 TB pile of landed HTML fans out across executors while the
    per-document work stays a linear single pass. Text accumulates into
    every open matched element (descendant text counts, like DOM
    text_content())."""
    tag_set = set(tags)

    def run(batches):
        import pandas as pd
        from html.parser import HTMLParser

        class Collector(HTMLParser):
            def __init__(self) -> None:
                super().__init__(convert_charrefs=True)
                self.elems: list = []
                self._stack: list = []

            def handle_starttag(self, tag, attrs):
                if tag in tag_set:
                    self._stack.append([tag, dict(attrs).get("href"), []])

            def handle_endtag(self, tag):
                if self._stack and self._stack[-1][0] == tag:
                    t, href, parts = self._stack.pop()
                    self.elems.append((t, "".join(parts).strip(), href))

            def handle_data(self, data):
                for frame in self._stack:
                    frame[2].append(data)

        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                c = Collector()
                c.feed(html or "")
                c.close()
                for i, (t, txt, href) in enumerate(c.elems):
                    rows.append((did, i, t, txt, href))
            yield pd.DataFrame(
                rows, columns=["doc_id", "elem_idx", "tag", "text", "href"]
            )

    import pandas as pd  # noqa: F401 - fail fast if pandas missing

    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(html_col)
    ).mapInPandas(run, _DOM_SCHEMA)


def absolutize_href(href: Column, base_url: str) -> Column:
    """Make link targets absolute against a base (the reference's
    ``make_links_absolute``): scheme-qualified hrefs pass through,
    root-relative ones get the origin, others the base path — pure column
    logic, JVM-side."""
    base = base_url.rstrip("/")
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(href.rlike("^[a-z][a-z0-9+.-]*://"), href)
        .when(href.startswith("/"), F.concat(F.lit(base), href))
        .otherwise(F.concat(F.lit(base), F.lit("/"), href))
    )


# --------------------------------------------------------------------------
# S6/S7: Excel & PDF, all stdlib. XLSX parses as zip+XML parts; legacy
# .xls through the OLE2+BIFF8 reader (sources/xls.py); PDFs through the
# object/xref/ObjStm parser with positional table recovery
# (sources/pdf.py). No third-party decoder needed for any of them.

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'B7' → 1 (zero-based column index from the letter prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _xlsx_rows(path: str, sheet: str | int = 0) -> list[list[str | None]]:
    """Parse one worksheet of an .xlsx into rows of cell strings.

    Mirrors the reference's cell-to-string semantics
    (zavod/zavod/helpers/excel.py:72-210): every cell becomes a string;
    missing cells are None. Handles shared strings, inline strings, rich
    -text runs, and sparse rows (gaps from the ``r`` cell references).
    """
    return _xlsx_rows_links(path, sheet)[0]


def _xlsx_rows_links(
    path: str, sheet: str | int = 0
) -> tuple[list[list[str | None]], dict[tuple[int, int], str]]:
    """Like ``_xlsx_rows`` but also returns the sheet's hyperlink map
    {(row, col): url} — ``<hyperlinks>`` elements resolved through the
    worksheet's relationship part, the openpyxl ``cell.hyperlink``
    analogue the reference's ``parse_xlsx_sheet(extract_links=True)``
    consumes (``zavod/zavod/helpers/excel.py:198-203``)."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target")
            for r in rels
            if r.tag.endswith("Relationship")
        }
        sheets: list[tuple[str, str]] = []  # (name, zip member)
        for s in wb.find(f"{_SSML}sheets") or []:
            target = rel_target.get(s.get(f"{_RELNS}id"), "")
            member = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
            sheets.append((s.get("name", ""), member))
        if isinstance(sheet, int):
            member = sheets[sheet][1]
        else:
            member = next(m for n, m in sheets if n == sheet)

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))

        ws = ET.fromstring(zf.read(member))
        rows: list[list[str | None]] = []
        for rpos, row in enumerate(ws.iter(f"{_SSML}row")):
            while len(rows) < int(row.get("r", rpos + 1)) - 1:
                rows.append([])  # sparse row gaps
            cells: list[str | None] = []
            for pos, c in enumerate(row):
                idx = _col_index(c.get("r", "")) if c.get("r") else pos
                while len(cells) <= idx:
                    cells.append(None)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    cells[idx] = "".join(
                        t.text or "" for t in c.iter(f"{_SSML}t")
                    )
                else:
                    v = c.find(f"{_SSML}v")
                    if v is None or v.text is None:
                        cells[idx] = None
                    elif ctype == "s":
                        cells[idx] = shared[int(v.text)]
                    else:  # n / str / b — keep the raw stored text
                        cells[idx] = v.text
            rows.append(cells)

        # hyperlinks: <hyperlink ref=... r:id=...> resolved through the
        # worksheet's own relationship part
        links: dict[tuple[int, int], str] = {}
        hls = list(ws.iter(f"{_SSML}hyperlink"))
        if hls:
            base = member.rsplit("/", 1)
            rels_member = f"{base[0]}/_rels/{base[1]}.rels"
            targets: dict[str, str] = {}
            if rels_member in zf.namelist():
                for r in ET.fromstring(zf.read(rels_member)):
                    if r.tag.endswith("Relationship"):
                        targets[r.get("Id", "")] = r.get("Target", "")
            for hl in hls:
                ref = hl.get("ref", "")
                rid = hl.get(f"{_RELNS}id")
                url = targets.get(rid, "") if rid else hl.get("location", "")
                digits = "".join(ch for ch in ref if ch.isdigit())
                if url and digits:
                    links[(int(digits) - 1, _col_index(ref))] = url
    return rows, links


def write_xlsx(path: str, header: list[str], rows: list[list[object]],
               sheet_name: str = "Sheet1",
               links: dict[tuple[int, int], str] | None = None) -> None:
    """Write a minimal single-sheet .xlsx (inline strings) with the stdlib —
    the fixture/serialize side of the S6 round-trip. ``links`` maps
    (row, col) — header row = 0 — to URL hyperlinks (``<hyperlinks>``
    elements + a worksheet relationship part, the shape
    ``_xlsx_rows_links`` reads back)."""
    import zipfile
    from xml.sax.saxutils import escape

    # \r must be a character reference: XML 1.0 end-of-line handling
    # normalizes a literal CR (and CRLF) to LF on PARSE, so an
    # unescaped \r in cell text silently reads back as \n — the same
    # round-trip-corruption family as the PDF 0x0D stream bug. The
    # quote entity keeps the same values safe in attribute position.
    _ENT = {"\r": "&#13;", '"': "&quot;"}

    def _esc(v: object) -> str:
        return escape(str(v), _ENT)

    def _ref(r: int, c: int) -> str:
        col = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            col = chr(ord("A") + rem) + col
        return f"{col}{r + 1}"

    def row_xml(i: int, vals: list[object]) -> str:
        cells = "".join(
            f'<c r="{_ref(i - 1, ci)}" t="inlineStr"><is><t>{_esc(v)}</t></is></c>'
            if v is not None else ""
            for ci, v in enumerate(vals)
        )
        return f'<row r="{i}">{cells}</row>'

    body = row_xml(1, list(header)) + "".join(
        row_xml(i + 2, list(r)) for i, r in enumerate(rows)
    )
    link_items = sorted((links or {}).items())
    hyperlinks_xml = ""
    sheet_rels = ""
    if link_items:
        hyperlinks_xml = "<hyperlinks>" + "".join(
            f'<hyperlink ref="{_ref(r, c)}" r:id="rIdL{i}"/>'
            for i, ((r, c), _) in enumerate(link_items)
        ) + "</hyperlinks>"
        sheet_rels = (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rIdL{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" '
                f'Target="{_esc(url)}" TargetMode="External"/>'
                for i, (_, url) in enumerate(link_items)
            )
            + "</Relationships>"
        )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheetData>{body}</sheetData>{hyperlinks_xml}</worksheet>",
        )
        if sheet_rels:
            zf.writestr("xl/worksheets/_rels/sheet1.xml.rels", sheet_rels)


def read_excel_source(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """Excel scan (S6, zavod/zavod/helpers/excel.py:72-210): header row +
    string cells → DataFrame. Parses with the stdlib on the driver
    (crawler-landed workbooks are small source artifacts, exactly the
    reference's driver-side position). .xlsx goes through the zip+XML
    parser; legacy .xls through the OLE2+BIFF8 reader
    (``opensanctions_spark.sources.xls`` — the reference uses xlrd)."""
    if path.lower().endswith(".xls"):
        from opensanctions_spark.sources.xls import xls_rows

        if not isinstance(sheet, int):
            raise ValueError(".xls reader selects sheets by index")
        with open(path, "rb") as fh:
            rows = xls_rows(fh.read(), sheet)
    else:
        rows = _xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    header = [h if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
    width = len(header)
    data = [
        tuple((r + [None] * width)[:width]) for r in rows[1:]
    ]
    schema = ", ".join(f"`{h}` STRING" for h in header)
    return spark.createDataFrame(data, schema)


def read_pdf_tables(
    spark: SparkSession,
    path: str,
    headers_per_page: bool = False,
    skiprows: int = 0,
) -> DataFrame:
    """PDF table scan (S7, zavod/zavod/helpers/pdf.py:25-147): parse the
    table on each page of a digitally-born PDF into a string-typed
    DataFrame keyed by slugified headers. Dependency-light stdlib
    implementation (see ``opensanctions_spark.sources.pdf``); scanned
    PDFs need OCR and stay out of scope."""
    from opensanctions_spark.sources.pdf import read_pdf_tables as _impl

    return _impl(spark, path, headers_per_page, skiprows)


# --------------------------------------------------------------------------
# S8: cached HTTP fetch (zavod/zavod/context.py:309-360,458-478) — the
# cache is a table keyed by request hash with day-granular TTL.


def cache_lookup(cache: DataFrame, requests: DataFrame, url_col: str = "url",
                 max_age_days: int = 14, now: str | None = None) -> DataFrame:
    """Join requests against the fetch-cache table; rows with a fresh
    cached response carry it, stale/missing rows have response NULL (the
    ingestion layer fetches those and appends back)."""
    now_ts = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    fresh = cache.filter(
        F.col("fetched_at") >= F.date_sub(now_ts.cast("date"), max_age_days)
    ).select(
        F.col("url_hash").alias("_h"), F.col("response"), F.col("fetched_at")
    )
    keyed = requests.withColumn("_h", F.md5(F.col(url_col)))
    return keyed.join(fresh, "_h", "left").drop("_h")
