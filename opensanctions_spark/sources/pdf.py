"""PDF table scan (SURVEY S7, ``zavod/zavod/helpers/pdf.py:25-147``).

The reference parses the largest table on each PDF page with pdfplumber
and yields dict rows keyed by slugified headers; pdfplumber is not
available here, so this module ships a dependency-light path for
digitally-born PDFs (the overwhelming majority of crawler-landed
artifacts): a minimal object/xref parser, FlateDecode via zlib, a text
operator interpreter (Tm/Td/TD/Tj/TJ), and positional table recovery —
rows by y-clustering, columns by x-anchor clustering. Scanned/image
PDFs route through the page-image path (``pdf_page_images`` /
``read_pdf_pages_distributed`` / ``ocr_pages``): the embedded scan
bytes are extracted per page and handed to a PLUGGABLE OCR engine —
stubbed in this container, exactly like the multimodal image decode
(the reference shells out to ``pdftoppm`` + external OCR/vision, a
system-binary boundary).

Reference semantics mirrored from ``parse_pdf_table``: headers come
from the first row (after ``skiprows``), slugified with ``_``; duplicate
headers raise; repeated header rows (tables that restate headers on
every page) are skipped; ``headers_per_page`` re-reads headers per page.

A matching writer (``write_pdf_table``) exists so tests and catalog
queries can serialize → parse → recover real tables without fixtures.

Spark shape: single crawler artifacts parse on the driver (the
reference's own position — these are small source files); fleets of
PDFs scan distributed via the ``binaryFile`` source + ``mapInPandas``,
one task per file, no driver bottleneck.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# writer


def _esc(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf_table(
    path: str,
    headers: list[str],
    rows: list[list[object]],
    rows_per_page: int = 20,
    col_width: float = 130.0,
    headers_per_page: bool = True,
    compress: bool = True,
) -> None:
    """Write a minimal digitally-born PDF containing one table, paginated
    ``rows_per_page`` at a time. Latin-1-representable text only (the
    stdlib writer uses the base-14 Helvetica font)."""
    pages: list[list[list[object]]] = [
        rows[i : i + rows_per_page] for i in range(0, len(rows), rows_per_page)
    ] or [[]]

    def content(page_rows: list[list[object]], with_header: bool) -> bytes:
        ops = ["BT", "/F1 9 Tf"]
        y = 750.0
        emit = ([headers] if with_header else []) + [
            ["" if c is None else str(c) for c in r] for r in page_rows
        ]
        for r in emit:
            for ci, cell in enumerate(r):
                if cell == "":
                    continue
                x = 40.0 + ci * col_width
                ops.append(f"1 0 0 1 {x:g} {y:g} Tm ({_esc(str(cell))}) Tj")
            y -= 14.0
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")

    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page_rows in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        data = content(page_rows, headers_per_page or i == 0)
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects[cont_num] = (
            head.encode() + b"\nstream\n" + data + b"\nendstream"
        )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    count = max(objects) + 1
    out += f"xref\n0 {count}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, count):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {count} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))


# ---------------------------------------------------------------------------
# parser

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# EOL-delimiter fallback ONLY: a binary payload whose final byte is 0x0D
# (or that embeds ``endstream``) mis-slices under this regex — the primary
# path slices by the stream dictionary's /Length (PDF 32000-1 §7.3.8.1,
# and how pdfplumber/pdfminer read streams, which is the reference
# behavior via zavod/zavod/helpers/pdf.py:25-147: no page is ever lost).
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_STREAM_KW_RE = re.compile(rb"stream(?:\r\n|\n|\r)")
# direct form ``/Length 99``; \b blocks the backtrack that would let
# ``/Length 12 0 R`` match its first digits as a direct length
_LEN_DIRECT_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_LEN_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
# objects whose whole body is a bare integer (the indirect-/Length
# target shape) — the pattern demands ``endobj`` right after the digits,
# so it can never be confused by binary stream content
_INT_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\s+(\d+)\s+endobj")
_STR_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<<|>>|\[|\]|/[A-Za-z0-9#._-]+|[-+.0-9]+|[A-Za-z'\"*]+"
)


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1]
            simple = {
                ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
                ord("b"): b"\b", ord("f"): b"\f",
                ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
            }
            if n in simple:
                out += simple[n]
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _raw_stream(body: bytes) -> tuple[bytes, bytes] | None:
    """``(dict_prefix, exact stream payload)`` for an object body.

    Primary path: slice exactly ``/Length`` bytes after the ``stream``
    keyword's EOL (verified by the ``endstream`` keyword following,
    modulo one EOL) — binary-safe for payloads ending in 0x0D or
    containing ``endstream``. Falls back to the EOL-delimiter regex
    only when /Length is absent, unresolved, or fails verification."""
    kw = _STREAM_KW_RE.search(body)
    if kw is None:
        return None
    head = body[: kw.start()]
    start = kw.end()
    lm = _LEN_DIRECT_RE.search(head)
    if lm is not None:
        n = int(lm.group(1))
        tail = body[start + n : start + n + 16]
        if start + n <= len(body) and re.match(
            rb"(?:\r\n|\r|\n)?\s*endstream", tail
        ):
            return head, body[start : start + n]
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    return body[: sm.start()], sm.group(1)


def _decoded_stream(body: bytes) -> bytes | None:
    rs = _raw_stream(body)
    if rs is None:
        return None
    head, raw = rs
    if b"/FlateDecode" in head:
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _collect_objects(data: bytes) -> dict[int, bytes]:
    """Every indirect object body by number, ObjStm members included.

    Sequential scanner, binary-safe: an object that carries a stream is
    bounded by its dictionary's ``/Length`` (direct, or an indirect
    ``N 0 R`` resolved against bare-integer objects), NOT by searching
    for ``endstream``/``endobj`` — a flate payload that embeds either
    keyword, or that ends in 0x0D, would mis-slice under a delimiter
    regex (the round-12 silent-page-drop bug). Synthesized stream
    bodies are normalized to a direct /Length + LF framing so
    ``_raw_stream`` re-slices them exactly.

    PDF 1.5+ object streams (/Type /ObjStm): catalog/page-tree objects
    of digitally-born PDFs routinely live compressed inside them — the
    header is N (objnum, offset) integer pairs, bodies start at /First.
    Content streams themselves can never nest there, so unpacking the
    dictionaries is enough to walk the page tree."""
    # pass 1: bare-integer objects, for indirect-/Length resolution
    int_objects: dict[int, int] = {
        int(m.group(1)): int(m.group(2)) for m in _INT_OBJ_RE.finditer(data)
    }
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        hm = _OBJ_HEAD_RE.search(data, pos)
        if hm is None:
            break
        num = int(hm.group(1))
        start = hm.end()
        kw = _STREAM_KW_RE.search(data, start)
        end_obj = data.find(b"endobj", start)
        if kw is None or (0 <= end_obj < kw.start()):
            # streamless object: the endobj bound is binary-safe
            end = end_obj if end_obj != -1 else len(data)
            objects[num] = data[start:end]
            pos = end + 6 if end_obj != -1 else len(data)
            continue
        head = data[start : kw.start()]
        payload_start = kw.end()
        n: int | None = None
        lm = _LEN_DIRECT_RE.search(head)
        if lm is not None:
            n = int(lm.group(1))
        else:
            rm = _LEN_REF_RE.search(head)
            if rm is not None:
                n = int_objects.get(int(rm.group(1)))
                if n is not None:  # normalize to the direct form
                    head = _LEN_REF_RE.sub(b"/Length %d" % n, head, count=1)
        sliced = False
        if n is not None and payload_start + n <= len(data):
            tail = data[payload_start + n : payload_start + n + 16]
            if re.match(rb"(?:\r\n|\r|\n)?\s*endstream", tail):
                payload = data[payload_start : payload_start + n]
                objects[num] = (
                    head + b"stream\n" + payload + b"\nendstream"
                )
                after = data.find(b"endobj", payload_start + n)
                pos = after + 6 if after != -1 else len(data)
                sliced = True
        if sliced:
            continue
        # /Length absent or failed verification: EOL-delimiter fallback
        sm = _STREAM_RE.search(data, kw.start())
        if sm is None:
            objects[num] = data[start:]
            break
        objects[num] = data[start : sm.end()]
        after = data.find(b"endobj", sm.end())
        pos = after + 6 if after != -1 else sm.end()
    for num in list(objects):
        body = objects[num]
        if b"/ObjStm" not in body:
            continue
        payload = _decoded_stream(body)
        if payload is None:
            continue
        n_m = re.search(rb"/N\s+(\d+)", body)
        first_m = re.search(rb"/First\s+(\d+)", body)
        if n_m is None or first_m is None:
            continue
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = payload[:first].split()
        if len(header) < 2 * n:
            continue
        entries = [
            (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
        ]
        for i, (objnum, off) in enumerate(entries):
            end = entries[i + 1][1] if i + 1 < n else len(payload) - first
            objects.setdefault(objnum, payload[first + off : first + end])
    return objects


def _page_object_numbers(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order from the /Pages tree
    (empty when no tree parses — callers fall back to object order)."""
    for body in objects.values():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if kids:
                return [
                    int(m.group(1))
                    for m in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1))
                ]
            break
    return []


def _page_content_streams(data: bytes) -> list[bytes]:
    """Decoded content stream per page, in document page order."""
    objects = _collect_objects(data)
    decoded_stream = _decoded_stream
    page_nums = _page_object_numbers(objects)
    streams: list[bytes] = []
    if page_nums:
        for pn in page_nums:
            page = objects.get(pn, b"")
            cref = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page)
            if cref:
                s = decoded_stream(objects.get(int(cref.group(1)), b""))
                if s is not None:
                    streams.append(s)
        if streams:
            return streams
    # fallback: every stream that parses, in object order
    for num in sorted(objects):
        s = decoded_stream(objects[num])
        if s is not None:
            streams.append(s)
    return streams


def extract_pdf_text(data: bytes) -> list[list[tuple[float, float, str]]]:
    """Per page, the positioned text chunks ``(x, y, text)`` in emission
    order. Interprets the text-positioning subset every digitally-born
    table PDF uses: Tm/Td/TD/T*/TL and Tj/TJ."""
    pages: list[list[tuple[float, float, str]]] = []
    for stream in _page_content_streams(data):
        chunks: list[tuple[float, float, str]] = []
        x = y = 0.0
        lx = ly = 0.0  # line start (Td/TD move relative to it)
        leading = 0.0
        nums: list[float] = []
        pending: list[str] = []
        for m in _STR_TOKEN.finditer(stream):
            tok = m.group(0)
            if tok.startswith(b"("):
                pending.append(_unescape_pdf_string(tok[1:-1]))
                continue
            if tok in (b"[", b"]", b"<<", b">>") or tok.startswith(b"/"):
                continue  # array/dict delimiters and names carry no state here
            try:
                nums.append(float(tok))
                continue
            except ValueError:
                pass
            op = tok
            if op == b"Tm" and len(nums) >= 6:
                x = lx = nums[-2]
                y = ly = nums[-1]
            elif op in (b"Td", b"TD") and len(nums) >= 2:
                if op == b"TD":
                    leading = -nums[-1]
                lx += nums[-2]
                ly += nums[-1]
                x, y = lx, ly
            elif op == b"TL" and nums:
                leading = nums[-1]
            elif op == b"T*":
                ly -= leading
                x, y = lx, ly
            elif op in (b"Tj", b"'", b'"', b"TJ"):
                if op in (b"'", b'"'):  # quote ops imply T* first
                    ly -= leading
                    x, y = lx, ly
                text = "".join(pending)
                if text:
                    chunks.append((x, y, text))
            pending = []
            nums = []
        pages.append(chunks)
    return pages


def _cluster(values: list[float], tol: float) -> list[float]:
    anchors: list[float] = []
    for v in sorted(values):
        if not anchors or v - anchors[-1] > tol:
            anchors.append(v)
    return anchors


def page_table_rows(
    chunks: list[tuple[float, float, str]],
    y_tol: float = 3.0,
    x_tol: float = 4.0,
) -> list[list[str | None]]:
    """Recover the page's table grid from positioned text: cluster y into
    rows (top-down) and x into column anchors (left-right); a cell is the
    space-joined text at (row, column)."""
    if not chunks:
        return []
    ys = _cluster([c[1] for c in chunks], y_tol)
    xs = _cluster([c[0] for c in chunks], x_tol)

    def nearest(anchors: list[float], v: float) -> int:
        return min(range(len(anchors)), key=lambda i: abs(anchors[i] - v))

    grid: dict[tuple[int, int], list[tuple[float, str]]] = {}
    for cx, cy, text in chunks:
        grid.setdefault((nearest(ys, cy), nearest(xs, cx)), []).append((cx, text))
    rows: list[list[str | None]] = []
    for yi in range(len(ys) - 1, -1, -1):  # PDF y grows upward
        row: list[str | None] = []
        for xi in range(len(xs)):
            parts = sorted(grid.get((yi, xi), []))
            row.append(" ".join(p[1] for p in parts) if parts else None)
        rows.append(row)
    return rows


def header_slug(text: str) -> str:
    """Reference ``header_slug`` (pdf.py:45-50): slugified with ``_``."""
    s = re.sub(r"[^a-z0-9]+", "_", text.lower()).strip("_")
    return s


def parse_pdf_table(
    data: bytes,
    headers_per_page: bool = False,
    skiprows: int = 0,
) -> Iterator[dict[str, str | None]]:
    """Yield dict rows for the table in a PDF byte string — the
    reference's ``parse_pdf_table`` contract (headers from the first
    row, duplicate headers raise, repeated header rows skipped)."""
    headers: list[str] | None = None
    for chunks in extract_pdf_text(data):
        if headers_per_page:
            headers = None
        for row_num, row in enumerate(page_table_rows(chunks)):
            if headers is None:
                if row_num < skiprows:
                    continue
                headers = [header_slug(c or "") for c in row]
                dupes = {h for h in headers if headers.count(h) > 1}
                if dupes:
                    raise ValueError(f"Duplicate headers: {sorted(dupes)}")
                continue
            padded = (row + [None] * len(headers))[: len(headers)]
            if [header_slug(c or "") for c in padded] == headers:
                continue  # repeated header row
            yield dict(zip(headers, padded))


# ---------------------------------------------------------------------------
# Spark readers


def read_pdf_tables(
    spark: SparkSession,
    path: str,
    headers_per_page: bool = False,
    skiprows: int = 0,
) -> DataFrame:
    """S7 single-artifact scan: parse one PDF's table on the driver (the
    reference's own position for crawler-landed files) and return it as a
    string-typed DataFrame keyed by slugified headers."""
    with open(path, "rb") as fh:
        data = fh.read()
    rows = list(parse_pdf_table(data, headers_per_page, skiprows))
    if not rows:
        raise ValueError(f"no table rows found in {path}")
    headers = list(rows[0].keys())
    schema = ", ".join(f"`{h}` STRING" for h in headers)
    return spark.createDataFrame(
        [tuple(r[h] for h in headers) for r in rows], schema
    )


def read_pdf_tables_distributed(
    spark: SparkSession,
    glob: str,
    columns: list[str],
    headers_per_page: bool = False,
    skiprows: int = 0,
) -> DataFrame:
    """S7 fleet scan: ``binaryFile`` source + ``mapInPandas`` — one task
    per PDF, parsing fans out across executors; the driver never touches
    file bytes. ``columns`` fixes the output schema (parsed headers must
    match; extra/missing cells surface as NULL)."""
    import pandas as pd

    schema = ", ".join(
        ["`_path` STRING"] + [f"`{c}` STRING" for c in columns]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = list(
                    parse_pdf_table(bytes(content), headers_per_page, skiprows)
                )
                yield pd.DataFrame(
                    {
                        "_path": [path] * len(rows),
                        **{
                            c: [r.get(c) for r in rows] for c in columns
                        },
                    }
                )

    files = spark.read.format("binaryFile").load(glob)
    return files.select("path", "content").mapInPandas(parse, schema)


# ---------------------------------------------------------------------------
# scanned / image-only PDFs (the reference's OCR-adjacent path:
# zavod/zavod/helpers/pdf.py:25-43 rasterizes pages with pdftoppm and
# hands the PNGs to external OCR/vision. A scanned PDF's page IS one
# full-page image XObject, so the dependency-light equivalent extracts
# the embedded scan bytes directly; the OCR engine itself is pluggable
# and stubbed in this container, like the multimodal image decode.)


def write_scanned_pdf(path: str, page_images: list[bytes]) -> None:
    """Write a minimal image-only (scanned-style) PDF: one page per image,
    each page a single /Image XObject drawn full-page, zero text
    operators — the structure pdftoppm-era scans actually have. Image
    bytes are stored under /DCTDecode (i.e. as-is, the way scanners embed
    JPEGs)."""
    objects: dict[int, bytes] = {}
    n_pages = len(page_images)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i, img in enumerate(page_images):
        page_num, cont_num, img_num = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_num} 0 R "
            f"/Resources << /XObject << /Im1 {img_num} 0 R >> >> >>"
        ).encode()
        draw = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
        objects[cont_num] = (
            f"<< /Length {len(draw)} >>".encode()
            + b"\nstream\n" + draw + b"\nendstream"
        )
        objects[img_num] = (
            f"<< /Type /XObject /Subtype /Image /Width 1275 /Height 1650 "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            f"/Filter /DCTDecode /Length {len(img)} >>".encode()
            + b"\nstream\n" + img + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    count = max(objects) + 1
    out += f"xref\n0 {count}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, count):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {count} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def pdf_page_images(data: bytes) -> list[tuple[int, bytes, str]]:
    """(page_number 1-based, image bytes, format) for each page's image
    XObject, in document page order. /DCTDecode streams come back as-is
    ("jpeg" — scanners embed JPEG), Flate-compressed rasters decompressed
    ("raw"). Pages without an image XObject are skipped."""
    objects = _collect_objects(data)
    page_nums = _page_object_numbers(objects) or sorted(
        num for num, body in objects.items()
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body
    )
    out: list[tuple[int, bytes, str]] = []
    for page_no, pn in enumerate(page_nums, start=1):
        page = objects.get(pn, b"")
        xobj = re.search(rb"/XObject\s*<<(.*?)>>", page, re.S)
        if xobj is None:
            continue
        for m in re.finditer(rb"/\w+\s+(\d+)\s+\d+\s+R", xobj.group(1)):
            body = objects.get(int(m.group(1)), b"")
            if b"/Subtype" not in body or b"/Image" not in body:
                continue
            rs = _raw_stream(body)
            if rs is None:
                continue
            head, raw = rs
            if b"/DCTDecode" in head:
                out.append((page_no, raw, "jpeg"))
            elif b"/FlateDecode" in head:
                try:
                    out.append((page_no, zlib.decompress(raw), "raw"))
                except zlib.error:
                    continue
            else:
                out.append((page_no, raw, "raw"))
            break  # one image per page: the scan itself
    return out


def pdf_is_scanned(data: bytes) -> bool:
    """True for image-only PDFs: pages carry image XObjects and the text
    interpreter finds zero positioned text — the signal the reference
    uses to route a document to the page-image/OCR path."""
    if any(chunk for page in extract_pdf_text(data) for chunk in page):
        return False
    return bool(pdf_page_images(data))


def _no_ocr(image: bytes, fmt: str) -> str:  # pragma: no cover - the stub
    raise NotImplementedError(
        "no OCR engine in this container; inject ocr_fn "
        "(the reference rasterizes via pdftoppm and hands pages to "
        "external OCR/vision, zavod/zavod/helpers/pdf.py:25-43)"
    )


def read_pdf_pages_distributed(spark: SparkSession, glob: str) -> DataFrame:
    """Scanned-PDF fleet scan: ``binaryFile`` source + ``mapInPandas``,
    one row per (path, page, image, format) — extraction fans out across
    executors, the driver never touches file bytes. Feed the result to
    ``ocr_pages``."""
    import pandas as pd

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                images = pdf_page_images(bytes(content))
                yield pd.DataFrame(
                    {
                        "path": [path] * len(images),
                        "page": [p for p, _, _ in images],
                        "image": [b for _, b, _ in images],
                        "format": [f for _, _, f in images],
                    }
                )

    files = spark.read.format("binaryFile").load(glob)
    return files.select("path", "content").mapInPandas(
        expand, "path STRING, page INT, image BINARY, format STRING"
    )


def ocr_pages(pages: DataFrame, ocr_fn=_no_ocr) -> DataFrame:
    """Run the (pluggable) OCR engine over page images in Arrow batches —
    adds a ``text`` column. The engine is per-image Python by nature
    (exactly the multimodal-decode regime), so this is a mapInPandas
    stage; everything downstream of it is back in the JVM."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in pages.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b["text"] = [
                ocr_fn(bytes(img), fmt)
                for img, fmt in zip(b["image"], b["format"])
            ]
            yield b

    return pages.mapInPandas(run, f"{fields}, text STRING")
