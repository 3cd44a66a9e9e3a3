"""Legacy .xls (OLE2 + BIFF8) scan — SURVEY §2.1 S6's last format gap
(zavod/zavod/helpers/excel.py:72-210 reads .xls via xlrd): writer→reader
round-trips, OLE2 stream extraction, RK decoding, SST continuation."""

from __future__ import annotations

import struct

import pytest

from opensanctions_spark.sources import read_excel_source
from opensanctions_spark.sources.xls import (
    _rk_value,
    _SSTReader,
    ole2_streams,
    write_xls,
    xls_rows,
)


def _roundtrip(tmp_path, header, rows, **kw):
    path = str(tmp_path / "t.xls")
    write_xls(path, header, rows, **kw)
    with open(path, "rb") as fh:
        return xls_rows(fh.read(), **({"sheet": kw["sheet"]} if "sheet" in kw else {}))


def test_roundtrip_strings_and_numbers(tmp_path):
    got = _roundtrip(
        tmp_path,
        ["id", "name", "score"],
        [[1, "alpha", 1.5], [2, "beta", 10]],
    )
    assert got == [
        ["id", "name", "score"],
        ["1", "alpha", "1.5"],
        ["2", "beta", "10"],
    ]


def test_roundtrip_unicode_and_none(tmp_path):
    got = _roundtrip(
        tmp_path, ["k", "v"], [[1, "Müller"], [2, None], [3, "日本"]]
    )
    assert got[1] == ["1", "Müller"]
    assert got[2] == ["2", None]
    assert got[3] == ["3", "日本"]


def test_shared_strings_dedupe(tmp_path):
    # same string in many cells → one SST entry, every cell resolves
    got = _roundtrip(tmp_path, ["a", "b"], [["x", "x"], ["x", "y"]])
    assert got[1] == ["x", "x"] and got[2] == ["x", "y"]


def test_ole2_stream_extraction(tmp_path):
    path = str(tmp_path / "t.xls")
    write_xls(path, ["a"], [["b"]])
    with open(path, "rb") as fh:
        data = fh.read()
    streams = ole2_streams(data)
    assert "Workbook" in streams
    assert streams["Workbook"][:2] == struct.pack("<H", 0x0809)  # BOF


def test_not_ole2_raises():
    with pytest.raises(ValueError, match="OLE2"):
        ole2_streams(b"PK\x03\x04 definitely a zip")


def test_rk_decoding():
    # integer RK: 30-bit signed << 2, fInt flag 0x02
    assert _rk_value((100 << 2) | 2) == 100.0
    assert _rk_value(struct.unpack("<I", struct.pack("<i", (-7 << 2) | 2))[0]) == -7.0
    # double RK: top 30 bits of 1.5
    top = struct.unpack("<Q", struct.pack("<d", 1.5))[0] >> 32
    assert _rk_value(top & 0xFFFFFFFC) == 1.5
    # cents flag divides by 100
    assert _rk_value(((123 << 2) | 2) | 1) == 1.23


def test_sst_reader_spans_continue_parts():
    # string "abcdef" split across an SST part and a CONTINUE part, with
    # the grbit re-specified at the boundary (compressed both times)
    part1 = struct.pack("<H", 6) + bytes([0]) + b"abc"
    part2 = bytes([0]) + b"def"
    rdr = _SSTReader([part1, part2])
    assert rdr.read_string() == "abcdef"


def test_sst_reader_wide_after_boundary():
    part1 = struct.pack("<H", 4) + bytes([0]) + b"ab"
    part2 = bytes([1]) + "cd".encode("utf-16-le")
    rdr = _SSTReader([part1, part2])
    assert rdr.read_string() == "abcd"


def test_read_excel_source_xls(spark, tmp_path):
    path = str(tmp_path / "t.xls")
    write_xls(path, ["id", "name"], [[1, "x"], [2, "y"]])
    df = read_excel_source(spark, path)
    assert df.columns == ["id", "name"]
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {"1": "x", "2": "y"}


def test_read_excel_source_xlsx_still_works(spark, tmp_path):
    from opensanctions_spark.sources import write_xlsx

    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, ["id", "name"], [[1, "x"]])
    df = read_excel_source(spark, path)
    assert df.count() == 1
