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


def _build_minifat_ole2(stream_name: str, payload: bytes) -> bytes:
    """Hand-built OLE2 container storing the payload in the MINI stream
    (the layout real writers use for streams < 4096 bytes — our writer
    deliberately pads past the cutoff, so this exercises the reader's
    mini-FAT path)."""
    assert len(payload) < 4096
    n_mini = (len(payload) + 63) // 64
    mini_stream = payload.ljust(n_mini * 64, b"\x00")
    n_mini_sectors = (len(mini_stream) + 511) // 512
    mini_stream = mini_stream.ljust(n_mini_sectors * 512, b"\x00")

    # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=mini stream data
    fat = [0xFFFFFFFF] * 128
    fat[0] = 0xFFFFFFFD          # FAT sector
    fat[1] = 0xFFFFFFFE          # directory
    fat[2] = 0xFFFFFFFE          # mini FAT (one sector)
    for i in range(n_mini_sectors):
        fat[3 + i] = 4 + i if i + 1 < n_mini_sectors else 0xFFFFFFFE

    minifat = [0xFFFFFFFF] * 128
    for i in range(n_mini):
        minifat[i] = i + 1 if i + 1 < n_mini else 0xFFFFFFFE

    def dirent(name, etype, start, size):
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[: len(raw)] = raw
        struct.pack_into("<H", ent, 64, len(raw))
        ent[66] = etype
        ent[67] = 1
        struct.pack_into("<iii", ent, 68, -1, -1, 1 if etype == 5 else -1)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, size)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, 3, len(mini_stream))   # root holds the mini stream
        + dirent(stream_name, 2, 0, len(payload))      # mini-sector 0
    ).ljust(512, b"\x00")

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)
    struct.pack_into("<H", header, 26, 3)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, 1)        # directory start
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, 2)        # mini FAT start sector
    struct.pack_into("<I", header, 64, 1)        # one mini FAT sector
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *([0] + [0xFFFFFFFF] * 108))
    return (
        bytes(header)
        + struct.pack("<128I", *fat)
        + directory
        + struct.pack("<128I", *minifat)
        + mini_stream
    )


def test_ole2_minifat_stream_extraction(tmp_path):
    """Streams under the 4096-byte cutoff live in the mini stream with
    mini-FAT chaining — the reader must follow both."""
    # a small BIFF payload: reuse write_xls's workbook bytes by building
    # a tiny workbook, extracting its stream, and re-wrapping it mini-FAT
    path = str(tmp_path / "t.xls")
    write_xls(path, ["a", "b"], [["x", "y"], ["z", "w"]])
    with open(path, "rb") as fh:
        wb = ole2_streams(fh.read())["Workbook"]
    wb = wb.rstrip(b"\x00")
    assert len(wb) < 4096

    data = _build_minifat_ole2("Workbook", wb)
    streams = ole2_streams(data)
    assert streams["Workbook"] == wb
    rows = xls_rows(data)
    assert rows == [["a", "b"], ["x", "y"], ["z", "w"]]
