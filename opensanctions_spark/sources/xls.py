"""Legacy .xls (BIFF8) scan — the last source-format gap of SURVEY §2.1
S6 (``zavod/zavod/helpers/excel.py:72-210`` reads .xls via xlrd; xlrd is
not installed here, so this is a dependency-light stdlib reader for the
common digitally-born workbook).

Two layers, both minimal but real:

- **OLE2 compound document**: header + DIFAT → FAT chains, directory
  tree, the mini-FAT/mini-stream for small streams — enough to locate
  and extract the ``Workbook`` (or ``Book``) stream from any real file.
- **BIFF8 records**: SST (incl. CONTINUE-spanning string tables with
  per-boundary grbit re-specification), LABELSST, LABEL, NUMBER,
  RK/MULRK, BOOLERR, BLANK; worksheet substreams located via
  BOUNDSHEET offsets.

Cell-to-string semantics mirror the xlsx reader (and the reference's
excel helper): every cell a string, integral doubles render without the
trailing ``.0``, missing cells are None.

A matching writer (``write_xls``) emits a real OLE2+BIFF8 file (globals
substream with SST, worksheet substream with LABELSST/NUMBER cells) so
tests and fixtures round-trip without binary blobs in the repo.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# OLE2 compound document

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


def _chain(fat: list[int], start: int) -> list[int]:
    out = []
    s = start
    while s not in (_ENDCHAIN, _FREE) and s < len(fat):
        out.append(s)
        s = fat[s]
        if len(out) > len(fat):  # cycle guard
            raise ValueError("corrupt OLE2 FAT chain")
    return out


def ole2_streams(data: bytes) -> dict[str, bytes]:
    """Parse an OLE2 compound file into {stream name: bytes}."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError("not an OLE2 compound document (bad magic)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s in (_ENDCHAIN, _FREE):
            break
        sect = sector(s)
        entries = struct.unpack(f"<{ssz // 4}I", sect)
        difat.extend(entries[:-1])
        s = entries[-1]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs in (_FREE, _ENDCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    dir_data = b"".join(sector(s) for s in _chain(fat, dir_start))
    entries = []
    for off in range(0, len(dir_data), 128):
        ent = dir_data[off : off + 128]
        if len(ent) < 128:
            break
        name_len = struct.unpack_from("<H", ent, 64)[0]
        if name_len < 2:
            continue
        name = ent[: name_len - 2].decode("utf-16-le", errors="replace")
        etype = ent[66]
        start = struct.unpack_from("<I", ent, 116)[0]
        size = struct.unpack_from("<Q", ent, 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = b""
    if root is not None and root[2] not in (_ENDCHAIN, _FREE):
        mini_stream = b"".join(sector(s) for s in _chain(fat, root[2]))
    minifat: list[int] = []
    if n_minifat and minifat_start not in (_ENDCHAIN, _FREE):
        for s in _chain(fat, minifat_start):
            minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream
            continue
        if size < mini_cutoff:
            chunks = [
                mini_stream[s * mssz : (s + 1) * mssz]
                for s in _chain(minifat, start)
            ]
            out[name] = b"".join(chunks)[:size]
        else:
            out[name] = b"".join(sector(s) for s in _chain(fat, start))[:size]
    return out


def _ole2_wrap(stream_name: str, payload: bytes) -> bytes:
    """Build a minimal OLE2 file holding one FAT-resident stream (padded
    past the 4096-byte mini cutoff so no mini-FAT is needed)."""
    payload = payload + b"\x00" * max(0, 4096 - len(payload))
    n_payload = (len(payload) + 511) // 512
    payload = payload.ljust(n_payload * 512, b"\x00")
    # sectors: [0]=FAT, [1]=directory, [2:]=payload
    n_sectors = 2 + n_payload
    fat = [_FREE] * (512 // 4)
    fat[0] = _FATSECT
    fat[1] = _ENDCHAIN  # directory (one sector)
    for i in range(n_payload):
        fat[2 + i] = 3 + i if i + 1 < n_payload else _ENDCHAIN
    if n_sectors > len(fat):
        raise ValueError("stream too large for the single-FAT writer")

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = bytearray(128)
        ent[0 : len(raw)] = raw
        struct.pack_into("<H", ent, 64, len(raw))
        ent[66] = etype
        ent[67] = 1  # black
        struct.pack_into("<iii", ent, 68, -1, -1, 1 if etype == 5 else -1)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, size)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, _ENDCHAIN, 0)
        + dirent(stream_name, 2, 2, len(payload))
        + b"\x00" * 64 * 2 + b"\xff" * 0
    )
    directory = directory.ljust(512, b"\x00")
    header = bytearray(512)
    header[:8] = _OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x3E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory start
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, _ENDCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *( [0] + [_FREE] * 108 ))
    fat_sector = struct.pack(f"<{len(fat)}I", *fat)
    return bytes(header) + fat_sector + directory + payload


# ---------------------------------------------------------------------------
# BIFF8 records

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_BOUNDSHEET = 0x0085
_CODEPAGE = 0x0042
_DIMENSIONS = 0x0200
_HLINK = 0x01B8

#: HLINK stream CLSID (StdHlink) and the URL moniker CLSID — the two
#: GUIDs that frame a BIFF8 hyperlink record ([MS-XLS] 2.4.140).
_HLINK_CLSID = bytes.fromhex("d0c9ea79f9bace118c8200aa004ba90b")
_URL_MONIKER = bytes.fromhex("e0c9ea79f9bace118c8200aa004ba90b")


def _parse_hlink(payload: bytes) -> tuple[int, int, int, int, str] | None:
    """One HLINK record → (rwFirst, rwLast, colFirst, colLast, url), or
    None for non-URL links (file monikers, UNC paths, intra-book
    anchors). Follows [MS-XLS] HyperlinkObject: optional display-name
    and target-frame strings come before the moniker."""
    try:
        rw_first, rw_last, col_first, col_last = struct.unpack_from(
            "<HHHH", payload, 0
        )
        pos = 8
        if payload[pos : pos + 16] != _HLINK_CLSID:
            return None
        pos += 16
        (_version, flags) = struct.unpack_from("<II", payload, pos)
        pos += 8
        if flags & 0x10:  # hlstmfHasDisplayName
            (n,) = struct.unpack_from("<I", payload, pos)
            pos += 4 + 2 * n
        if flags & 0x80:  # hlstmfHasFrameName
            (n,) = struct.unpack_from("<I", payload, pos)
            pos += 4 + 2 * n
        if not flags & 0x01 or flags & 0x100:  # no moniker / UNC path
            return None
        if payload[pos : pos + 16] != _URL_MONIKER:
            return None
        pos += 16
        (nbytes,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        url = payload[pos : pos + nbytes].decode("utf-16-le").rstrip("\x00")
        return rw_first, rw_last, col_first, col_last, url
    except (struct.error, UnicodeDecodeError):
        return None


def _hlink_record(row: int, col: int, url: str) -> bytes:
    """Serialize one URL hyperlink for (row, col) — the writer twin of
    ``_parse_hlink`` (flags: hlstmfHasMoniker | hlstmfIsAbsolute)."""
    raw = url.encode("utf-16-le") + b"\x00\x00"
    payload = (
        struct.pack("<HHHH", row, row, col, col)
        + _HLINK_CLSID
        + struct.pack("<II", 2, 0x03)
        + _URL_MONIKER
        + struct.pack("<I", len(raw))
        + raw
    )
    return payload


def _records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, rid, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _SSTReader:
    """Unicode-string reader spanning SST + CONTINUE payloads; grbit is
    re-specified at every CONTINUE boundary (the BIFF8 quirk xlrd
    exists to handle)."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.pi = 0
        self.off = 0

    def _remaining(self) -> int:
        return len(self.parts[self.pi]) - self.off

    def _advance(self) -> bool:
        """Move to the next CONTINUE part; returns True if one exists."""
        if self.pi + 1 < len(self.parts):
            self.pi += 1
            self.off = 0
            return True
        return False

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self._remaining() == 0 and not self._advance():
                raise ValueError("truncated SST")
            take = min(n, self._remaining())
            p = self.parts[self.pi]
            out += p[self.off : self.off + take]
            self.off += take
            n -= take
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        rich = grbit & 0x08
        ext = grbit & 0x04
        n_rich = struct.unpack("<H", self.read(2))[0] if rich else 0
        n_ext = struct.unpack("<i", self.read(4))[0] if ext else 0
        chars: list[str] = []
        wide = grbit & 0x01
        left = cch
        while left > 0:
            if self._remaining() == 0:
                if not self._advance():
                    raise ValueError("truncated SST string")
                # each CONTINUE restates the encoding flag for its part
                wide = self.read(1)[0] & 0x01
            avail = self._remaining()
            take = min(left, avail // 2 if wide else avail)
            if take == 0:
                raise ValueError("corrupt SST continuation")
            raw = self.read(take * 2 if wide else take)
            chars.append(
                raw.decode("utf-16-le") if wide else raw.decode("latin-1")
            )
            left -= take
        if n_rich:
            self.read(n_rich * 4)
        if n_ext:
            self.read(n_ext)
        return "".join(chars)


def _parse_sst(parts: list[bytes]) -> list[str]:
    rdr = _SSTReader(parts)
    rdr.read(4)  # total refs
    n_unique = struct.unpack("<I", rdr.read(4))[0]
    return [rdr.read_string() for _ in range(n_unique)]


def _inline_string(payload: bytes, off: int) -> str:
    cch = struct.unpack_from("<H", payload, off)[0]
    grbit = payload[off + 2]
    raw = payload[off + 3 :]
    if grbit & 0x01:
        return raw[: cch * 2].decode("utf-16-le")
    return raw[:cch].decode("latin-1")


def _rk_value(rk: int) -> float:
    cents = rk & 0x01
    if rk & 0x02:  # integer: top 30 bits, arithmetic shift keeps the sign
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:  # top 30 bits of an IEEE double
        v = struct.unpack(
            "<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC)
        )[0]
    return v / 100.0 if cents else v


def _fmt_number(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def xls_rows(data: bytes, sheet: int = 0) -> list[list[str | None]]:
    """Parse one worksheet of a .xls byte string into rows of cell
    strings (None for gaps) — same contract as ``_xlsx_rows``."""
    return xls_rows_links(data, sheet)[0]


def xls_rows_links(
    data: bytes, sheet: int = 0
) -> tuple[list[list[str | None]], dict[tuple[int, int], str]]:
    """Like ``xls_rows`` but also returns the sheet's hyperlink map
    {(row, col): url} from HLINK records — the xlrd ``hyperlink_map``
    analogue the reference's ``parse_xls_sheet`` consumes
    (``zavod/zavod/helpers/excel.py:104-109``)."""
    streams = ole2_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream in .xls file")

    # pass 1 over the globals substream: SST + BOUNDSHEET offsets
    sst: list[str] = []
    sheet_offsets: list[int] = []
    sst_parts: list[bytes] | None = None
    for pos, rid, payload in _records(wb):
        if rid == _SST:
            sst_parts = [payload]
        elif rid == _CONTINUE and sst_parts is not None:
            sst_parts.append(payload)
        elif rid == _BOUNDSHEET:
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif rid == _EOF:
            break  # end of globals substream
        elif sst_parts is not None and rid not in (_SST, _CONTINUE):
            pass  # SST fully read
    if sst_parts:
        sst = _parse_sst(sst_parts)
    if not sheet_offsets:
        raise ValueError("no BOUNDSHEET records in workbook globals")
    if sheet >= len(sheet_offsets):
        raise ValueError(f"sheet {sheet} out of range")

    cells: dict[tuple[int, int], str | None] = {}
    links: dict[tuple[int, int], str] = {}
    substream = wb[sheet_offsets[sheet] :]
    depth = 0
    for pos, rid, payload in _records(substream):
        if rid == _BOF:
            depth += 1
        elif rid == _EOF:
            depth -= 1
            if depth <= 0:
                break
        elif rid == _HLINK:
            parsed = _parse_hlink(payload)
            if parsed is not None:
                rw0, rw1, c0_, c1_, url = parsed
                for r in range(rw0, rw1 + 1):
                    for c in range(c0_, c1_ + 1):
                        links[(r, c)] = url
        elif rid == _LABELSST:
            r, c, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
            cells[(r, c)] = sst[isst] if isst < len(sst) else None
        elif rid == _LABEL:
            r, c, _xf = struct.unpack_from("<HHH", payload, 0)
            cells[(r, c)] = _inline_string(payload, 6)
        elif rid == _NUMBER:
            r, c, _xf = struct.unpack_from("<HHH", payload, 0)
            v = struct.unpack_from("<d", payload, 6)[0]
            cells[(r, c)] = _fmt_number(v)
        elif rid == _RK:
            r, c, _xf, rk = struct.unpack_from("<HHHI", payload, 0)
            cells[(r, c)] = _fmt_number(_rk_value(rk))
        elif rid == _MULRK:
            r, c0 = struct.unpack_from("<HH", payload, 0)
            c_last = struct.unpack_from("<H", payload, len(payload) - 2)[0]
            for i in range(c_last - c0 + 1):
                rk = struct.unpack_from("<I", payload, 4 + i * 6 + 2)[0]
                cells[(r, c0 + i)] = _fmt_number(_rk_value(rk))
        elif rid == _BOOLERR:
            r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
            cells[(r, c)] = (
                None if is_err else ("TRUE" if val else "FALSE")
            )
    if not cells:
        return [], links
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)
    ], links


# ---------------------------------------------------------------------------
# writer


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _ustr(s: str) -> bytes:
    """BIFF8 unicode string, 16-bit length."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(s), 0) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def write_xls(path: str, header: list[str], rows: list[list[object]],
              sheet_name: str = "Sheet1",
              links: dict[tuple[int, int], str] | None = None) -> None:
    """Write a real single-sheet BIFF8 .xls: OLE2 container, globals
    substream (CODEPAGE, BOUNDSHEET, SST), worksheet substream with
    LABELSST string cells and NUMBER numeric cells. ``links`` maps
    (row, col) — header row = 0 — to URL hyperlinks (HLINK records)."""
    all_rows = [list(header)] + [list(r) for r in rows]
    strings: list[str] = []
    index: dict[str, int] = {}
    n_refs = 0
    for r in all_rows:
        for v in r:
            if v is None or isinstance(v, (int, float)):
                continue
            s = str(v)
            n_refs += 1
            if s not in index:
                index[s] = len(strings)
                strings.append(s)

    sst_payload = struct.pack("<II", n_refs, len(strings)) + b"".join(
        _ustr(s) for s in strings
    )
    if len(sst_payload) > 8220:
        raise ValueError("SST too large for the single-record writer")

    sheet_cells = []
    for ri, r in enumerate(all_rows):
        for ci, v in enumerate(r):
            if v is None:
                continue
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                sheet_cells.append(
                    _rec(_NUMBER, struct.pack("<HHHd", ri, ci, 15, float(v)))
                )
            else:
                sheet_cells.append(
                    _rec(
                        _LABELSST,
                        struct.pack("<HHHI", ri, ci, 15, index[str(v)]),
                    )
                )

    bof_globals = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600))
    bof_sheet = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600))
    dims = _rec(
        _DIMENSIONS,
        struct.pack("<IIHHH", 0, len(all_rows), 0,
                    max(len(r) for r in all_rows), 0),
    )
    link_recs = b"".join(
        _rec(_HLINK, _hlink_record(r, c, url))
        for (r, c), url in sorted((links or {}).items())
    )
    sheet_sub = bof_sheet + dims + b"".join(sheet_cells) + link_recs + _rec(_EOF, b"")

    # BOUNDSHEET needs the sheet substream's absolute offset: build the
    # globals with a placeholder, then patch (fixed-length field)
    name8 = sheet_name.encode("latin-1")[:31]
    boundsheet = _rec(
        _BOUNDSHEET,
        struct.pack("<IH", 0, 0) + bytes([len(name8), 0]) + name8,
    )
    globals_sub = (
        bof_globals
        + _rec(_CODEPAGE, struct.pack("<H", 1200))
        + boundsheet
        + _rec(_SST, sst_payload)
        + _rec(_EOF, b"")
    )
    offset = len(globals_sub)
    bs_pos = len(bof_globals) + len(_rec(_CODEPAGE, struct.pack("<H", 1200)))
    globals_sub = (
        globals_sub[: bs_pos + 4]
        + struct.pack("<I", offset)
        + globals_sub[bs_pos + 8 :]
    )
    with open(path, "wb") as fh:
        fh.write(_ole2_wrap("Workbook", globals_sub + sheet_sub))
