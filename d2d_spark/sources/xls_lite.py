"""Minimal self-contained legacy ``.xls`` (BIFF8) codec — stdlib only.

The reference reads ``.xls`` through xlrd (d22d/utils/db/__init__.py:
839-939); this sandbox has no xlrd, and openpyxl (when present) reads
only ``.xlsx``. A BIFF8 workbook is an OLE2 Compound File holding a
``Workbook`` stream of typed records; the subset the connector needs
(rectangular tables, first row = header, multiple sheets) fits in a
small codec:

  reader — CFB container walk (FAT + mini-FAT chains, directory),
    then BIFF records: SST shared strings (incl. CONTINUE spans that
    re-flag mid-string), LABELSST / LABEL / NUMBER / RK / MULRK /
    BOOLERR / FORMULA-with-cached-result cells, BOUNDSHEET substream
    offsets.
  writer — one ``Workbook`` stream (globals: BOF, CODEPAGE, one
    BOUNDSHEET per sheet, SST; per sheet: BOF, DIMENSIONS, LABELSST /
    NUMBER / BOOLERR cells) wrapped in a minimal single-stream CFB
    container. Strings all ride the SST, split across CONTINUE
    records when they outgrow the 8224-byte record cap.

Same value model as ``xlsx_lite``: numbers are ALWAYS floats (one
workbook part must not infer long while a sibling holds 1.5), strings
round-trip verbatim, None/NaN cells are omitted.
"""

from __future__ import annotations

import io
import math
import struct

import pandas as pd

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD

# BIFF record ids
_BOF = 0x0809
_EOF = 0x000A
_CODEPAGE = 0x0042
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_RSTRING = 0x00D6
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_DIMENSIONS = 0x0200
_BLANK = 0x0201
_MULBLANK = 0x00BE

#: max bytes of record payload (BIFF8)
_REC_CAP = 8224


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------
def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def _cfb_read_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in ``names``."""
    if data[:8] != _CFB_SIG:
        raise ValueError("not an OLE2 compound file (bad signature)")
    sect_size = 1 << _u16(data, 30)
    mini_size = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    difat_start = _u32(data, 68)

    def sector(n: int) -> bytes:
        # per-spec offset is (n+1)*sect_size: identical to 512+n*512
        # for v3, and correct for v4 files whose 4096-byte sector 0
        # starts at offset 4096
        off = (n + 1) * sect_size
        return data[off : off + sect_size]

    difat = [
        _u32(data, 76 + 4 * i) for i in range(109) if _u32(data, 76 + 4 * i) != _FREE
    ]
    s = difat_start
    seen = set()
    while s < _FATSECT and s not in seen:
        seen.add(s)
        blk = sector(s)
        per = sect_size // 4 - 1
        difat += [
            _u32(blk, 4 * i) for i in range(per) if _u32(blk, 4 * i) != _FREE
        ]
        s = _u32(blk, sect_size - 4)
    fat: list[int] = []
    for fs in difat[:n_fat]:
        blk = sector(fs)
        fat += [_u32(blk, 4 * i) for i in range(sect_size // 4)]

    def chain(start: int, table: list[int]) -> list[int]:
        out, s, seen = [], start, set()
        while s < _FATSECT and s not in seen:
            seen.add(s)
            out.append(s)
            s = table[s]
        return out

    directory = b"".join(sector(s) for s in chain(dir_start, fat))
    entries = []
    for off in range(0, len(directory), 128):
        ent = directory[off : off + 128]
        if len(ent) < 128:
            break
        nlen = _u16(ent, 64)
        name = ent[: max(0, nlen - 2)].decode("utf-16-le", "replace") if nlen >= 2 else ""
        entries.append(
            {
                "name": name,
                "type": ent[66],
                "start": _u32(ent, 116),
                "size": struct.unpack_from("<Q", ent, 120)[0],
            }
        )
    root = next(e for e in entries if e["type"] == 5)
    target = next(
        (e for e in entries if e["type"] == 2 and e["name"] in names), None
    )
    if target is None:
        raise ValueError(f"compound file has no stream named one of {names}")
    if target["size"] >= cutoff:
        raw = b"".join(sector(s) for s in chain(target["start"], fat))
        return raw[: target["size"]]
    # small stream: lives in the root entry's mini stream
    mini_stream = b"".join(sector(s) for s in chain(root["start"], fat))[: root["size"]]
    minifat: list[int] = []
    for s in chain(minifat_start, fat):
        blk = sector(s)
        minifat += [_u32(blk, 4 * i) for i in range(sect_size // 4)]
    out, s, seen = [], target["start"], set()
    while s < _FATSECT and s not in seen:
        seen.add(s)
        out.append(mini_stream[s * mini_size : (s + 1) * mini_size])
        s = minifat[s]
    return b"".join(out)[: target["size"]]


def _dir_entry(
    name: str, etype: int, left: int, right: int, child: int, start: int, size: int
) -> bytes:
    nb = name.encode("utf-16-le")
    return (
        nb.ljust(64, b"\0")[:64]
        + struct.pack("<HBB", len(nb) + 2 if name else 0, etype, 1)
        + struct.pack("<III", left, right, child)
        + b"\0" * 16  # clsid
        + struct.pack("<I", 0)  # state
        + b"\0" * 16  # timestamps
        + struct.pack("<IQ", start, size)
    )


_DIFSECT = 0xFFFFFFFC


def _cfb_wrap(stream: bytes) -> bytes:
    """Wrap one stream as a ``Workbook`` entry in a minimal v3 CFB.

    The stream is zero-padded to the 4096-byte mini-stream cutoff so
    it always lives in regular sectors (the BIFF reader stops at EOF
    records / zero record type, so the padding is inert). Streams
    needing more than 109 FAT sectors (~7 MB) spill the extra FAT
    pointers into chained DIFAT sectors, so workbook size is bounded
    by BIFF8's own row limits, not by the container."""
    stream = stream + b"\0" * max(0, 4096 - len(stream))
    n_stream = math.ceil(len(stream) / 512)
    # fixpoint over (FAT sectors, DIFAT sectors): both occupy sectors
    # the FAT itself must cover
    n_fat, n_difat = 1, 0
    while True:
        total = n_difat + n_fat + 1 + n_stream
        need_fat = math.ceil(total / 128)
        need_difat = 0 if need_fat <= 109 else math.ceil((need_fat - 109) / 127)
        if (need_fat, need_difat) == (n_fat, n_difat):
            break
        n_fat, n_difat = need_fat, need_difat
    # layout: [DIFAT sectors][FAT sectors][directory][stream]
    fat_first = n_difat
    dir_sect = n_difat + n_fat
    first_stream = dir_sect + 1
    fat = [_DIFSECT] * n_difat + [_FATSECT] * n_fat + [_ENDCHAIN]  # + directory
    fat += [first_stream + i + 1 for i in range(n_stream - 1)] + [_ENDCHAIN]
    fat += [_FREE] * (n_fat * 128 - len(fat))
    header = (
        _CFB_SIG
        + b"\0" * 16
        + struct.pack("<HHHHH", 0x3E, 3, 0xFFFE, 9, 6)
        + b"\0" * 6
        + struct.pack(
            "<IIIIIIIII",
            0,  # directory sector count (v3: 0)
            n_fat,
            dir_sect,
            0,  # transaction
            4096,  # mini cutoff
            _ENDCHAIN,  # no mini FAT
            0,
            0 if n_difat else _ENDCHAIN,  # first DIFAT sector
            n_difat,
        )
    )
    fat_ids = [fat_first + i for i in range(n_fat)]
    difat_head = fat_ids[:109] + [_FREE] * (109 - min(n_fat, 109))
    header += struct.pack("<109I", *difat_head)
    difat_sects = b""
    rest = fat_ids[109:]
    for i in range(n_difat):
        chunk = rest[i * 127 : (i + 1) * 127]
        chunk += [_FREE] * (127 - len(chunk))
        nxt = i + 1 if i + 1 < n_difat else _ENDCHAIN
        difat_sects += struct.pack("<127I", *chunk) + struct.pack("<I", nxt)
    directory = (
        _dir_entry("Root Entry", 5, _FREE, _FREE, 1, _ENDCHAIN, 0)
        + _dir_entry("Workbook", 2, _FREE, _FREE, _FREE, first_stream, len(stream))
        + _dir_entry("", 0, _FREE, _FREE, _FREE, 0, 0) * 2
    )
    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)
    body = difat_sects + fat_bytes + directory + stream
    pad = (-len(body)) % 512
    return header + body + b"\0" * pad


# ---------------------------------------------------------------------------
# BIFF8 writer
# ---------------------------------------------------------------------------
def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0006))


def _short_string(s: str) -> bytes:
    """Sheet-name form: u8 char count + u8 flags + chars."""
    s = s[:255]
    if all(ord(c) < 256 for c in s):
        return struct.pack("<BB", len(s), 0) + s.encode("latin-1")
    enc = s.encode("utf-16-le")
    return struct.pack("<BB", len(enc) // 2, 1) + enc


def _sst_records(strings: list[str], total_refs: int) -> bytes:
    """SST + CONTINUE records; strings split mid-way re-emit the
    encoding flag byte at the start of the continuation (the BIFF8
    spanning rule)."""
    records: list[bytes] = []
    buf = bytearray(struct.pack("<II", total_refs, len(strings)))
    first = True

    def flush():
        nonlocal buf, first
        records.append(_rec(_SST if first else _CONTINUE, bytes(buf)))
        first = False
        buf = bytearray()

    for s in strings:
        compressed = all(ord(c) < 256 for c in s)
        data = s.encode("latin-1") if compressed else s.encode("utf-16-le")
        cch = len(s) if compressed else len(data) // 2
        if cch > 32767:
            raise ValueError(
                f"cell text of {cch:,} UTF-16 units exceeds the BIFF8 cap "
                "(32,767); truncate the value or write .xlsx instead"
            )
        char_w = 1 if compressed else 2
        if len(buf) + 3 > _REC_CAP - 1:  # header must not split
            flush()
        buf += struct.pack("<HB", cch, 0 if compressed else 1)
        pos = 0
        while pos < len(data):
            room = _REC_CAP - len(buf)
            room -= room % char_w  # never split a UTF-16 unit
            if room <= 0:
                flush()
                buf += struct.pack("<B", 0 if compressed else 1)  # re-flag
                continue
            buf += data[pos : pos + room]
            pos += room
    if buf or first:
        flush()
    return b"".join(records)


def write_sheets(sheets: list[tuple[str, "pd.DataFrame"]], buf) -> None:
    """Write (sheet_name, frame) pairs as a BIFF8 ``.xls`` workbook to
    a file-like or path. First row of each sheet = column names;
    strings ride the SST, numerics are NUMBER doubles, booleans
    BOOLERR, None/NaN cells are omitted."""
    if not sheets:
        raise ValueError("a workbook needs at least one sheet")
    sst: list[str] = []
    sst_index: dict[str, int] = {}
    refs = 0

    def isst(s: str) -> int:
        nonlocal refs
        refs += 1
        if s not in sst_index:
            sst_index[s] = len(sst)
            sst.append(s)
        return sst_index[s]

    sheet_blobs: list[bytes] = []
    for _, pdf in sheets:
        cells: list[bytes] = []
        ncols = len(pdf.columns)
        rows = [tuple(str(c) for c in pdf.columns)]
        rows += list(pdf.itertuples(index=False, name=None))
        # BIFF8 hard limits: 65,536 rows x 256 columns per sheet —
        # cell records carry u16/byte indexes, so exceeding them would
        # otherwise die in struct.pack mid-write
        if len(rows) > 65536:
            raise ValueError(
                f"sheet of {len(rows):,} rows (incl. header) exceeds the "
                "BIFF8 cap (65,536); lower max_rows_per_sheet or write .xlsx"
            )
        if ncols > 256:
            raise ValueError(
                f"sheet of {ncols} columns exceeds the BIFF8 cap (256); "
                "write .xlsx instead"
            )
        for r, row in enumerate(rows):
            row_cells = len(cells)
            for c, v in enumerate(row):
                if hasattr(v, "item") and type(v).__module__ == "numpy":
                    v = v.item()
                if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                    continue
                if isinstance(v, bool):
                    cells.append(
                        _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 15, int(v), 0))
                    )
                elif isinstance(v, (int, float)):
                    cells.append(_rec(_NUMBER, struct.pack("<HHHd", r, c, 15, float(v))))
                else:
                    cells.append(
                        _rec(_LABELSST, struct.pack("<HHHI", r, c, 15, isst(str(v))))
                    )
            if len(cells) == row_cells:
                # all-None row: a BLANK marker keeps the row present
                # (BIFF has no empty-row element like SpreadsheetML)
                cells.append(_rec(_BLANK, struct.pack("<HHH", r, 0, 15)))
        body = (
            _bof(0x0010)
            + _rec(
                _DIMENSIONS,
                struct.pack("<IIHHH", 0, len(rows), 0, max(ncols, 1), 0),
            )
            + b"".join(cells)
            + _rec(_EOF, b"")
        )
        sheet_blobs.append(body)

    sst_bytes = _sst_records(sst, refs)
    # globals length is needed for BOUNDSHEET stream offsets; the
    # boundsheet records have fixed sizes, so compute then emit
    bs_sizes = [4 + 6 + len(_short_string(name)) for name, _ in sheets]
    globals_len = (
        len(_bof(0x0005)) + len(_rec(_CODEPAGE, b"")) + 2 + sum(bs_sizes)
        + len(sst_bytes) + 4
    )
    offsets = []
    pos = globals_len
    for blob in sheet_blobs:
        offsets.append(pos)
        pos += len(blob)
    bounds = b"".join(
        _rec(_BOUNDSHEET, struct.pack("<IH", off, 0) + _short_string(name))
        for off, (name, _) in zip(offsets, sheets)
    )
    stream = (
        _bof(0x0005)
        + _rec(_CODEPAGE, struct.pack("<H", 0x04B0))
        + bounds
        + sst_bytes
        + _rec(_EOF, b"")
        + b"".join(sheet_blobs)
    )
    out = _cfb_wrap(stream)
    if hasattr(buf, "write"):
        buf.write(out)
    else:
        with open(buf, "wb") as f:
            f.write(out)


# ---------------------------------------------------------------------------
# BIFF8 reader
# ---------------------------------------------------------------------------
class _Blocks:
    """Byte cursor over SST+CONTINUE payloads implementing the BIFF8
    string-spanning rule: fixed fields read straight across block
    boundaries, char data re-reads an encoding flag byte when it
    crosses into a CONTINUE record."""

    def __init__(self, blocks: list[bytes]):
        self.blocks = blocks
        self.bi = 0
        self.off = 0

    def _advance_block(self) -> bool:
        while self.bi < len(self.blocks) and self.off >= len(self.blocks[self.bi]):
            self.bi += 1
            self.off = 0
        return self.bi < len(self.blocks)

    def read(self, k: int) -> bytes:
        out = bytearray()
        while k and self._advance_block():
            blk = self.blocks[self.bi]
            take = min(k, len(blk) - self.off)
            out += blk[self.off : self.off + take]
            self.off += take
            k -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        parts: list[str] = []
        while cch:
            if not self._advance_block():
                break
            blk = self.blocks[self.bi]
            if self.off == 0 and self.bi > 0:
                # char data entering a CONTINUE record always begins
                # with a fresh grbit byte — including when ZERO chars
                # were consumed yet (a string whose cch/flags header
                # ended exactly at the previous record's edge); gating
                # this on chars-already-read corrupts that layout
                high = bool(blk[0] & 1)
                self.off = 1
            w = 2 if high else 1
            avail = (len(blk) - self.off) // w
            n = min(cch, avail)
            raw = blk[self.off : self.off + n * w]
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            self.off += n * w
            cch -= n
            if cch and avail == n:
                # string continues in the next block
                self.bi += 1
                self.off = 0
        return "".join(parts)


def _parse_sst(blocks: list[bytes]) -> list[str]:
    cur = _Blocks(blocks)
    header = cur.read(8)
    n_unique = struct.unpack_from("<I", header, 4)[0]
    out: list[str] = []
    for _ in range(n_unique):
        head = cur.read(3)
        if len(head) < 3:
            break
        cch, flags = struct.unpack("<HB", head)
        c_run = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", cur.read(4))[0] if flags & 0x04 else 0
        out.append(cur.read_chars(cch, bool(flags & 0x01)))
        cur.read(c_run * 4 + cb_ext)  # rich-text runs / phonetic data
    return out


def _read_inline_string(payload: bytes, off: int) -> str:
    cch, flags = struct.unpack_from("<HB", payload, off)
    off += 3
    if flags & 0x08:
        off += 2
    if flags & 0x04:
        off += 4
    if flags & 0x01:
        return payload[off : off + 2 * cch].decode("utf-16-le")
    return payload[off : off + cch].decode("latin-1")


def _rk_value(v: int) -> float:
    if v & 2:  # 30-bit signed integer
        num = v >> 2
        if num & 0x20000000:
            num -= 0x40000000
        num = float(num)
    else:  # high 32 bits of an IEEE double
        num = struct.unpack("<d", b"\0\0\0\0" + struct.pack("<I", v & 0xFFFFFFFC))[0]
    return num / 100.0 if v & 1 else num


def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        if rid == 0:
            break  # zero padding past the last substream
        yield rid, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def _parse_sheet(stream: bytes, start: int, sst: list[str]) -> "pd.DataFrame":
    grid: dict[int, dict[int, object]] = {}
    pending_formula: tuple[int, int] | None = None

    def put(r: int, c: int, v: object) -> None:
        grid.setdefault(r, {})[c] = v

    began = False
    for rid, payload, _ in _records(stream, start):
        if rid == _BOF:
            if began:
                break
            began = True
        elif rid == _EOF:
            break
        elif rid == _LABELSST:
            r, c, _x, i = struct.unpack("<HHHI", payload[:10])
            put(r, c, sst[i] if i < len(sst) else "")
        elif rid in (_LABEL, _RSTRING):
            r, c = struct.unpack_from("<HH", payload)
            put(r, c, _read_inline_string(payload, 6))
        elif rid == _NUMBER:
            r, c, _x, num = struct.unpack("<HHHd", payload[:14])
            put(r, c, num)
        elif rid == _RK:
            r, c, _x, rk = struct.unpack("<HHHI", payload[:10])
            put(r, c, _rk_value(rk))
        elif rid == _MULRK:
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for i in range(n):
                (rk,) = struct.unpack_from("<I", payload, 4 + 6 * i + 2)
                put(r, c0 + i, _rk_value(rk))
        elif rid == _BOOLERR:
            r, c, _x, val, is_err = struct.unpack("<HHHBB", payload[:8])
            if not is_err:
                put(r, c, bool(val))
        elif rid in (_BLANK, _MULBLANK):
            (r,) = struct.unpack_from("<H", payload)
            grid.setdefault(r, {})  # row presence, no value
        elif rid == _FORMULA:
            r, c = struct.unpack_from("<HH", payload)
            res = payload[6:14]
            if res[6:8] == b"\xff\xff":
                kind = res[0]
                if kind == 0:  # cached string follows in a STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    put(r, c, bool(res[2]))
                elif kind == 3:
                    put(r, c, "")
            else:
                put(r, c, struct.unpack("<d", res)[0])
        elif rid == _STRING and pending_formula is not None:
            r, c = pending_formula
            put(r, c, _read_inline_string(payload + b"", 0))
            pending_formula = None
    if not grid:
        return pd.DataFrame()
    nrows = max(grid) + 1
    width = max((max(cols) + 1 for cols in grid.values() if cols), default=0)
    header = [grid.get(0, {}).get(c, f"col{c}") for c in range(width)]
    body = [[grid.get(r, {}).get(c) for c in range(width)] for r in range(1, nrows)]
    return pd.DataFrame(body, columns=[str(h) for h in header])


def read_sheets(data: bytes) -> dict[str, "pd.DataFrame"]:
    """Workbook ``.xls`` bytes -> {sheet_name: frame} (first row =
    header). Understands SST/inline strings, NUMBER/RK/MULRK numerics,
    booleans, and formulas' cached results."""
    stream = _cfb_read_stream(data, ("Workbook", "Book"))
    sst: list[str] = []
    bounds: list[tuple[str, int]] = []
    sst_blocks: list[bytes] | None = None
    for rid, payload, _pos in _records(stream):
        if rid == _BOF:
            # BIFF5/7 ('Book' streams from Excel 5.0/95) use different
            # string layouts — parsing them with BIFF8 rules would
            # silently garble text, so refuse with the version
            ver = struct.unpack_from("<H", payload)[0] if len(payload) >= 2 else 0
            if ver != 0x0600:
                raise NotImplementedError(
                    f"workbook BOF version {ver:#06x} is not BIFF8 (0x0600); "
                    "only BIFF8 .xls (Excel 97+) is supported — resave as "
                    ".xls (97-2003) or .xlsx"
                )
        if rid == _EOF:
            break
        if rid == _BOUNDSHEET:
            off = struct.unpack_from("<I", payload)[0]
            cch, flags = struct.unpack_from("<BB", payload, 6)
            raw = payload[8:]
            name = (
                raw[: 2 * cch].decode("utf-16-le")
                if flags & 1
                else raw[:cch].decode("latin-1")
            )
            bounds.append((name, off))
        elif rid == _SST:
            sst_blocks = [payload]
        elif rid == _CONTINUE and sst_blocks is not None:
            sst_blocks.append(payload)
        elif sst_blocks is not None and rid not in (_SST, _CONTINUE):
            sst = _parse_sst(sst_blocks)
            sst_blocks = None
    if sst_blocks is not None:
        sst = _parse_sst(sst_blocks)
    out: dict[str, pd.DataFrame] = {}
    for name, off in bounds:
        out[name] = _parse_sheet(stream, off, sst)
    return out


def sniff_xls(data: bytes) -> bool:
    """True when ``data`` is an OLE2 compound file (legacy .xls)."""
    return data[:8] == _CFB_SIG
