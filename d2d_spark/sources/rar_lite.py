"""Minimal self-contained RAR member reader — STORED entries only.

The reference extracts rar archives through the ``rarfile`` package +
an unrar binary (d22d/utils/rarutils.py); neither exists in this
sandbox, and RAR *compression* is proprietary — but the container
FORMAT is documented, and method-0 ("store") members are raw bytes.
This module parses both archive generations:

  RAR5 — 8-byte signature, vint-encoded block headers (CRC32,
    type/flags, per-file compression info, UTF-8 names).
  RAR4 — 7-byte signature, fixed little-endian block headers
    (type 0x74 file blocks, method 0x30 = store).

Stored members return their exact bytes; a compressed member raises
``NotImplementedError`` naming the ``rarfile`` escape hatch — the
same honest gate the Excel connector used before ``xlsx_lite``.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

_SIG_RAR5 = b"Rar!\x1a\x07\x01\x00"
_SIG_RAR4 = b"Rar!\x1a\x07\x00"

#: accepts a member name; False skips the member BEFORE its
#: compression method is checked (so one compressed member of an
#: unwanted type cannot fail an archive whose wanted members are all
#: stored)
NameFilter = Callable[[str], bool]


def _vint(data: bytes, pos: int) -> tuple[int, int]:
    value, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7


def _members_rar5(data: bytes, want: NameFilter) -> Iterator[tuple[str, bytes]]:
    pos = len(_SIG_RAR5)
    while pos + 7 <= len(data):
        # block: crc32 u32, header_size vint, header bytes, data area
        hdr_size, hdr_start = _vint(data, pos + 4)
        hdr_end = hdr_start + hdr_size
        hdr = data[hdr_start:hdr_end]
        p = 0
        btype, p = _vint(hdr, p)
        flags, p = _vint(hdr, p)
        if flags & 0x01:
            _extra, p = _vint(hdr, p)
        data_size = 0
        if flags & 0x02:
            data_size, p = _vint(hdr, p)
        if btype == 5:  # end of archive
            return
        if btype == 2:  # file header
            file_flags, p = _vint(hdr, p)
            unp_size, p = _vint(hdr, p)
            _attrs, p = _vint(hdr, p)
            if file_flags & 0x02:
                p += 4  # mtime
            if file_flags & 0x04:
                p += 4  # data crc
            comp, p = _vint(hdr, p)
            _host, p = _vint(hdr, p)
            name_len, p = _vint(hdr, p)
            name = hdr[p : p + name_len].decode("utf-8", "replace")
            is_dir = bool(file_flags & 0x01)
            method = (comp >> 7) & 0x07
            if not is_dir and want(name):
                payload = data[hdr_end : hdr_end + data_size]
                if method != 0:
                    raise NotImplementedError(
                        f"rar member {name!r} uses compression method {method}; "
                        "only stored (method 0) members decode without the "
                        "'rarfile' package + unrar backend"
                    )
                if len(payload) != unp_size:
                    raise ValueError(
                        f"rar member {name!r}: stored size {len(payload)} != "
                        f"declared {unp_size} (truncated archive?)"
                    )
                yield name, payload
        pos = hdr_end + data_size


def _members_rar4(data: bytes, want: NameFilter) -> Iterator[tuple[str, bytes]]:
    pos = len(_SIG_RAR4)
    while pos + 7 <= len(data):
        _crc, btype, flags, size = struct.unpack_from("<HBHH", data, pos)
        if size < 7:
            # a zero/short header size would stall the walk forever
            raise ValueError(
                f"corrupt RAR4 archive: block at offset {pos} declares "
                f"header size {size} (< 7)"
            )
        add_size = 0
        if btype == 0x74:
            pack_size, unp_size, _host, _crc32, _ftime, _ver, method, name_size, _attr = (
                struct.unpack_from("<IIBIIBBHI", data, pos + 7)
            )
            add_size = pack_size
            name_off = pos + 7 + 25
            if flags & 0x100:  # 64-bit sizes
                high_pack, high_unp = struct.unpack_from("<II", data, name_off)
                add_size |= high_pack << 32
                unp_size |= high_unp << 32
                name_off += 8
            name = data[name_off : name_off + name_size].decode("utf-8", "replace")
            is_dir = (flags & 0xE0) == 0xE0
            if not is_dir and want(name):
                payload = data[pos + size : pos + size + add_size]
                if method != 0x30:
                    raise NotImplementedError(
                        f"rar member {name!r} uses compression method "
                        f"{method:#x}; only stored (0x30) members decode "
                        "without the 'rarfile' package + unrar backend"
                    )
                if len(payload) != unp_size:
                    raise ValueError(
                        f"rar member {name!r}: stored size {len(payload)} != "
                        f"declared {unp_size} (truncated archive?)"
                    )
                yield name, payload
        elif flags & 0x8000:
            (add_size,) = struct.unpack_from("<I", data, pos + 7)
        if btype == 0x7B:  # end of archive
            return
        pos += size + add_size


def rar_members(
    data: bytes, want: NameFilter | None = None
) -> Iterator[tuple[str, bytes]]:
    """Yield ``(member_name, raw_bytes)`` for every stored file in a
    RAR4 or RAR5 archive whose name passes ``want`` (default: all).
    A WANTED compressed member raises; unwanted members are skipped
    before their method is inspected."""
    want = want or (lambda _name: True)
    if data[: len(_SIG_RAR5)] == _SIG_RAR5:
        yield from _members_rar5(data, want)
    elif data[: len(_SIG_RAR4)] == _SIG_RAR4:
        yield from _members_rar4(data, want)
    else:
        raise ValueError("not a RAR archive (bad signature)")
