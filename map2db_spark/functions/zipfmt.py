"""ZIP archive packing and parsing — the other shard container
(HuggingFace datasets and many crawl dumps ship zip; WebDataset ships
tar — functions/tar.py).  Written against the public PKWARE APPNOTE
layout; DEFLATE members decode through the engine's own RFC 1951
codec (functions/deflate_codec.py), so a zip shard exercises the same
from-scratch inflate the PNG/gzip paths use.

Layout walked by the reader (the CORRECT way — via the central
directory, not by scanning local headers, which misreads archives
with stale/overwritten entries):

- End of central directory (EOCD): sig 0x06054b50, entry counts,
  central-directory size + offset, comment.
- Central directory entry: sig 0x02014b50, method, crc32, compressed
  + uncompressed sizes, name, local-header offset.
- Local file header: sig 0x04034b50, then name/extra to skip, then
  the member bytes.

The reference (map2db.py) has no archive surface; this is the
training-data-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib

from map2db_spark.functions.deflate_codec import deflate, inflate

_LOCAL_SIG = 0x04034B50
_CDIR_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50

_STORED = 0
_DEFLATED = 8


def build_zip(members: list[tuple[str, bytes]], method: str = "deflate") -> bytes:
    """Pack ``(name, payload)`` members into deterministic zip bytes
    (zeroed DOS timestamps, no extra fields).  method: 'stored' |
    'deflate' (the engine's own RFC 1951 encoder)."""
    m = _DEFLATED if method == "deflate" else _STORED
    out = bytearray()
    cdir = bytearray()
    for name, payload in members:
        nb = name.encode("utf-8")
        data = deflate(payload, mode="dynamic") if m == _DEFLATED else payload
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        offset = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH",
            _LOCAL_SIG, 20, 0, m, 0, 0, crc, len(data), len(payload),
            len(nb), 0,
        )
        out += nb
        out += data
        cdir += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _CDIR_SIG, 20, 20, 0, m, 0, 0, crc, len(data), len(payload),
            len(nb), 0, 0, 0, 0, 0, offset,
        )
        cdir += nb
    cd_offset = len(out)
    out += cdir
    out += struct.pack(
        "<IHHHHIIH",
        _EOCD_SIG, 0, 0, len(members), len(members), len(cdir), cd_offset, 0,
    )
    return bytes(out)


def _find_eocd(buf: bytes) -> tuple[int, int, int]:
    """Locate the EOCD record (scanning back over a possible comment)
    and return (n_entries, cdir_size, cdir_offset)."""
    lo = max(0, len(buf) - 65536 - 22)
    for pos in range(len(buf) - 22, lo - 1, -1):
        if struct.unpack_from("<I", buf, pos)[0] == _EOCD_SIG:
            (_, _, _, _, n, cd_size, cd_off, _) = struct.unpack_from(
                "<IHHHHIIH", buf, pos
            )
            return n, cd_size, cd_off
    raise ValueError("zip: end-of-central-directory record not found")


def iter_zip_members(buf: bytes, max_member_size: int | None = None):
    """Yield ``(name, payload)`` for every member, via the central
    directory.  Stored and deflated members are supported; every
    payload is CRC32- and size-verified (a corrupt shard fails
    loudly).  ``max_member_size`` is the zip-bomb rail — the declared
    AND actual inflated size must stay under it."""
    n, cd_size, cd_off = _find_eocd(buf)
    pos = cd_off
    for _ in range(n):
        if struct.unpack_from("<I", buf, pos)[0] != _CDIR_SIG:
            raise ValueError(f"zip: bad central-directory entry at {pos}")
        (
            _, _, _, _, method, _, _, crc, csize, usize,
            nlen, elen, clen, _, _, _, local_off,
        ) = struct.unpack_from("<IHHHHHHIIIHHHHHII", buf, pos)
        name = buf[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + elen + clen
        if max_member_size is not None and usize > max_member_size:
            raise ValueError(
                f"zip: member {name!r} declares {usize} bytes"
                f" > max_member_size={max_member_size}"
            )
        if struct.unpack_from("<I", buf, local_off)[0] != _LOCAL_SIG:
            raise ValueError(f"zip: bad local header for {name!r}")
        l_nlen, l_elen = struct.unpack_from("<HH", buf, local_off + 26)
        data_start = local_off + 30 + l_nlen + l_elen
        data = buf[data_start : data_start + csize]
        if len(data) != csize:
            raise ValueError(f"zip: truncated member {name!r}")
        if method == _STORED:
            payload = data
        elif method == _DEFLATED:
            payload = inflate(data, max_output=max_member_size or usize)
        else:
            raise ValueError(f"zip: unsupported method {method} for {name!r}")
        if len(payload) != usize:
            raise ValueError(
                f"zip: member {name!r} inflated to {len(payload)},"
                f" header says {usize}"
            )
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: CRC mismatch for member {name!r}")
        yield name, payload
