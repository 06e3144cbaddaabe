"""POSIX ustar (tar) shard packing and parsing — the WebDataset
container format for training shards.

WebDataset packs a training corpus into plain tar archives (members
named ``<key>.<ext>``) so a loader can stream samples sequentially
with zero random I/O.  This module provides both directions:

- ``build_tar(members)`` — deterministic archive bytes (fixed mtime,
  uid/gid 0, sorted order left to the caller) via the stdlib
  ``tarfile`` writer, so the reader below is checked against an
  INDEPENDENT implementation;
- ``iter_tar_members(buf)`` — a from-scratch ustar parser written
  against the public POSIX.1-1988 layout (512-byte header blocks:
  name[100] mode[8] uid[8] gid[8] size[12 octal] mtime[12]
  chksum[8] typeflag[1] linkname[100] magic[6] version[2] ...),
  data rounded up to 512-byte blocks, archive terminated by two
  zero blocks.

The reference (map2db.py) has no archive surface; this is the
training-data-pipeline extension the round-10 shard MANIFEST writer
(queries_round10.c_shard_shuffle_manifest) pairs with: the manifest
describes shards, this module reads and writes them.
"""

from __future__ import annotations

import io
import tarfile

_BLOCK = 512


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Pack ``(name, payload)`` members into deterministic tar bytes.

    Metadata is pinned (mtime=0, uid=gid=0, mode 0644) so the same
    member list always yields byte-identical archives — shard files
    must be reproducible for the manifest's content signature to
    mean anything.
    """
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return out.getvalue()


def _octal(field: bytes) -> int:
    """Parse a NUL/space-terminated octal header field."""
    s = field.split(b"\x00", 1)[0].strip()
    return int(s, 8) if s else 0


def iter_tar_members(buf: bytes):
    """Yield ``(name, payload)`` for every regular file in ``buf``.

    Independent of the stdlib writer above: walks 512-byte header
    blocks per the POSIX ustar layout, verifies each header checksum
    (sum of header bytes with the chksum field read as spaces), and
    stops at the two-zero-block terminator.  Raises ValueError on a
    truncated archive or a checksum mismatch — a corrupt shard must
    fail loudly, not yield partial samples.
    """
    off = 0
    n = len(buf)
    while off + _BLOCK <= n:
        header = buf[off : off + _BLOCK]
        if header == b"\x00" * _BLOCK:
            return  # terminator (second zero block may be truncated)
        stored = _octal(header[148:156])
        computed = sum(header[:148]) + 8 * ord(" ") + sum(header[156:])
        if stored != computed:
            raise ValueError(f"tar header checksum mismatch at offset {off}")
        size = _octal(header[124:136])
        typeflag = header[156:157]
        name = header[:100].split(b"\x00", 1)[0].decode("utf-8")
        prefix = header[345:500].split(b"\x00", 1)[0].decode("utf-8")
        if prefix:
            name = prefix + "/" + name
        data_start = off + _BLOCK
        data_end = data_start + size
        if data_end > n:
            raise ValueError(f"truncated tar member {name!r} ({size} bytes)")
        if typeflag in (b"0", b"\x00"):
            yield name, buf[data_start:data_end]
        padded = (size + _BLOCK - 1) // _BLOCK * _BLOCK
        off = data_start + padded
    if off != n and buf[off:].strip(b"\x00"):
        raise ValueError("trailing garbage after last tar member")
