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


def _size_field(field: bytes) -> int:
    """Parse the 12-byte size field: octal, or GNU base-256.

    GNU tar writes sizes that overflow the 11-octal-digit field
    (> 8 GiB) as big-endian binary with the first byte's high bit
    set (0x80 marker) — foreign shards from gnu/bsdtar use this, so
    parsing it octal would raise a confusing ValueError (ADVICE r11).
    """
    if field[0] & 0x80:
        val = field[0] & 0x7F
        for b in field[1:]:
            val = (val << 8) | b
        return val
    return _octal(field)


def _pax_records(payload: bytes) -> dict[str, str]:
    """Parse PAX extended-header records: ``"<len> <key>=<value>\\n"``
    where ``<len>`` counts the WHOLE record including itself, the
    space, and the trailing newline (POSIX.1-2001 pax interchange)."""
    recs: dict[str, str] = {}
    pos = 0
    while pos < len(payload):
        sp = payload.find(b" ", pos)
        if sp < 0:
            raise ValueError("malformed PAX record (no length delimiter)")
        # pure ASCII digits only: int() would also accept '+3 0',
        # whitespace and '3_0' underscore separators (ADVICE r12)
        if not payload[pos:sp].isdigit():
            raise ValueError("malformed PAX record (non-digit length)")
        reclen = int(payload[pos:sp])
        rec = payload[pos : pos + reclen]
        if reclen <= sp - pos or len(rec) != reclen or not rec.endswith(b"\n"):
            raise ValueError("malformed PAX record (bad length or newline)")
        key, eq, value = rec[sp - pos + 1 : -1].partition(b"=")
        if not eq:
            raise ValueError("malformed PAX record (missing '=')")
        recs[key.decode("utf-8")] = value.decode("utf-8")
        pos += reclen
    return recs


def _pax_size(value: str) -> int:
    """Parse a PAX ``size`` record value: pure ASCII digits only.

    ``int()`` alone would accept a sign, surrounding whitespace, and
    underscore separators (ADVICE r13): a crafted global PAX header
    with ``size=-512`` cancels the header block so the offset never
    advances — an infinite generator on untrusted foreign shards —
    and a negative per-member override yields a phantom duplicate.
    """
    if not (value.isascii() and value.isdigit()):
        raise ValueError(f"malformed PAX size value {value!r}")
    return int(value)


def iter_tar_members(buf: bytes):
    """Yield ``(name, payload)`` for every regular file in ``buf``.

    Independent of the stdlib writer above: walks 512-byte header
    blocks per the POSIX ustar layout, verifies each header checksum
    (sum of header bytes with the chksum field read as spaces), and
    stops at the two-zero-block terminator.  Raises ValueError on a
    truncated archive or a checksum mismatch — a corrupt shard must
    fail loudly, not yield partial samples.

    Foreign-shard extensions (ADVICE r11 — archives written by
    gnu/bsdtar, not just our pinned-ustar writer):

    - PAX extended headers (typeflag ``x``: next member only;
      ``g``: global defaults) override ``path`` and ``size``;
    - GNU long-name records (typeflag ``L``) override the next
      member's name; long-linkname (``K``) records are consumed
      (links are not file payloads);
    - base-256 (0x80-marked binary) size fields parse per GNU tar.

    Precedence for the effective name matches pax(1): PAX ``x``
    path > GNU longname > PAX global path > ustar prefix+name.
    """
    off = 0
    n = len(buf)
    pax_global: dict[str, str] = {}
    pax_next: dict[str, str] = {}
    gnu_longname: str | None = None
    while off + _BLOCK <= n:
        header = buf[off : off + _BLOCK]
        if header == b"\x00" * _BLOCK:
            # terminator (second zero block may be truncated).  An
            # extension header with no following member is malformed
            # per POSIX — fail loudly instead of silently dropping the
            # pending override (ADVICE r12)
            if pax_next or gnu_longname is not None:
                raise ValueError(
                    "dangling PAX/GNU extension header at end of archive"
                )
            return
        stored = _octal(header[148:156])
        computed = sum(header[:148]) + 8 * ord(" ") + sum(header[156:])
        if stored != computed:
            raise ValueError(f"tar header checksum mismatch at offset {off}")
        size = _size_field(header[124:136])
        typeflag = header[156:157]
        name = header[:100].split(b"\x00", 1)[0].decode("utf-8")
        prefix = header[345:500].split(b"\x00", 1)[0].decode("utf-8")
        if prefix:
            name = prefix + "/" + name
        # a pending PAX size override binds to the NEXT member
        # regardless of its type (ADVICE r12): a non-regular member
        # whose pax size disagrees with its ustar field would
        # otherwise desync every later block offset.  Extension
        # records always size from their own header field — x/g (the
        # PAX headers themselves) AND GNU L/K long-name records
        # (ADVICE r13: per POSIX the pax override binds to the next
        # FILE; letting it resize a longname record desyncs every
        # later block offset).
        if typeflag not in (b"x", b"g", b"L", b"K"):
            if "size" in pax_next:
                size = _pax_size(pax_next["size"])
            elif "size" in pax_global:
                size = _pax_size(pax_global["size"])
        if typeflag in (b"0", b"\x00"):
            # name overrides stay regular-file-only: x beats GNU
            # longname beats g beats ustar prefix+name
            if "path" in pax_next:
                name = pax_next["path"]
            elif gnu_longname is not None:
                name = gnu_longname
            elif "path" in pax_global:
                name = pax_global["path"]
        data_start = off + _BLOCK
        data_end = data_start + size
        if data_end > n:
            raise ValueError(f"truncated tar member {name!r} ({size} bytes)")
        payload = buf[data_start:data_end]
        if typeflag in (b"0", b"\x00"):
            yield name, payload
            pax_next = {}
            gnu_longname = None
        elif typeflag == b"x":
            pax_next = _pax_records(payload)
        elif typeflag == b"g":
            pax_global.update(_pax_records(payload))
        elif typeflag == b"L":
            gnu_longname = payload.rstrip(b"\x00").decode("utf-8")
        elif typeflag == b"K":
            pass  # long linkname: consume, links carry no file payload
        else:
            # directories, links, devices, sparse, ...: skip the
            # payload but clear one-shot overrides (they bound to
            # this member per POSIX)
            pax_next = {}
            gnu_longname = None
        padded = (size + _BLOCK - 1) // _BLOCK * _BLOCK
        off = data_start + padded
    if off != n and buf[off:].strip(b"\x00"):
        raise ValueError("trailing garbage after last tar member")
    if pax_next or gnu_longname is not None:
        raise ValueError("dangling PAX/GNU extension header at end of archive")
