"""ustar shard packing/parsing (functions/tar.py): the from-scratch
parser is pinned against the stdlib tarfile implementation in BOTH
directions, plus corruption/truncation failure modes."""

from __future__ import annotations

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.tar import build_tar, iter_tar_members


def _stdlib_parse(buf: bytes) -> list[tuple[str, bytes]]:
    out = []
    with tarfile.open(fileobj=io.BytesIO(buf)) as tf:
        for m in tf.getmembers():
            if m.isfile():
                out.append((m.name, tf.extractfile(m).read()))
    return out


def test_roundtrip_and_stdlib_parity():
    members = [
        ("00000001.txt", b"hello world"),
        ("00000002.txt", b""),  # empty member: zero data blocks
        ("sub/00000003.bin", bytes(range(256)) * 3),  # 768 B: padding
        ("exact.bin", b"x" * 512),  # exactly one block: no padding
    ]
    buf = build_tar(members)
    assert list(iter_tar_members(buf)) == members
    assert _stdlib_parse(buf) == members
    # determinism: same members -> byte-identical archive
    assert build_tar(members) == buf


def test_parses_archives_written_by_stdlib_defaults():
    # archives written by OTHER writers (gnu default mtimes/uids) must
    # parse too — the reader is for foreign shards, not just our own
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tf:
        info = tarfile.TarInfo(name="a.txt")
        payload = b"foreign writer"
        info.size = len(payload)
        info.mtime = 1700000000
        info.uid, info.gid = 1000, 1000
        tf.addfile(info, io.BytesIO(payload))
    assert list(iter_tar_members(out.getvalue())) == [("a.txt", payload)]


def test_checksum_corruption_raises():
    buf = bytearray(build_tar([("a.txt", b"payload")]))
    buf[0] ^= 0xFF  # corrupt first byte of the name field
    with pytest.raises(ValueError, match="checksum"):
        list(iter_tar_members(bytes(buf)))


def test_truncated_member_raises():
    buf = build_tar([("a.txt", b"p" * 1000)])
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tar_members(buf[: 512 + 100]))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99999999),
            st.binary(max_size=2000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_property_roundtrip(items):
    members = [(f"{k:08d}.bin", payload) for k, payload in items]
    buf = build_tar(members)
    assert list(iter_tar_members(buf)) == members
    assert _stdlib_parse(buf) == members


# ---------------------------------------------------------------------------
# Foreign-shard extensions (ADVICE r11): PAX x/g, GNU longname, base-256
# ---------------------------------------------------------------------------

_LONG = "shards/" + "d" * 120 + "/sample-00000042.json"  # > 100 chars


def _foreign(fmt, members):
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=fmt) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return out.getvalue()


def test_pax_long_name_resolves():
    # PAX format stores >100-char names in an 'x' extended header
    # whose `path` record must override the truncated ustar name
    members = [("a.txt", b"one"), (_LONG, b"two"), ("z.txt", b"three")]
    buf = _foreign(tarfile.PAX_FORMAT, members)
    assert list(iter_tar_members(buf)) == members


def test_gnu_long_name_resolves():
    # GNU format stores the long name in a typeflag-L pseudo-member
    members = [(_LONG, b"payload"), ("short.txt", b"after")]
    buf = _foreign(tarfile.GNU_FORMAT, members)
    assert list(iter_tar_members(buf)) == members


def _raw_header(name: bytes, size_field: bytes, typeflag: bytes) -> bytes:
    h = bytearray(512)
    h[0 : len(name)] = name
    h[100:108] = b"0000644\x00"
    h[108:116] = h[116:124] = b"0000000\x00"
    h[124:136] = size_field
    h[136:148] = b"00000000000\x00"
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(h)


def test_base256_size_field_parses():
    # GNU base-256 size: high bit set on the first byte, big-endian
    # binary in the remaining bytes (used for > 8 GiB members; valid
    # for any size)
    payload = b"q" * 700
    size_field = bytes([0x80]) + len(payload).to_bytes(11, "big")
    buf = (
        _raw_header(b"big.bin", size_field, b"0")
        + payload
        + b"\x00" * (1024 - 700)  # pad to block + room
        + b"\x00" * 1024
    )
    assert list(iter_tar_members(buf)) == [("big.bin", payload)]


def test_pax_global_path_applies_and_x_overrides():
    from map2db_spark.functions.tar import _pax_records

    rec = b"30 path=override/from-pax.bin\n"
    assert len(rec) == 30
    assert _pax_records(rec) == {"path": "override/from-pax.bin"}
    # malformed: length field lying about the record span
    with pytest.raises(ValueError, match="PAX"):
        _pax_records(b"99 path=x\n")


def test_linkname_K_and_symlinks_skipped():
    # symlinks must not be yielded as file payloads, and a GNU 'K'
    # long-linkname record must be consumed silently
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=tarfile.GNU_FORMAT) as tf:
        link = tarfile.TarInfo(name="lnk")
        link.type = tarfile.SYMTYPE
        link.linkname = "t/" + "x" * 120  # forces a 'K' record
        tf.addfile(link)
        info = tarfile.TarInfo(name="real.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"data"))
    assert list(iter_tar_members(out.getvalue())) == [("real.txt", b"data")]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99999999),
            st.binary(max_size=1500),
            st.integers(min_value=0, max_value=140),  # name padding
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([tarfile.USTAR_FORMAT, tarfile.GNU_FORMAT, tarfile.PAX_FORMAT]),
)
def test_property_foreign_writer_roundtrip(items, fmt):
    """Archives from ALL THREE stdlib writer formats parse identically,
    including names past the 100-char ustar field (GNU 'L' records /
    PAX 'path' overrides) — ustar format caps names at 100+prefix, so
    long names are only generated for the extension-capable formats."""
    cap = 90 if fmt == tarfile.USTAR_FORMAT else 140
    members = [
        (f"{'n' * min(pad, cap)}/{k:08d}.bin", payload)
        for k, payload, pad in items
    ]
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w", format=fmt) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    assert list(iter_tar_members(out.getvalue())) == members


# --- ADVICE r12 fixes ----------------------------------------------------


def _pax_rec(key: str, value: str) -> bytes:
    body = f" {key}={value}\n"
    n = len(body) + 1
    while len(str(n)) + len(body) != n:
        n = len(str(n)) + len(body)
    return f"{n}{body}".encode()


def test_pax_size_override_binds_to_non_regular_members():
    # a writer that records a non-regular member's true on-disk payload
    # length ONLY in the pax 'x' size (ustar field says 0) — using the
    # ustar size would desync every later offset (ADVICE r12)
    pax = _pax_rec("size", "512")
    junk = b"J" * 512  # the non-regular member's actual payload span
    after = b"tail file payload"
    buf = (
        _raw_header(b"weird-meta", f"{len(pax):011o}\x00".encode(), b"x")
        + pax + b"\x00" * ((512 - len(pax) % 512) % 512)
        + _raw_header(b"strange-dir/", b"00000000000\x00", b"5")
        + junk
        + _raw_header(b"after.txt", f"{len(after):011o}\x00".encode(), b"0")
        + after + b"\x00" * ((512 - len(after) % 512) % 512)
        + b"\x00" * 1024
    )
    assert list(iter_tar_members(buf)) == [("after.txt", after)]


def test_pax_length_must_be_pure_digits():
    from map2db_spark.functions.tar import _pax_records

    # int(b'3_0') == 30 and int(b'+30 ') == 30: both must be rejected
    with pytest.raises(ValueError, match="non-digit length"):
        _pax_records(b"3_0 path=" + b"x" * 18 + b"\n")
    with pytest.raises(ValueError, match="non-digit length"):
        _pax_records(b"+30 path=" + b"x" * 19 + b"\n")


def test_dangling_extension_header_raises():
    pax = _pax_rec("path", "never/bound.txt")
    buf = (
        _raw_header(b"dangling", f"{len(pax):011o}\x00".encode(), b"x")
        + pax + b"\x00" * ((512 - len(pax) % 512) % 512)
        + b"\x00" * 1024  # terminator with the override still pending
    )
    with pytest.raises(ValueError, match="dangling"):
        list(iter_tar_members(buf))


def test_negative_pax_size_rejected():
    # ADVICE r13: int('-512') is accepted by int() — a global PAX
    # size=-512 cancels the header block (padded = -512) so the offset
    # never advances: an infinite generator on untrusted shards.  A
    # negative pax_next size yields a phantom duplicate member.  Both
    # must raise instead.
    body = b"after"
    tail = (
        _raw_header(b"after.txt", f"{len(body):011o}\x00".encode(), b"0")
        + body + b"\x00" * ((512 - len(body) % 512) % 512)
        + b"\x00" * 1024
    )
    for typeflag in (b"g", b"x"):
        pax = _pax_rec("size", "-512")
        buf = (
            _raw_header(b"meta", f"{len(pax):011o}\x00".encode(), typeflag)
            + pax + b"\x00" * ((512 - len(pax) % 512) % 512)
            + tail
        )
        with pytest.raises(ValueError, match="malformed PAX size"):
            list(iter_tar_members(buf))


def test_pax_size_must_be_pure_ascii_digits():
    from map2db_spark.functions.tar import _pax_size

    # int() would accept all of these
    for bad in ("-512", "+512", " 512", "5_12", "٥١٢"):
        with pytest.raises(ValueError, match="malformed PAX size"):
            _pax_size(bad)
    assert _pax_size("512") == 512


def test_pax_size_override_skips_gnu_longname_records():
    # ADVICE r13: a pending pax size override must NOT resize a GNU
    # L/K extension record — per POSIX it binds to the next FILE, and
    # extension records size from their own header field.  Overriding
    # the L record's length would desync every later block offset.
    longname = b"very/long/override-name.txt"
    body = b"payload sized by pax"  # 20 bytes; ustar field lies (0)
    pax = _pax_rec("size", str(len(body)))
    buf = (
        _raw_header(b"meta", f"{len(pax):011o}\x00".encode(), b"x")
        + pax + b"\x00" * ((512 - len(pax) % 512) % 512)
        + _raw_header(b"gnu-long", f"{len(longname):011o}\x00".encode(), b"L")
        + longname + b"\x00" * ((512 - len(longname) % 512) % 512)
        + _raw_header(b"short", b"00000000000\x00", b"0")
        + body + b"\x00" * ((512 - len(body) % 512) % 512)
        + b"\x00" * 1024
    )
    assert list(iter_tar_members(buf)) == [
        (longname.decode(), body)
    ]
