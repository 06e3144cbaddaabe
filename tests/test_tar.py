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
