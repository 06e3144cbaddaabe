"""ZIP shard packing/parsing (functions/zipfmt.py): pinned against
the stdlib zipfile implementation in both directions, both methods,
plus corruption and zip-bomb failure modes."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.zipfmt import build_zip, iter_zip_members


def _stdlib_parse(buf: bytes) -> list[tuple[str, bytes]]:
    out = []
    with zipfile.ZipFile(io.BytesIO(buf)) as zf:
        for info in zf.infolist():
            out.append((info.filename, zf.read(info)))
    return out


def _stdlib_build(members, compress) -> bytes:
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", compression=compress) as zf:
        for name, payload in members:
            zf.writestr(name, payload)
    return out.getvalue()


_MEMBERS = [
    ("00000001.txt", b"hello zip world" * 10),
    ("00000002.txt", b""),
    ("sub/00000003.bin", bytes(range(256)) * 4),
]


@pytest.mark.parametrize("method", ["stored", "deflate"])
def test_roundtrip_and_stdlib_reads_ours(method):
    buf = build_zip(_MEMBERS, method=method)
    assert list(iter_zip_members(buf)) == _MEMBERS
    # the stdlib (an independent implementation incl. its own
    # inflate) accepts our archives byte-for-byte
    assert _stdlib_parse(buf) == _MEMBERS
    assert build_zip(_MEMBERS, method=method) == buf  # deterministic


@pytest.mark.parametrize(
    "compress", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED]
)
def test_we_read_stdlib_archives(compress):
    buf = _stdlib_build(_MEMBERS, compress)
    assert list(iter_zip_members(buf)) == _MEMBERS


def test_crc_corruption_raises():
    buf = bytearray(build_zip(_MEMBERS, method="stored"))
    # flip a payload byte of the first member (after its 30+12-byte
    # local header + name)
    buf[30 + len("00000001.txt") + 3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(iter_zip_members(bytes(buf)))


def test_zip_bomb_rail():
    big = b"\x00" * 200_000  # highly compressible
    buf = build_zip([("bomb.bin", big)], method="deflate")
    with pytest.raises(ValueError, match="max_member_size"):
        list(iter_zip_members(buf, max_member_size=100_000))
    # and the honest size passes
    assert list(iter_zip_members(buf, max_member_size=300_000)) == [
        ("bomb.bin", big)
    ]


def test_missing_eocd_raises():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        list(iter_zip_members(b"not a zip archive"))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99999999),
            st.binary(max_size=3000),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["stored", "deflate"]),
)
def test_property_roundtrip(items, method):
    members = [(f"{k:08d}.bin", payload) for k, payload in items]
    buf = build_zip(members, method=method)
    assert list(iter_zip_members(buf)) == members
    assert _stdlib_parse(buf) == members


# --- native-first inflate dispatch (VERDICT r12 #3) ---------------------


def test_native_route_carries_the_bulk_with_sampled_cross_checks():
    from map2db_spark.functions import zipfmt

    members = [(f"{i:08d}.txt", f"payload {i} ".encode() * 20)
               for i in range(130)]
    buf = build_zip(members, method="deflate")
    got = list(iter_zip_members(buf, cross_check_every=64))
    assert got == members
    stats = zipfmt.last_inflate_stats
    # every deflated member inflates through stdlib zlib ...
    assert stats["native"] == 130
    assert stats["fallback"] == 0
    # ... and exactly the 64-stride sample re-runs the from-scratch
    # decoder as certification (members 0, 64, 128)
    assert stats["cross_checked"] == 3


def test_native_bomb_rail_never_materialises_past_the_cap():
    # the declared-size check fires first on an honest header, so lie
    # about usize to prove the NATIVE rail binds on its own: patch the
    # central-directory usize of a 200k member down to 50k
    import struct

    big = b"\x00" * 200_000
    buf = bytearray(build_zip([("bomb.bin", big)], method="deflate"))
    cd_off = len(buf) - 22 - 46 - len("bomb.bin")
    assert struct.unpack_from("<I", buf, cd_off)[0] == 0x02014B50
    struct.pack_into("<I", buf, cd_off + 24, 50_000)  # usize field
    with pytest.raises(ValueError, match="max_output|inflated to"):
        list(iter_zip_members(bytes(buf), max_member_size=50_000))


def test_malformed_member_falls_back_to_the_pure_decoder_error():
    from map2db_spark.functions import zipfmt

    payload = b"some deflated text " * 50
    buf = bytearray(build_zip([("a.txt", payload)], method="deflate"))
    # corrupt the deflate stream head (bad block type / code lengths):
    # both decoders must reject it, and the PURE decoder's typed error
    # is the one surfaced
    data_start = 30 + len("a.txt")
    buf[data_start] = 0xFF
    buf[data_start + 1] = 0xFF
    with pytest.raises(ValueError):
        list(iter_zip_members(bytes(buf)))
    # stdlib zipfile agrees the member is broken (sanity)
    import zlib as _zlib

    with pytest.raises(_zlib.error):
        _zlib.decompress(bytes(buf[data_start:data_start + 20]), -15)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=5000))
def test_property_native_and_pure_inflate_agree(payload):
    # the certification claim behind the native-first dispatch: for any
    # stream our encoder emits, stdlib zlib and the from-scratch RFC
    # 1951 decoder produce identical bytes
    from map2db_spark.functions.deflate_codec import deflate, inflate
    from map2db_spark.functions.zipfmt import _inflate_native

    data = deflate(payload, mode="dynamic")
    assert _inflate_native(data, len(payload), len(payload)) == payload
    assert inflate(data, max_output=len(payload)) == payload


def test_truncated_deflate_stream_rejected_on_every_member():
    # ADVICE r13: zlib returns partial output for a truncated stream
    # WITHOUT raising (d.eof stays False).  A crafted central directory
    # whose usize/CRC match the truncated prefix was accepted on
    # non-sampled members but rejected by the pure decoder whenever
    # member_idx % 64 == 0 — position-dependent acceptance contradicts
    # the native/pure certification contract.  Both positions must
    # reject now.
    import struct
    import zlib as _zlib

    from map2db_spark.functions.zipfmt import (
        _CDIR_SIG, _EOCD_SIG, _LOCAL_SIG, _DEFLATED,
    )

    payload = b"the quick brown fox jumps over the lazy dog " * 20
    full = _zlib.compressobj(9, _zlib.DEFLATED, -15).compress(payload)
    truncated = full[: len(full) // 2] or full[:1]
    d = _zlib.decompressobj(-15)
    partial = d.decompress(truncated)
    assert not d.eof  # the premise: zlib accepts the prefix silently

    def crafted(members):
        out, cdir = bytearray(), bytearray()
        for name, data, usize, crc in members:
            nb = name.encode()
            off = len(out)
            out += struct.pack(
                "<IHHHHHIIIHH", _LOCAL_SIG, 20, 0, _DEFLATED, 0, 0,
                crc, len(data), usize, len(nb), 0,
            ) + nb + data
            cdir += struct.pack(
                "<IHHHHHHIIIHHHHHII", _CDIR_SIG, 20, 20, 0, _DEFLATED,
                0, 0, crc, len(data), usize, len(nb), 0, 0, 0, 0, 0, off,
            ) + nb
        cd_off = len(out)
        out += cdir + struct.pack(
            "<IHHHHIIH", _EOCD_SIG, 0, 0, len(members), len(members),
            len(cdir), cd_off, 0,
        )
        return bytes(out)

    crc = _zlib.crc32(partial) & 0xFFFFFFFF
    ok = _zlib.compressobj(9, _zlib.DEFLATED, -15)
    good = ok.compress(b"fine") + ok.flush()
    lie = ("lie.txt", truncated, len(partial), crc)
    # member_idx 0: the cross-checked position
    with pytest.raises(ValueError, match="truncated"):
        list(iter_zip_members(crafted([lie])))
    # member_idx 1: the previously-accepting non-sampled position
    buf = crafted(
        [("ok.txt", good, 4, _zlib.crc32(b"fine") & 0xFFFFFFFF), lie]
    )
    with pytest.raises(ValueError, match="truncated"):
        list(iter_zip_members(buf))
