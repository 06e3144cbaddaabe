"""Stdlib JPEG marker-walker tests (functions/jpeg.py): the real
metadata-decode slot behind the multimodal media column — frame
geometry without pixel decode."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from map2db_spark.functions.jpeg import (
    JpegError,
    encode_jpeg_shell,
    parse_jpeg_header,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=0xFFFF),
    h=st.integers(min_value=1, max_value=0xFFFF),
    nc=st.sampled_from([1, 3, 4]),
)
def test_shell_roundtrip_property(w, h, nc):
    hdr = parse_jpeg_header(encode_jpeg_shell(w, h, nc))
    assert (hdr["width"], hdr["height"], hdr["ncomp"]) == (w, h, nc)
    assert hdr["precision"] == 8
    assert not hdr["progressive"]


def test_bad_magic_rejected():
    with pytest.raises(JpegError, match="magic"):
        parse_jpeg_header(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(JpegError):
        parse_jpeg_header(b"")


def test_truncated_segment_rejected():
    buf = encode_jpeg_shell(32, 16, 3)
    with pytest.raises(JpegError):
        parse_jpeg_header(buf[:10])


def test_missing_sof_rejected():
    # SOI + APP0 + EOI, never a frame header
    app0 = struct.pack(">BBH", 0xFF, 0xE0, 7) + b"JFIF\x00"
    with pytest.raises(JpegError, match="SOF"):
        parse_jpeg_header(b"\xff\xd8" + app0 + b"\xff\xd9")


def test_fill_bytes_before_marker_accepted():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    buf = encode_jpeg_shell(48, 24, 1)
    assert buf[:2] == b"\xff\xd8"
    padded = buf[:2] + b"\xff\xff\xff" + buf[2:]
    hdr = parse_jpeg_header(padded)
    assert (hdr["width"], hdr["height"]) == (48, 24)


def test_progressive_sof2_detected():
    buf = bytearray(encode_jpeg_shell(20, 10, 3))
    # rewrite the SOF0 marker byte (FF C0) to SOF2 (FF C2)
    i = buf.find(b"\xff\xc0")
    assert i > 0
    buf[i + 1] = 0xC2
    hdr = parse_jpeg_header(bytes(buf))
    assert hdr["progressive"] and hdr["width"] == 20


def test_segment_count_matches_shell_layout():
    # APP0, COM, DQT, SOF0, DHT, SOS = 6 segments before entropy data
    assert parse_jpeg_header(encode_jpeg_shell(8, 8, 1))["n_segments"] == 6


# ---------------------------------------------------------------------------
# Real baseline codec (functions/jpeg_codec.py): encode + pixel decode
# ---------------------------------------------------------------------------

import numpy as np

from map2db_spark.functions.jpeg_codec import (
    FIXTURE_QTABLE,
    build_huffman,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _const_block_img(seed: int, bh: int, bw: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (bh, bw))
    return np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_jpeg_codec_constant_blocks_bit_exact_gray():
    """Constant 8x8 blocks carry only DC; with DC quantizer 8 the
    whole pipeline is exact integer arithmetic in float64, so the
    REAL Huffman-coded stream round-trips bit-exactly."""
    img = _const_block_img(7, 3, 4)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert np.array_equal(dec, img)


def test_jpeg_codec_constant_blocks_bit_exact_rgb():
    """Gray-valued RGB: the BT.601 YCbCr forward/backward coefficients
    sum to 1/0, so constant gray blocks survive the 3-component path
    bit-exactly too (Cb=Cr=128 everywhere)."""
    img = _const_block_img(11, 2, 3)
    rgb = np.stack([img, img, img], axis=-1)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(rgb))
    assert np.array_equal(dec, rgb)


def test_jpeg_progressive_constant_blocks_bit_exact():
    """Spectral-selection progressive: same constant-block exactness
    argument as baseline (DC quantizer 8, AC all zero -> the AC band
    scans are pure EOBn runs), so the SOF2 stream round-trips
    bit-exactly through the DC-interleaved + per-band AC decode."""
    img = _const_block_img(7, 3, 4)
    dec = decode_jpeg_baseline(encode_jpeg_progressive(img))
    assert np.array_equal(dec, img)
    rgb = np.stack([img, img, img], axis=-1)
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_progressive(rgb)), rgb
    )


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_jpeg_progressive_decode_matches_baseline(seed):
    """Arbitrary content: the progressive scan structure transmits the
    SAME quantized coefficients as baseline, so decode(progressive) ==
    decode(baseline) pixel-for-pixel — this pins the EOBn run
    bookkeeping and the band walk against the known-good baseline
    entropy path (including non-multiple-of-8 dims)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    d_prog = decode_jpeg_baseline(encode_jpeg_progressive(img))
    d_base = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert np.array_equal(d_prog, d_base)


def test_jpeg_progressive_color_and_narrow_bands():
    """3-component 4:4:4 progressive and a maximally-split band layout
    (63 single-coefficient AC scans) both reproduce the baseline
    decode; the narrow bands force EOBn runs in nearly every scan."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_progressive(rgb)),
        decode_jpeg_baseline(encode_jpeg_baseline(rgb)),
    )
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    split = tuple((k, k) for k in range(1, 64))
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_progressive(img, bands=split)),
        decode_jpeg_baseline(encode_jpeg_baseline(img)),
    )


def test_jpeg_progressive_eobrun_is_compact():
    """A flat image's AC band scans must collapse into single EOBn
    runs: for a 16x32-block flat frame (512 blocks, eobrun count 512 ->
    r=9 symbol + 9 extra bits + padding), each AC scan's entropy
    segment is <= 4 bytes.  A per-block EOB encoding would emit ~576
    bytes — this pins that the encoder actually merges runs."""
    img = np.full((128, 256), 77, dtype=np.uint8)
    enc = encode_jpeg_progressive(img)
    # walk SOS segments; entropy data runs to the next 0xFF-marker
    scans = []
    pos = enc.find(b"\xff\xda")
    while pos != -1:
        (slen,) = struct.unpack_from(">H", enc, pos + 2)
        start = pos + 2 + slen
        nxt = start
        while nxt < len(enc):
            if enc[nxt] == 0xFF and enc[nxt + 1] != 0x00:
                break
            nxt += 1
        scans.append(enc[start:nxt])
        pos = enc.find(b"\xff\xda", nxt)
    assert len(scans) == 3  # DC + two AC bands
    for ac_scan in scans[1:]:
        assert len(ac_scan) <= 4, f"EOB run not merged: {len(ac_scan)}B"
    assert np.array_equal(decode_jpeg_baseline(enc), img)


def test_jpeg_progressive_al_point_shift_decodes():
    """Al > 0 DC first pass: a hand-built stream carrying dc >> 1 with
    Al=1 must reconstruct dc = (dc >> 1) << 1 — exact when dc is even.
    Constant 192 gives dc = 192-128 = 64 (even), so the decoded image
    is bit-exact.  This is the decoder's point-shift path, which the
    Ah=0-only encoder cannot produce."""
    from map2db_spark.functions.jpeg_codec import (
        _AC_PROG_COUNTS,
        _AC_PROG_SYMBOLS,
        _BitWriter,
        _DC_COUNTS,
        _DC_SYMBOLS,
        _category,
        _value_bits,
    )

    img = np.full((8, 8), 192, dtype=np.uint8)
    base = encode_jpeg_progressive(img, bands=((1, 63),))
    # rebuild the DC scan with Al=1 and the halved diff
    dc_map = build_huffman(_DC_COUNTS, _DC_SYMBOLS)
    ac_map = build_huffman(_AC_PROG_COUNTS, _AC_PROG_SYMBOLS)
    w = _BitWriter()
    diff = (192 - 128) >> 1  # 32
    size = _category(diff)
    code, ln = dc_map[size]
    w.write(code, ln)
    w.write(_value_bits(diff, size), size)
    dc_scan = w.flush()
    w2 = _BitWriter()
    code, ln = ac_map[0x00]  # EOB1: the single block's AC band is empty
    w2.write(code, ln)
    ac_scan = w2.flush()
    j = base.find(b"\xff\xda")
    head = base[:j]
    sos_dc = (b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00])
              + bytes([0, 0, 0x01]))  # Ss=0 Se=0 Ah=0 Al=1
    sos_ac = (b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00])
              + bytes([1, 63, 0x00]))
    stream = (head + sos_dc + dc_scan + sos_ac + ac_scan
              + struct.pack(">BB", 0xFF, 0xD9))
    assert np.array_equal(decode_jpeg_baseline(stream), img)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    sa=st.integers(min_value=1, max_value=3),
    ri=st.sampled_from([0, 2]),
)
def test_jpeg_successive_approximation_matches_baseline(seed, sa, ri):
    """Successive approximation transmits every coefficient bit across
    first + refinement passes, so decode(SA progressive) must equal
    decode(baseline) pixel-for-pixel — this pins the point transforms
    (DC arithmetic shift vs AC magnitude shift), the correction-bit
    buffering, the newly-nonzero walk, and EOBn runs inside
    refinement, with and without restart markers."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    enc = encode_jpeg_progressive(img, successive=sa, restart_interval=ri)
    assert np.array_equal(
        decode_jpeg_baseline(enc),
        decode_jpeg_baseline(encode_jpeg_baseline(img)),
    )


def test_jpeg_sa_color_and_narrow_bands():
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    base = decode_jpeg_baseline(encode_jpeg_baseline(rgb))
    for sa in (1, 2):
        assert np.array_equal(
            decode_jpeg_baseline(
                encode_jpeg_progressive(rgb, successive=sa,
                                        restart_interval=3)
            ),
            base,
        )
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    split = tuple((k, k) for k in range(1, 64))
    assert np.array_equal(
        decode_jpeg_baseline(
            encode_jpeg_progressive(img, bands=split, successive=2)
        ),
        decode_jpeg_baseline(encode_jpeg_baseline(img)),
    )


def test_jpeg_sa_constant_blocks_bit_exact():
    """Constant blocks under SA: the DC refinement bits restore odd
    DC values the point-shifted first pass truncated, so the stream
    stays bit-exact end-to-end (not just quantization-bounded)."""
    img = _const_block_img(13, 2, 3)
    for sa in (1, 2, 3):
        assert np.array_equal(
            decode_jpeg_baseline(encode_jpeg_progressive(img, successive=sa)),
            img,
        ), sa


def test_jpeg_restart_markers_roundtrip():
    """Baseline restart intervals: RSTn markers byte-align the stream
    and reset DC prediction; the decode must equal the no-restart
    decode for every interval and subsampling layout."""
    rng = np.random.default_rng(3)
    for h, w, ri, ss in [(24, 40, 1, "444"), (24, 40, 3, "444"),
                         (64, 64, 2, "420"), (17, 23, 5, "422")]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        enc = encode_jpeg_baseline(img, subsampling=ss, restart_interval=ri)
        assert enc.count(b"\xff\xd0") >= 1 or ri > 4  # markers present
        assert np.array_equal(
            decode_jpeg_baseline(enc),
            decode_jpeg_baseline(encode_jpeg_baseline(img, subsampling=ss)),
        ), (h, w, ri, ss)


def test_jpeg_restart_out_of_order_raises():
    """RSTn markers must appear in cyclic order (B.2.1.2); a swapped
    marker is corruption, not a resync point."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    enc = bytearray(encode_jpeg_baseline(img, restart_interval=1))
    i0 = bytes(enc).find(b"\xff\xd0")
    assert i0 != -1
    enc[i0 + 1] = 0xD3  # RST0 -> RST3
    with pytest.raises(JpegError, match="restart marker out of order"):
        decode_jpeg_baseline(bytes(enc))


def test_fuzz_sa_restart_bitflips_truncation_typed_errors_only():
    """r6 fuzz campaign over the SA-refinement and restart decode
    paths: 6000 trials (bitflips + truncations over SA, SA+restart,
    and baseline-restart streams) ran clean at landing; this pins a
    400-trial slice."""
    import random

    rng = np.random.default_rng(17)
    pyr = random.Random(17)
    encs = [
        encode_jpeg_progressive(
            rng.integers(0, 256, (17, 9, 3), dtype=np.uint8), successive=2
        ),
        encode_jpeg_progressive(
            rng.integers(0, 256, (16, 16), dtype=np.uint8),
            successive=1, restart_interval=2,
        ),
        encode_jpeg_baseline(
            rng.integers(0, 256, (24, 16, 3), dtype=np.uint8),
            restart_interval=3,
        ),
    ]
    for _ in range(400):
        e = bytearray(pyr.choice(encs))
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(2, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(2, len(e))])
        try:
            px = decode_jpeg_baseline(data)
            assert px.ndim in (2, 3)
        except (JpegError, NotImplementedError):
            pass


def test_jpeg_progressive_rejects_bad_bands():
    with pytest.raises(JpegError):
        encode_jpeg_progressive(_const_block_img(1, 1, 1), bands=((0, 5),))
    with pytest.raises(JpegError):
        encode_jpeg_progressive(_const_block_img(1, 1, 1), bands=((5, 64),))


def test_jpeg_codec_walker_reads_real_stream():
    """The metadata walker and the real encoder agree on the layout."""
    hdr = parse_jpeg_header(encode_jpeg_baseline(_const_block_img(3, 1, 2)))
    assert (hdr["width"], hdr["height"], hdr["ncomp"]) == (16, 8, 1)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_jpeg_codec_lossy_error_bounded(seed):
    """Arbitrary content: reconstruction error is bounded by the
    quantization step (coefficient error <= q/2 per coefficient;
    worst-case spatial amplification keeps pixels within ~q)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2 * int(
        FIXTURE_QTABLE.max()
    )


def test_jpeg_codec_non_multiple_of_8_crops():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert dec.shape == (13, 21)


def test_jpeg_codec_color_bounded():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(rgb))
    assert dec.shape == rgb.shape
    # YCbCr transform + quantization: looser bound than grayscale
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4 * int(
        FIXTURE_QTABLE.max()
    )


def test_jpeg_codec_rejects_out_of_envelope():
    """Out-of-envelope / malformed inputs raise instead of
    mis-decoding.  With the full progressive decoder (spectral
    selection AND refinement), a bare SOF2 flip is malformed
    progressive (DC scans must carry Se=0) -> JpegError; a refinement
    scan BEFORE any first pass violates scan ordering (G.1.1.1.1) ->
    JpegError; genuinely unsupported is arithmetic coding (SOF10) ->
    NotImplementedError."""
    img = _const_block_img(1, 1, 1)
    enc = bytearray(encode_jpeg_baseline(img))
    # flip SOF0 (FFC0) to SOF2 (FFC2) -> malformed progressive
    i = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2:])
    with pytest.raises(JpegError):
        decode_jpeg_baseline(prog)
    # refinement-before-first-pass: Ah nibble of the FIRST scan's SOS
    # approximation byte (the byte right before the scan data)
    penc = bytearray(encode_jpeg_progressive(img))
    j = bytes(penc).find(b"\xff\xda")  # first SOS (the DC scan)
    (slen,) = struct.unpack_from(">H", penc, j + 2)
    penc[j + 2 + slen - 1] |= 0x10  # Ah = 1 with no prior first pass
    with pytest.raises(JpegError, match="refinement before first pass"):
        decode_jpeg_baseline(bytes(penc))
    # arithmetic coding (SOF10 = FFCA) stays NotImplementedError
    arith = bytes(enc[:i]) + b"\xff\xca" + bytes(enc[i + 2:])
    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline(arith)
    # corrupt magic
    with pytest.raises(JpegError):
        decode_jpeg_baseline(b"\x00\x00" + bytes(enc[2:]))


def test_jpeg_codec_huffman_canonical():
    """Canonical code construction: prefix-free and length-ordered."""
    counts = [0, 1, 2, 3] + [0] * 12
    symbols = [10, 20, 21, 30, 31, 32]
    table = build_huffman(counts, symbols)
    assert len(table) == 6
    codes = sorted((ln, code) for code, ln in table.values())
    as_bits = [format(code, f"0{ln}b") for ln, code in codes]
    for i, a in enumerate(as_bits):
        for b in as_bits[i + 1:]:
            assert not b.startswith(a), (a, b)


def test_jpeg_codec_byte_stuffing_roundtrip():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still round-trip (stuffing + unstuffing)."""
    found = False
    for seed in range(60):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        enc = encode_jpeg_baseline(img)
        scan = enc[enc.find(b"\xff\xda") + 2:-2]
        if b"\xff\x00" in scan:
            found = True
            dec = decode_jpeg_baseline(enc)
            assert dec.shape == img.shape
    assert found, "no fixture produced a stuffed byte; widen the search"


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=500),
    frac=st.floats(min_value=0.01, max_value=0.999),
)
def test_jpeg_codec_truncation_always_raises_jpeg_error(seed, frac):
    """Quarantine contract under corruption: any truncation of a valid
    stream (except dropping only the trailing EOI after a complete
    scan) raises JpegError or NotImplementedError — never a raw
    IndexError/struct.error, and never silent garbage pixels."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    enc = encode_jpeg_baseline(img)
    cut = max(2, int(len(enc) * frac))
    if cut >= len(enc) - 2:
        return  # EOI-only truncation: scan already complete, benign
    try:
        out = decode_jpeg_baseline(enc[:cut])
    except (JpegError, NotImplementedError):
        return
    # reaching here without error is only legal if the full scan fit
    assert out.shape == img.shape


def test_fuzz_bitflips_and_truncation_typed_errors_only():
    """r4 fuzz distillation (found a real hole): 1-3 random bit flips
    or truncation of valid streams must raise JpegError /
    NotImplementedError or decode — never an untyped error.  The
    original campaign surfaced an int64 OverflowError from a corrupt
    DHT yielding a DC size category > 11 (now rejected per T.81
    table F.1)."""
    import random

    import numpy as np

    rng = np.random.default_rng(7)
    pyr = random.Random(7)
    encs = [
        encode_jpeg_baseline(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        for h, w in [(8, 8), (24, 16), (17, 9)]
    ]
    for _ in range(800):
        e = bytearray(pyr.choice(encs))
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(2, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(2, len(e))])
        try:
            px = decode_jpeg_baseline(data)
            assert px.ndim in (2, 3)
        except (JpegError, NotImplementedError):
            pass


def test_fuzz_progressive_bitflips_truncation_typed_errors_only():
    """r6 fuzz campaign over the NEW progressive scan walker
    (jpeg_codec._decode_scan's EOBn/band path): random 1-3 bit flips
    and truncations of valid SOF2 streams must raise JpegError /
    NotImplementedError or decode — never an untyped exception.  The
    full 3000-trial campaign plus a structured pass (every SOS header
    byte forced to boundary values, scans dropped/duplicated/
    reordered) ran clean at landing; this pins a 400-trial slice."""
    import random

    rng = np.random.default_rng(7)
    pyr = random.Random(7)
    encs = [
        encode_jpeg_progressive(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        )
        for h, w in [(8, 8), (17, 9)]
    ] + [
        encode_jpeg_progressive(
            rng.integers(0, 256, (16, 16), dtype=np.uint8),
            bands=tuple((k, k) for k in range(1, 64)),
        )
    ]
    for _ in range(400):
        e = bytearray(pyr.choice(encs))
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(2, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(2, len(e))])
        try:
            px = decode_jpeg_baseline(data)
            assert px.ndim in (2, 3)
        except (JpegError, NotImplementedError):
            pass


def test_fuzz_progressive_sos_header_bytes_typed_errors_only():
    """Structured slice of the r6 campaign: every byte of every SOS
    header forced to boundary values (0x00/0x3F/0x40/0x7F/0xFF) — the
    bytes that steer the band walk (Ss/Se/Ah/Al, component ids, table
    selectors) must never escape the typed-error contract."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    enc = encode_jpeg_progressive(img)
    pos = []
    p = enc.find(b"\xff\xda")
    while p != -1:
        pos.append(p)
        p = enc.find(b"\xff\xda", p + 2)
    assert len(pos) == 3
    for p in pos:
        (slen,) = struct.unpack_from(">H", enc, p + 2)
        for off in range(2, 2 + slen):
            for v in (0x00, 0x3F, 0x40, 0x7F, 0xFF):
                e = bytearray(enc)
                e[p + off] = v
                try:
                    out = decode_jpeg_baseline(bytes(e))
                    assert out.ndim == 2
                except (JpegError, NotImplementedError):
                    pass


def test_jpeg_codec_420_gray_blocks_bit_exact():
    """4:2:0: gray-valued block-constant images keep Cb=Cr=128 exactly
    through the box prefilter, so the subsampled stream round-trips
    bit-exactly too — including non-MCU-multiple dims (padding + crop)
    and the 2x2-Y-per-MCU interleave's DC prediction chain."""
    for h, w, seed in [(16, 16, 1), (19, 21, 2), (9, 33, 3), (8, 8, 4)]:
        rng = np.random.default_rng(seed)
        bh, bw = -(-h // 8), -(-w // 8)
        vals = rng.integers(40, 216, (bh, bw))
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:h, :w]
        rgb = np.stack([img, img, img], axis=-1).astype(np.uint8)
        for ss in ("420", "422"):
            dec = decode_jpeg_baseline(encode_jpeg_baseline(rgb, subsampling=ss))
            assert np.array_equal(dec, rgb), (h, w, ss)


def test_jpeg_codec_420_smooth_error_bounded_and_smaller():
    """Smooth colored content through 4:2:0/4:2:2: bounded error and a
    genuinely smaller stream than 4:4:4 (the chroma block count drops
    4x/2x — the point of subsampling)."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([40 + xx, 60 + yy, 80 + (xx + yy) // 2], axis=-1).astype(
        np.uint8
    )
    e444 = encode_jpeg_baseline(img)
    for ss in ("420", "422"):
        enc = encode_jpeg_baseline(img, subsampling=ss)
        dec = decode_jpeg_baseline(enc)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8, ss
        assert len(enc) < len(e444), ss


def test_jpeg_codec_420_sampling_factors_in_sof():
    """The emitted SOF carries 2x2/1x1 (or 2x1/1x1) factors and the
    metadata walker still reads dims from the same bytes."""
    img = np.zeros((17, 13, 3), dtype=np.uint8)
    enc = encode_jpeg_baseline(img, subsampling="420")
    hdr = parse_jpeg_header(enc)
    assert (hdr["width"], hdr["height"], hdr["ncomp"]) == (13, 17, 3)
    sof = enc.index(b"\xff\xc0")
    comps = enc[sof + 4 + 6:sof + 4 + 6 + 9]
    assert comps[1] == 0x22 and comps[4] == 0x11 and comps[7] == 0x11


def test_jpeg_codec_420_fuzz_typed_errors_only():
    import random

    rng = np.random.default_rng(17)
    pyr = random.Random(17)
    encs = [
        encode_jpeg_baseline(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), subsampling=ss
        )
        for (h, w), ss in [((16, 16), "420"), ((17, 9), "420"),
                           ((24, 16), "422")]
    ]
    for _ in range(600):
        e = bytearray(pyr.choice(encs))
        if pyr.random() < 0.5:
            for _k in range(pyr.randint(1, 3)):
                i = pyr.randrange(2, len(e))
                e[i] ^= 1 << pyr.randrange(8)
            data = bytes(e)
        else:
            data = bytes(e[: pyr.randrange(2, len(e))])
        try:
            px = decode_jpeg_baseline(data)
            assert px.ndim in (2, 3)
        except (JpegError, NotImplementedError):
            pass
