"""Adversarial-input robustness: the decoder must fail CLEANLY on
malformed map bytes — a Python exception, promptly — never a hang
(e.g. an unterminated-varint loop) or an interpreter-level fault.

The reference's failure mode on corrupt input is an uncontrolled
traceback mid-run (map2db.py has no defensive checks past the magic
string); this engine's contract is the same exception surface but
raised from bounded parsing (Cursor reads cannot run past the
buffer), which these fuzzes pin down:

- header truncated at every prefix length;
- header with single bytes flipped at every position;
- tile payload truncated / flipped (driver-side kernel call, no
  Spark session needed, so the fuzz sweeps hundreds of cases in
  seconds).
"""

from __future__ import annotations

import time
from pathlib import Path

import pytest

from map2db_spark.operators.decode import parse_tile_payload, tile_feature_rows
from map2db_spark.sources.header import parse_header, read_header
from map2db_spark.sources.sample_maps import dbl_map


@pytest.fixture(scope="module")
def map_bytes(tmp_path_factory) -> bytes:
    p = tmp_path_factory.mktemp("fuzz") / "dbl.map"
    dbl_map().write(str(p))
    return Path(p).read_bytes()


def test_header_truncation_fails_cleanly(map_bytes):
    for cut in range(0, 220, 1):
        t0 = time.monotonic()
        try:
            parse_header(map_bytes[:cut])
        except Exception as ex:  # noqa: BLE001 — any Python exception is a clean fail
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
        assert time.monotonic() - t0 < 1.0, f"slow fail at cut={cut}"


def test_header_bitflips_fail_cleanly_or_parse(map_bytes):
    base = bytearray(map_bytes)
    for pos in range(0, min(len(base), 200)):
        buf = bytearray(base)
        buf[pos] ^= 0xFF
        t0 = time.monotonic()
        try:
            h = parse_header(bytes(buf))
            # a successful parse must still be internally consistent
            assert h.subfiles is not None
        except Exception as ex:  # noqa: BLE001
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
        assert time.monotonic() - t0 < 1.0, f"slow fail at pos={pos}"


def _first_tile(map_bytes):
    header = parse_header(map_bytes)
    sf = header.subfiles[0]
    return header, sf


def test_tile_payload_truncation_fails_cleanly(map_bytes):
    """Feed the tile kernel progressively truncated payload bytes: it
    must return rows or raise, within bounded time, at every cut."""
    header, sf = _first_tile(map_bytes)
    payload = map_bytes[sf.offset : sf.offset + min(2000, sf.length)]
    for cut in range(0, min(len(payload), 300), 3):
        t0 = time.monotonic()
        try:
            parse_tile_payload(
                payload[:cut],
                sf.level,
                sf.minzoom,
                sf.maxzoom,
                tile_x=sf.minx,
                tile_y=sf.miny,
                ptags=header.ptags,
                wtags=header.wtags,
                debuginfo=header.debuginfo,
            )
        except Exception as ex:  # noqa: BLE001
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
        assert time.monotonic() - t0 < 1.0, f"slow fail at cut={cut}"


def test_whole_file_bitflip_pipeline(tmp_path, map_bytes, spark):
    """End-to-end: flip one byte in the tile-data region and run the
    full distributed decode — either it completes (flip landed in
    slack space / got rejected as a bad feature) or the job fails
    with a Python exception, within bounded wall time."""
    header = parse_header(map_bytes)
    body_start = header.subfiles[0].offset
    from map2db_spark.pipeline import load_features

    for pos in [body_start + 7, body_start + 23, body_start + 61]:
        buf = bytearray(map_bytes)
        buf[pos % len(buf)] ^= 0x5A
        p = tmp_path / f"flip{pos}.map"
        p.write_bytes(bytes(buf))
        t0 = time.monotonic()
        try:
            load_features(spark, str(p)).count()
        except Exception as ex:  # noqa: BLE001
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
        assert time.monotonic() - t0 < 60.0
