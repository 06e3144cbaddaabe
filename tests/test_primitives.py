"""Unit tests for byte primitives and tile math (SURVEY §5 item 1)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from map2db_spark.sources.primitives import (
    Cursor,
    enc_lstr,
    enc_sleb,
    enc_uleb,
)
from map2db_spark.sources.tilemath import lat_from_y, lon_from_x, x_from_lon, y_from_lat


def test_uleb_known_values():
    # hand-computed byte strings
    assert enc_uleb(0) == b"\x00"
    assert enc_uleb(127) == b"\x7f"
    assert enc_uleb(128) == b"\x80\x01"
    assert enc_uleb(300) == b"\xac\x02"
    assert Cursor(b"\xac\x02").uleb() == 300


def test_sleb_known_values():
    # sign bit is 0x40 in the terminating byte (MapsForge variant)
    assert enc_sleb(0) == b"\x00"
    assert enc_sleb(1) == b"\x01"
    assert enc_sleb(-1) == b"\x41"
    assert enc_sleb(63) == b"\x3f"
    assert enc_sleb(-63) == b"\x7f"
    assert enc_sleb(64) == b"\xc0\x00"  # continuation byte + zero terminator
    # decode checks are authoritative:
    for v in [0, 1, -1, 63, -63, 64, -64, 100, -100, 10**6, -(10**6)]:
        assert Cursor(enc_sleb(v)).sleb() == v


@given(st.integers(min_value=0, max_value=2**55 - 1))
def test_uleb_roundtrip(v):
    assert Cursor(enc_uleb(v)).uleb() == v


@given(st.integers(min_value=-(2**48), max_value=2**48))
def test_sleb_roundtrip(v):
    assert Cursor(enc_sleb(v)).sleb() == v


@given(st.text(max_size=200))
def test_lstr_roundtrip(s):
    assert Cursor(enc_lstr(s)).lstr() == s


@given(
    st.integers(min_value=1, max_value=20),
    st.floats(min_value=-179.9, max_value=179.9),
)
def test_tile_math_roundtrip_lon(z, lon):
    assert abs(lon_from_x(z, x_from_lon(z, lon)) - lon) < 1e-9


@given(
    st.integers(min_value=1, max_value=20),
    st.floats(min_value=-84.9, max_value=84.9),
)
def test_tile_math_roundtrip_lat(z, lat):
    assert abs(lat_from_y(z, y_from_lat(z, lat)) - lat) < 1e-9
