"""Byte-level primitives for the MapsForge binary map format.

Decoder semantics follow the reference scans S1-S4
(/root/reference/src/map2db.py:259-318); the implementation is
buffer-oriented (memoryview + cursor) instead of file-object reads so
an executor can decode a tile from an in-memory byte slice fetched by
range read — no seek()-able file handle required.

Also provides the matching encoders (inverse functions), used by the
fixture generator and round-trip property tests.
"""

from __future__ import annotations

import struct


class Cursor:
    """A read cursor over an immutable byte buffer."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError(f"short read at {self.pos}: wanted {n}, got {len(b)}")
        self.pos += n
        return bytes(b)

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        return struct.unpack_from(">H", self.buf, self._adv(2))[0]

    def s16(self) -> int:
        return struct.unpack_from(">h", self.buf, self._adv(2))[0]

    def u32(self) -> int:
        return struct.unpack_from(">I", self.buf, self._adv(4))[0]

    def s32(self) -> int:
        return struct.unpack_from(">i", self.buf, self._adv(4))[0]

    def u64(self) -> int:
        return struct.unpack_from(">Q", self.buf, self._adv(8))[0]

    def f32(self) -> float:
        return struct.unpack_from(">f", self.buf, self._adv(4))[0]

    def _adv(self, n: int) -> int:
        p = self.pos
        self.pos += n
        return p

    def uleb(self) -> int:
        """Unsigned LEB128, at most 8 bytes."""
        out = 0
        shift = 0
        for _ in range(8):
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
        raise ValueError(f"unterminated ULEB128 at offset {self.pos - 8}")

    def sleb(self) -> int:
        """MapsForge signed LEB128: the terminating byte carries 6 value
        bits plus a sign bit at 0x40 (not two's-complement LEB128)."""
        b = self.buf[self.pos]
        self.pos += 1
        if not b & 0x80:
            mag = b & 0x3F
            return -mag if b & 0x40 else mag
        out = b & 0x7F
        shift = 7
        for _ in range(7):
            b = self.buf[self.pos]
            self.pos += 1
            if not b & 0x80:
                out |= (b & 0x3F) << shift
                return -out if b & 0x40 else out
            out |= (b & 0x7F) << shift
            shift += 7
        raise ValueError(f"unterminated SLEB128 at offset {self.pos - 8}")

    def lstr(self) -> str:
        """Varint-length-prefixed UTF-8 string."""
        n = self.uleb()
        return self.read(n).decode("utf-8")


# --- encoders (inverse functions; fixture generation + round-trip tests) ---


def enc_u16(v: int) -> bytes:
    return struct.pack(">H", v)


def enc_s16(v: int) -> bytes:
    return struct.pack(">h", v)


def enc_u32(v: int) -> bytes:
    return struct.pack(">I", v)


def enc_s32(v: int) -> bytes:
    return struct.pack(">i", v)


def enc_u64(v: int) -> bytes:
    return struct.pack(">Q", v)


def enc_f32(v: float) -> bytes:
    return struct.pack(">f", v)


def enc_uleb(v: int) -> bytes:
    if v < 0:
        raise ValueError("ULEB128 encodes unsigned values only")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_sleb(v: int) -> bytes:
    """Inverse of Cursor.sleb: sign bit 0x40 in the terminating byte."""
    sign = 0x40 if v < 0 else 0
    a = abs(v)
    out = bytearray()
    while a > 0x3F:
        out.append(0x80 | (a & 0x7F))
        a >>= 7
    out.append(sign | a)
    return bytes(out)


def enc_lstr(s: str) -> bytes:
    b = s.encode("utf-8")
    return enc_uleb(len(b)) + b
