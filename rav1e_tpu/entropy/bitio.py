"""Plain bit-level writers for OBU headers (not arithmetic-coded data).

Reference parity: rav1e src/header.rs uses bitstream-io's BitWriter for
the uncompressed headers; this is our equivalent. MSB-first, f(n)/le(n)/
uleb128/su/ns syntax elements per AV1 spec §4/5.3.
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer."""

    def __init__(self):
        self._bytes = bytearray()
        self._bitbuf = 0
        self._nbits = 0

    def f(self, value: int, n: int):
        """Write unsigned value in n bits (spec f(n))."""
        if n == 0:
            return
        assert 0 <= value < (1 << n), (value, n)
        self._bitbuf = (self._bitbuf << n) | value
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._bitbuf >> self._nbits) & 0xFF)
        self._bitbuf &= (1 << self._nbits) - 1

    def bit(self, value: int | bool):
        self.f(1 if value else 0, 1)

    def uvlc(self, value: int):
        """spec uvlc(): Exp-Golomb style."""
        v = value + 1
        n = v.bit_length()
        self.f(0, n - 1)
        self.f(v, n)

    def le(self, value: int, nbytes: int):
        """Little-endian byte-aligned integer (spec le(n)). Must be aligned."""
        assert self._nbits == 0, "le() requires byte alignment"
        for i in range(nbytes):
            self._bytes.append((value >> (8 * i)) & 0xFF)

    def uleb128(self, value: int):
        assert self._nbits == 0
        self._bytes.extend(uleb128(value))

    def su(self, value: int, n: int):
        """Signed value in n bits (spec su(1+n) style: n magnitude bits)."""
        self.f(value & ((1 << n) - 1), n)

    def ns(self, value: int, n: int):
        """spec ns(n): non-symmetric unsigned encoding of value < n."""
        w = n.bit_length()
        m = (1 << w) - n
        if value < m:
            self.f(value, w - 1)
        else:
            extra = value - m
            self.f(m + (extra >> 1), w - 1)
            self.f(extra & 1, 1)

    def delta_q(self, value: int):
        """spec delta_q(): coded flag + su(1+6)."""
        if value:
            self.bit(1)
            assert -64 <= value < 64
            self.f(value & 0x7F, 7)
        else:
            self.bit(0)

    def byte_align(self):
        if self._nbits:
            self.f(0, 8 - self._nbits)

    def trailing_bits(self):
        """spec trailing_bits(): a 1 bit then zeros to byte alignment."""
        self.bit(1)
        self.byte_align()

    @property
    def bit_position(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def bytes(self) -> bytes:
        assert self._nbits == 0, "unaligned writer"
        return bytes(self._bytes)


def uleb128(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)
