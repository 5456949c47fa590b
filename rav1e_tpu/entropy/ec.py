"""AV1 multisymbol range coder (Daala od_ec family).

Reference parity: rav1e src/ec.rs (WriterBase/WriterEncoder). The AV1
spec (§8.2) defines the *decoder*; this encoder emits the matching
binary fraction. CDFs are stored AOM-style as "inverse CDFs": for an
n-symbol alphabet, ``icdf[k]`` = Q15 probability of (symbol > k),
strictly decreasing to ``icdf[n-1] == 0``, followed by one counter slot
used by adaptation, so arrays have n+1 entries.

A reference decoder is included for self-tests (mirrors dav1d's msac /
spec §8.2.2-8.2.6 semantics, in non-inverted value space); the external
truth remains dav1d via rav1e_tpu.conform.

Adaptation (update_cdf) must match the decoder bit-exactly:
  rate = 3 + (count > 15) + (count > 31) + min(floor_log2(nsyms), 2)
  icdf[i] += (32768 - icdf[i]) >> rate   for i < symbol
  icdf[i] -= icdf[i] >> rate             for symbol <= i < nsyms-1
  count saturates at 32.
"""

from __future__ import annotations

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
PROB_TOP = 1 << 15


def update_cdf(icdf, symbol: int):
    """In-place spec CDF adaptation. icdf: list/array of n+1 ints."""
    n = len(icdf) - 1
    count = icdf[n]
    rate = 3 + (count > 15) + (count > 31) + min(_floor_log2(n), 2)
    for i in range(n - 1):
        if i < symbol:
            icdf[i] += (PROB_TOP - icdf[i]) >> rate
        else:
            icdf[i] -= icdf[i] >> rate
    icdf[n] = count + (count < 32)


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1


def _scale(rng: int, f: int) -> int:
    return ((rng >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)


class ECEncoder:
    """od_ec encoder: symbols against Q15 inverse CDFs, bools, literals."""

    def __init__(self):
        self.low = 0
        self.rng = PROB_TOP
        # number of fraction bits generated so far (15 initial precision)
        self.nbits = 15
        self.flushed = 0  # bits already moved to precarry
        self.precarry: list[int] = []  # 8-bit chunks, may hold a carry bit

    # -- core interval update ------------------------------------------------

    def _norm(self):
        rng = self.rng
        assert 0 < rng
        d = 16 - rng.bit_length()
        if d > 0:
            self.low <<= d
            self.rng = rng << d
            self.nbits += d
        # keep a 24-bit working window in `low`; flush bytes above it
        while self.nbits - self.flushed >= 24:
            keep = self.nbits - self.flushed - 8
            self.precarry.append(self.low >> keep)  # may be >= 256 (carry)
            self.low &= (1 << keep) - 1
            self.flushed += 8

    def encode_symbol(self, symbol: int, icdf, adapt: bool = True):
        """Encode `symbol` against inverse CDF (n+1 entries); adapt it."""
        n = len(icdf) - 1
        N = n - 1
        r = self.rng
        fl = PROB_TOP if symbol == 0 else icdf[symbol - 1]
        fh = icdf[symbol]
        # fh == fl is legal: EC_MIN_PROB gives every symbol a nonzero slot
        assert fh <= fl <= PROB_TOP, (symbol, list(icdf))
        if fl < PROB_TOP:
            u = _scale(r, fl) + EC_MIN_PROB * (N - (symbol - 1))
            v = _scale(r, fh) + EC_MIN_PROB * (N - symbol)
            self.low += r - u
            self.rng = u - v
        else:
            v = _scale(r, fh) + EC_MIN_PROB * (N - symbol)
            self.rng = r - v
        self._norm()
        if adapt:
            update_cdf(icdf, symbol)

    def encode_bool(self, val: int, f: int):
        """Encode a boolean; f = Q15 probability mass assigned to val==1
        measured icdf-style (i.e. f == icdf[0] of the 2-symbol CDF)."""
        r = self.rng
        v = _scale(r, f) + EC_MIN_PROB
        if val:
            self.low += r - v
            self.rng = v
        else:
            self.rng = r - v
        self._norm()

    def encode_literal(self, value: int, nbits: int):
        """Uncompressed literal bits, MSB first (spec L(n))."""
        for i in range(nbits - 1, -1, -1):
            self.encode_bool((value >> i) & 1, 1 << 14)

    def encode_subexp(self, *a, **k):  # placeholder for later golomb/subexp
        raise NotImplementedError

    # -- termination ---------------------------------------------------------

    def done(self) -> bytes:
        """Finalize; returns the byte string of the coded fraction."""
        low, nbits, flushed = self.low, self.nbits, self.flushed
        # Round low up within the final interval so trailing zeros decode
        # inside it: rng >= 2^15 relative to the final bit scale, so
        # rounding up to a multiple of 2^14 (and marking bit 14) is safe.
        m = (1 << 14) - 1
        e = ((low + m) & ~m) | (m + 1)
        window = nbits - flushed
        # e may exceed the window by one carry bit; flush everything.
        chunks = list(self.precarry)
        while window > 0:
            take = window - 8 if window >= 8 else 0
            chunks.append(e >> take)
            e &= (1 << take) - 1
            window = take
        # backward carry propagation
        out = bytearray(len(chunks))
        carry = 0
        for i in range(len(chunks) - 1, -1, -1):
            s = chunks[i] + carry
            out[i] = s & 0xFF
            carry = s >> 8
        assert carry == 0, "leading carry out of stream"
        # pad to whole bytes happens naturally: nbits may not be a multiple
        # of 8; the last chunk was emitted with low bits zero-padded only if
        # window < 8, in which case shift it into the high bits of its byte.
        rem = nbits % 8
        if rem:
            out[-1] = (out[-1] << (8 - rem)) & 0xFF
        return bytes(out)


class ECDecoder:
    """Reference decoder (non-inverted value space) for self-tests."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.rng = PROB_TOP
        self.value = self._read_bits(15)

    def _read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i = self.pos >> 3
            bit = 0
            if byte_i < len(self.data):
                bit = (self.data[byte_i] >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            v = (v << 1) | bit
        return v

    def _renorm(self):
        while self.rng < PROB_TOP:
            self.rng <<= 1
            self.value = (self.value << 1) | self._read_bits(1)

    def decode_symbol(self, icdf, adapt: bool = True) -> int:
        n = len(icdf) - 1
        N = n - 1
        r = self.rng
        prev = r
        s = -1
        while True:
            s += 1
            fh = icdf[s]
            cur = _scale(r, fh) + EC_MIN_PROB * (N - s) if s < n else 0
            # symbol s occupies [r - u, r - v) == [r - prev_cur, r - cur)
            lo = r - prev
            hi = r - cur
            if lo <= self.value < hi:
                self.value -= lo
                self.rng = hi - lo
                break
            prev = cur
            assert s < n, "decoder desync"
        self._renorm()
        if adapt:
            update_cdf(icdf, s)
        return s

    def decode_bool(self, f: int) -> int:
        r = self.rng
        v = _scale(r, f) + EC_MIN_PROB
        if self.value >= r - v:
            self.value -= r - v
            self.rng = v
            bit = 1
        else:
            self.rng = r - v
            bit = 0
        self._renorm()
        return bit

    def decode_literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode_bool(1 << 14)
        return v
