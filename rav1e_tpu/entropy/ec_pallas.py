"""On-TPU od_ec range packing (Pallas) — SURVEY §7.2 Plan B prototype.

The AV1 range coder is inherently serial per tile, but the *context
modeling* (CDF lookups + adaptation) and the *interval arithmetic*
split cleanly: a host/XLA pass resolves every symbol to a tuple
    (fl, fh, cu, cv)
(inverse-CDF bounds in Q15 plus the EC_MIN_PROB offsets), after which
coding is a pure scalar recurrence over (low, rng):

    u   = fl < 2^15 ? ((rng>>8)*(fl>>6) >> 1) + cu : rng
    v   =             ((rng>>8)*(fh>>6) >> 1) + cv
    low += rng - u ; rng = u - v ; renormalize ; flush bytes

This module runs that recurrence as a Pallas TPU kernel (one scalar
loop per tile — the north-star "serial symbol loop at speed-of-light
per chip"), emitting the same 8-bit chunk stream as the host encoder
(entropy/ec.py::ECEncoder, rav1e src/ec.rs parity).  The flush
threshold is 16 bits instead of the host's 24 so the whole state fits
int32 (TPU has no int64 scalar path); chunk positions and values are
unchanged, so the final byte string is identical.

Use: RecordingEncoder captures a tile's symbol stream (drop-in for
ECEncoder, including CDF adaptation); pack_ir() codes it on device;
finish() applies the host-side termination + backward carry
propagation.  Byte-identity vs ECEncoder is asserted in
tests/test_pallas.py on random streams and on a REAL captured tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rav1e_tpu.entropy.ec import (
    EC_MIN_PROB,
    EC_PROB_SHIFT,
    PROB_TOP,
    update_cdf,
)


class RecordingEncoder:
    """ECEncoder-compatible front half: resolves symbols/bools/
    literals against (adapting) CDFs into the (fl, fh, cu, cv) IR."""

    def __init__(self):
        self.ir: list[tuple[int, int, int, int]] = []

    def encode_symbol(self, symbol: int, icdf, adapt: bool = True):
        n = len(icdf) - 1
        N = n - 1
        fl = PROB_TOP if symbol == 0 else icdf[symbol - 1]
        fh = icdf[symbol]
        cu = EC_MIN_PROB * (N - (symbol - 1))
        cv = EC_MIN_PROB * (N - symbol)
        self.ir.append((int(fl), int(fh), int(cu) if fl < PROB_TOP
                        else 0, int(cv)))
        if adapt:
            update_cdf(icdf, symbol)

    def encode_bool(self, val: int, f: int):
        if val:
            self.ir.append((int(f), 0, EC_MIN_PROB, 0))
        else:
            self.ir.append((PROB_TOP, int(f), 0, EC_MIN_PROB))

    def encode_literal(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.encode_bool((value >> i) & 1, 1 << 14)


def _pack_kernel(ir_ref, chunks_ref, state_ref):
    """Serial od_ec recurrence over the whole IR (scalar loop).

    ir_ref: [n, 4] int32 (fl, fh, cu, cv).
    chunks_ref: [cap] int32 8-bit chunks (values may carry a 9th bit).
    state_ref: [4] int32 (low, nbits, flushed_bytes*8, n_chunks)."""
    n = ir_ref.shape[0]
    chunks_ref[...] = jnp.zeros_like(chunks_ref)

    def body(i, st):
        low, rng, nbits, flushed, k = st
        fl = ir_ref[i, 0]
        fh = ir_ref[i, 1]
        cu = ir_ref[i, 2]
        cv = ir_ref[i, 3]
        scaled_fl = (((rng >> 8) * (fl >> EC_PROB_SHIFT))
                     >> (7 - EC_PROB_SHIFT)) + cu
        u = jnp.where(fl < PROB_TOP, scaled_fl, rng)
        v = (((rng >> 8) * (fh >> EC_PROB_SHIFT))
             >> (7 - EC_PROB_SHIFT)) + cv
        low = low + (rng - u)
        rng = u - v
        # renormalize: d = 16 - bit_length(rng); rng in [4, 2^16).
        # Integer msb (branchless shift chain) — float log2 is 1-ulp
        # hazardous near powers of two.
        x = rng
        msb = jnp.int32(0)
        for sh in (8, 4, 2, 1):
            t = x >> sh
            take = t > 0
            x = jnp.where(take, t, x)
            msb = msb + jnp.where(take, sh, 0)
        d = 15 - msb
        # flush BEFORE the shift: a chunk is bits [flushed,
        # flushed+8) of the fraction, invariant to the pending shift
        # ((low << d) >> (w + d - 8) == low >> (w - 8)).  The host
        # flushes after, while window >= 24 (keeping >= 16 so the
        # 16-bit-scale adds carry at most one bit); flushing the same
        # byte boundaries early keeps low < 2^24 — int32-safe.
        # window + d <= 23 + 13 -> at most 2 flushes per symbol.
        # Non-flushing steps store garbage at slot k that a later
        # flushing step overwrites (k only advances on flush; slots
        # beyond the final k are trimmed by the caller).
        for _ in range(2):
            window = nbits - flushed
            do = window + d >= 24
            keep = jnp.where(do, window - 8, 0)
            chunk = low >> keep
            chunks_ref[pl.dslice(k, 1)] = chunk[None]
            low = jnp.where(do, low & ((1 << keep) - 1), low)
            flushed = jnp.where(do, flushed + 8, flushed)
            k = jnp.where(do, k + 1, k)
        low = low << d
        rng = rng << d
        nbits = nbits + d
        return (low, rng, nbits, flushed, k)

    low, rng, nbits, flushed, k = jax.lax.fori_loop(
        0, n, body,
        (jnp.int32(0), jnp.int32(PROB_TOP), jnp.int32(15),
         jnp.int32(0), jnp.int32(0)))
    state_ref[0] = low
    state_ref[1] = nbits
    state_ref[2] = flushed
    state_ref[3] = k


def pack_ir(ir: np.ndarray, interpret: bool | None = None):
    """Run the Pallas coder over IR [n, 4] int32.  Returns
    (chunks int32 [k], low, nbits, flushed)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n = int(ir.shape[0])
    cap = 2 * n + 64                 # <= 2 chunks per symbol
    fn = pl.pallas_call(
        _pack_kernel,
        out_shape=(jax.ShapeDtypeStruct((cap,), jnp.int32),
                   jax.ShapeDtypeStruct((4,), jnp.int32)),
        interpret=interpret,
    )
    chunks, state = fn(jnp.asarray(ir, jnp.int32))
    chunks = np.asarray(chunks)
    low, nbits, flushed, k = (int(x) for x in np.asarray(state))
    return chunks[:k], low, nbits, flushed


def finish(chunks: np.ndarray, low: int, nbits: int,
           flushed: int) -> bytes:
    """Host termination: round low up inside the final interval, flush
    the tail, propagate carries backward (ECEncoder.done twin)."""
    m = (1 << 14) - 1
    e = ((low + m) & ~m) | (m + 1)
    window = nbits - flushed
    out_chunks = list(int(c) for c in chunks)
    while window > 0:
        take = window - 8 if window >= 8 else 0
        out_chunks.append(e >> take)
        e &= (1 << take) - 1
        window = take
    out = bytearray(len(out_chunks))
    carry = 0
    for i in range(len(out_chunks) - 1, -1, -1):
        s = out_chunks[i] + carry
        out[i] = s & 0xFF
        carry = s >> 8
    assert carry == 0, "leading carry out of stream"
    rem = nbits % 8
    if rem:
        out[-1] = (out[-1] << (8 - rem)) & 0xFF
    return bytes(out)


def pack_symbols(ir: np.ndarray) -> bytes:
    """IR -> final byte string (device coding + host termination)."""
    return finish(*pack_ir(ir))
