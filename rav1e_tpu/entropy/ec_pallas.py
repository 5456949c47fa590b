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
from jax.experimental.pallas import tpu as pltpu

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


LANES = 1024      # one int32 VMEM tile: chunk stores stay aligned
CHUNK = 512       # symbols per grid step (the [4, CHUNK] IR block
                  # rides in SMEM, where scalar dynamic loads are
                  # legal; TPU grid steps run sequentially, so the
                  # coder state carries across steps in SMEM scratch)


def _pack_kernel(ir_ref, chunks_ref, state_ref, st_ref, buf_ref):
    """One grid step: code CHUNK symbols of the IR (scalar loop).

    ir_ref: [4, CHUNK] int32 SMEM block (fl, fh, cu, cv rows).
    chunks_ref: [rows*8, 128] int32 VMEM output (whole array every
    step) — 8-bit chunks, may carry the 9th carry bit.  Chunks
    accumulate in the [8, 128] VMEM scratch tile buf_ref and flush
    1024 at a time as 8 aligned sublane rows (Mosaic cannot prove
    alignment for arbitrary dynamic element stores, and 1-D VMEM
    scratch trips its layout checks).
    state_ref: [8] int32 SMEM output (low, nbits, flushed, k).
    st_ref: [8] int32 SMEM scratch — coder state across grid steps.
    buf_ref: [8, 128] int32 VMEM scratch."""
    g = pl.program_id(0)
    # buf is [8, 128] (one int32 VMEM tile); lin = linear chunk slot
    lin = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))

    @pl.when(g == 0)
    def _init():
        st_ref[0] = 0            # low
        st_ref[1] = PROB_TOP     # rng
        st_ref[2] = 15           # nbits
        st_ref[3] = 0            # flushed
        st_ref[4] = 0            # k
        buf_ref[...] = jnp.zeros((8, 128), jnp.int32)

    def body(i, st):
        low, rng, nbits, flushed, k, buf = st
        fl = ir_ref[0, i]
        fh = ir_ref[1, i]
        cu = ir_ref[2, i]
        cv = ir_ref[3, i]
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
            buf = jnp.where(do & (lin == (k % LANES)), chunk, buf)
            low = jnp.where(do, low & ((1 << keep) - 1), low)
            flushed = jnp.where(do, flushed + 8, flushed)
            k2 = k + do.astype(jnp.int32)

            @pl.when(do & (k2 % LANES == 0))
            def _flush_row():
                chunks_ref[pl.dslice((k2 // LANES - 1) * 8, 8), :] = \
                    buf

            k = k2
        low = low << d
        rng = rng << d
        nbits = nbits + d
        return (low, rng, nbits, flushed, k, buf)

    low, rng, nbits, flushed, k, buf = jax.lax.fori_loop(
        0, CHUNK, body,
        (st_ref[0], st_ref[1], st_ref[2], st_ref[3], st_ref[4],
         buf_ref[...]))
    st_ref[0] = low
    st_ref[1] = rng
    st_ref[2] = nbits
    st_ref[3] = flushed
    st_ref[4] = k
    buf_ref[...] = buf

    @pl.when(g == pl.num_programs(0) - 1)
    def _finalize():
        # flush the partial last row + publish the final state
        @pl.when(k % LANES != 0)
        def _tail_row():
            chunks_ref[pl.dslice((k // LANES) * 8, 8), :] = buf

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
    rows = (2 * n + 64 + LANES - 1) // LANES   # <= 2 chunks/symbol
    # pad with neutral symbols (fl=TOP, fh=0, cu=cv=0): u = rng,
    # v = 0 -> low and rng unchanged, d = 0 — a coder no-op
    n_pad = (n + CHUNK - 1) // CHUNK * CHUNK
    irt = np.zeros((4, n_pad), np.int32)
    irt[0, n:] = PROB_TOP
    irt[:, :n] = np.asarray(ir, np.int32).T
    fn = pl.pallas_call(
        _pack_kernel,
        grid=(n_pad // CHUNK,),
        in_specs=[pl.BlockSpec((4, CHUNK), lambda g: (0, g),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((rows * 8, 128), lambda g: (0, 0)),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((rows * 8, 128), jnp.int32),
                   jax.ShapeDtypeStruct((8,), jnp.int32)),
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.int32)],
        interpret=interpret,
    )
    chunks, state = fn(jnp.asarray(irt))
    chunks = np.asarray(chunks).reshape(-1)
    low, nbits, flushed, k = (int(x) for x in np.asarray(state)[:4])
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
