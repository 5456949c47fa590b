"""CDEF filtering as a Pallas TPU kernel.

The XLA formulation (ops/tpu/cdef.py) materializes 12 direction-
selected tap planes in HBM and re-reads them for every strength
candidate — ~25 plane-sized HBM round trips per plane per search.
This kernel keeps one row-slab of the padded plane in VMEM and
produces ALL ladder candidates for the slab in a single pass: the
taps are built once from VMEM shifts and only the cheap
constrain/weight math runs per candidate, so HBM traffic drops to
one read of the plane + one write per candidate.

Bit-exact twin of ops/tpu/cdef._filter_from_prep (same integer
arithmetic; validated against it in tests, and transitively against
ops/ref/cdef + the dav1d/libaom oracles).

Layout: grid over row-tiles of TILE rows. Inputs are the LARGE-padded
plane (pad 2), the per-pixel direction / variance / skip maps, and the
ladder strengths as SMEM scalars. The halo rows come in for free by
passing overlapping row windows of the padded plane via the index_map
(block r covers padded rows [r*TILE, r*TILE + TILE + 4))."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rav1e_tpu.ops.ref.cdef import LARGE, PRI_TAPS, SEC_TAPS
from rav1e_tpu.ops.tpu.cdef import CDEF_LADDER, _shift_tables

TILE = 8          # rows per grid step (one 8x8 CDEF block row)


def _msb_i(x):
    # integer msb via float log2 (same as ops/tpu/cdef._msb)
    return jnp.floor(
        jnp.log2(jnp.maximum(x, 1).astype(jnp.float32))).astype(jnp.int32)


def _constrain_i(diff, strength, damping):
    adj = jnp.maximum(0, damping - _msb_i(strength))
    a = jnp.abs(diff)
    lim = jnp.maximum(0, strength - (a >> adj))
    out = jnp.sign(diff) * jnp.minimum(a, lim)
    return jnp.where(strength > 0, out, 0)


def _kernel(prm_ref, pad_hbm, dir_ref, var_ref, skip_ref, out_ref,
            *, n_cand, is_luma, w):
    """One row-tile: compute every ladder candidate's filtered rows.

    prm_ref: [n_cand+1, 2] (pri, sec) rows + damping at row n_cand.
    pad_hbm: the full padded plane (stays off-chip; the tile's
    TILE+4-row slab is DMA'd into VMEM with its halo — BlockSpec can't
    express overlapping windows). dir/var/skip: [TILE, w] maps.
    out_ref: [n_cand, TILE, w]."""
    r = pl.program_id(0)

    def body(pad_ref, sem):
        cp = pltpu.make_async_copy(
            pad_hbm.at[pl.ds(r * TILE, TILE + 4), :], pad_ref, sem)
        cp.start()
        cp.wait()
        _compute(prm_ref, pad_ref, dir_ref, var_ref, skip_ref,
                 out_ref, n_cand=n_cand, is_luma=is_luma, w=w)

    pl.run_scoped(
        body,
        pad_ref=pltpu.VMEM((TILE + 4, w + 4), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _compute(prm_ref, pad_ref, dir_ref, var_ref, skip_ref, out_ref,
             *, n_cand, is_luma, w):
    x = pad_ref[2:2 + TILE, 2:2 + w]
    dirs = dir_ref[...]
    var = var_ref[...]
    skip = skip_ref[...]
    damping = prm_ref[n_cand, 0]
    pdamp = damping if is_luma else damping - 1

    pri_off, sec_off = _shift_tables()

    def shifted(dy, dx):
        return pad_ref[2 + dy:2 + dy + TILE, 2 + dx:2 + dx + w]

    def select(offs):
        acc = jnp.zeros((TILE, w), jnp.int32)
        for d in range(8):
            dy, dx = offs[d]
            acc = acc + jnp.where(dirs == d, shifted(dy, dx), 0)
        return acc

    p_pri = [select([pri_off[d][t] for d in range(8)])
             for t in range(4)]
    p_sec = [select([sec_off[d][t] for d in range(8)])
             for t in range(8)]

    for k in range(n_cand):
        pri = prm_ref[k, 0]
        sec = prm_ref[k, 1]
        if is_luma:
            vs = jnp.where((var >> 6) > 0,
                           jnp.minimum(_msb_i(var >> 6), 12), 0)
            pri_adj = jnp.where(var > 0, (pri * (4 + vs) + 8) >> 4, 0)
        else:
            pri_adj = jnp.full((TILE, w), pri, jnp.int32)
        parity = pri_adj & 1
        tap_a = jnp.where(parity == 0, PRI_TAPS[0][0], PRI_TAPS[1][0])
        tap_b = jnp.where(parity == 0, PRI_TAPS[0][1], PRI_TAPS[1][1])
        pri_taps = [tap_a, tap_a, tap_b, tap_b]
        s = jnp.zeros((TILE, w), jnp.int32)
        mx = x
        mn = x
        for t in range(4):
            p = p_pri[t]
            valid = p != LARGE
            cc = _constrain_i(p - x, pri_adj, pdamp)
            s = s + jnp.where(valid, pri_taps[t] * cc, 0)
            mx = jnp.where(valid, jnp.maximum(mx, p), mx)
            mn = jnp.where(valid, jnp.minimum(mn, p), mn)
        for t in range(8):
            p = p_sec[t]
            valid = (p != LARGE) & (sec > 0)
            cc = _constrain_i(p - x, sec, pdamp)
            s = s + jnp.where(valid, SEC_TAPS[t // 4] * cc, 0)
            mx = jnp.where(valid, jnp.maximum(mx, p), mx)
            mn = jnp.where(valid, jnp.minimum(mn, p), mn)
        y = x + ((8 + s - (s < 0)) >> 4)
        y = jnp.clip(y, mn, mx)
        active = (~skip) & ((pri_adj > 0) | (sec > 0))
        out_ref[k] = jnp.where(active, y, x)


@partial(jax.jit, static_argnames=("is_luma", "interpret"))
def cdef_candidates_pallas(plane, dirs_pix, var_pix, skip_pix,
                           damping, is_luma: bool = True,
                           interpret: bool = False):
    """All CDEF_LADDER candidates for one plane: [K, H, W] int32.

    plane/dirs/var/skip: [H, W] int32/bool maps (dirs/var upsampled
    from the 8x8 luma blocks; var ignored for chroma). damping:
    traced int32 scalar."""
    h, w = plane.shape
    assert h % TILE == 0, (h, TILE)
    K = len(CDEF_LADDER)
    pad = jnp.pad(plane.astype(jnp.int32), 2, constant_values=LARGE)
    if is_luma:
        prm = [(c[0], c[1]) for c in CDEF_LADDER]
    else:
        prm = [(c[2], c[3]) for c in CDEF_LADDER]
    prm = jnp.asarray(np.array(prm + [(0, 0)], np.int32))
    prm = prm.at[K, 0].set(damping)
    var_in = (var_pix if is_luma
              else jnp.zeros_like(plane)).astype(jnp.int32)
    grid = (h // TILE,)
    return pl.pallas_call(
        partial(_kernel, n_cand=K, is_luma=is_luma, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K + 1, 2), lambda r: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE, w), lambda r: (r, 0)),
            pl.BlockSpec((TILE, w), lambda r: (r, 0)),
            pl.BlockSpec((TILE, w), lambda r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((K, TILE, w), lambda r: (0, r, 0)),
        out_shape=jax.ShapeDtypeStruct((K, h, w), jnp.int32),
        interpret=interpret,
    )(prm, pad, dirs_pix.astype(jnp.int32), var_in,
      skip_pix.astype(jnp.bool_))
