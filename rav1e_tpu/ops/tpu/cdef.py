"""Batched CDEF on TPU (bit-exact port of ops.ref.cdef).

Every 8x8 (luma) / 4x4 (chroma) block filters independently, so the
whole frame batches: direction search as one one-hot matmul (MXU),
taps as per-block gathers selected by direction. Strengths/damping are
traced scalars - per-frame changes never recompile.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.ops.ref.cdef import (
    CDEF_DIRECTIONS,
    DIV_TABLE,
    LARGE,
    PRI_TAPS,
    SEC_TAPS,
)


@lru_cache(maxsize=None)
def _dir_matrices():
    """One-hot [64, nbins] matrices + weight vectors per direction."""
    ii = np.arange(8)[:, None] + np.zeros(8, np.int64)[None, :]
    jj = np.zeros(8, np.int64)[:, None] + np.arange(8)[None, :]
    bins = [ii + jj, ii + (jj >> 1), ii, 3 + ii - (jj >> 1), 7 + ii - jj,
            3 - (ii >> 1) + jj, jj, (ii >> 1) + jj]
    mats, wts = [], []
    for b in bins:
        b = b.ravel()
        n = int(b.max()) + 1
        m = np.zeros((64, n), np.float32)
        m[np.arange(64), b] = 1.0
        cnt = m.sum(axis=0).astype(np.int64)
        mats.append(m)
        wts.append(np.asarray(DIV_TABLE)[cnt].astype(np.float32))
    return mats, wts


@lru_cache(maxsize=None)
def _tap_tables(n: int):
    """Per-direction tap index tables into a flattened (n+4)x(n+4)
    patch: primary [8][4][n*n], secondary [8][8][n*n]."""
    span = n + 4
    base_r = np.arange(n)[:, None] + 2
    base_c = np.arange(n)[None, :] + 2
    pri = np.zeros((8, 4, n * n), np.int32)
    sec = np.zeros((8, 8, n * n), np.int32)
    for d in range(8):
        t = 0
        for k in range(2):
            dy, dx = CDEF_DIRECTIONS[d][k]
            for sgn in (1, -1):
                pri[d, t] = ((base_r + sgn * dy) * span
                             + base_c + sgn * dx).ravel()
                t += 1
        t = 0
        for k in range(2):
            for d2 in ((d + 2) & 7, (d - 2) & 7):
                dy, dx = CDEF_DIRECTIONS[d2][k]
                for sgn in (1, -1):
                    sec[d, t] = ((base_r + sgn * dy) * span
                                 + base_c + sgn * dx).ravel()
                    t += 1
    return pri, sec  # numpy (converted per-trace at the use site)


def _msb(x):
    return jnp.floor(jnp.log2(jnp.maximum(x, 1).astype(jnp.float32))
                     ).astype(jnp.int32)


def _constrain(diff, strength, damping):
    adj = jnp.maximum(0, damping - _msb(strength))
    a = jnp.abs(diff)
    lim = jnp.maximum(0, strength - (a >> adj))
    out = jnp.sign(diff) * jnp.minimum(a, lim)
    return jnp.where(strength > 0, out, 0)


def cdef_directions_jax(yblks):
    """yblks [B,8,8] int32 -> (dir [B], var [B]).

    Costs reach ~2^34, past float32 exactness and int32 range, so each
    direction's cost is kept as two int32 limbs (hi = cost >> 15,
    lo = cost & 32767); argmax and the variance are computed exactly
    from the limbs (spec keeps the first maximum on ties)."""
    mats, wts = _dir_matrices()
    x = (yblks.reshape(-1, 64) - 128).astype(jnp.float32)
    his, los = [], []
    for d in range(8):
        part = (x @ jnp.asarray(mats[d])).astype(jnp.int32)  # exact
        terms = part * part * jnp.asarray(wts[d], jnp.int32)  # < 2^31
        hi = jnp.sum(terms >> 15, axis=1)
        lo = jnp.sum(terms & 32767, axis=1)
        hi = hi + (lo >> 15)
        lo = lo & 32767
        his.append(hi)
        los.append(lo)
    best = jnp.zeros(x.shape[0], jnp.int32)
    bh, bl = his[0], los[0]
    for d in range(1, 8):
        gt = (his[d] > bh) | ((his[d] == bh) & (los[d] > bl))
        best = jnp.where(gt, d, best)
        bh = jnp.where(gt, his[d], bh)
        bl = jnp.where(gt, los[d], bl)
    hi_s = jnp.stack(his, 1)
    lo_s = jnp.stack(los, 1)
    opp = (best + 4) % 8
    oh = jnp.take_along_axis(hi_s, opp[:, None], 1)[:, 0]
    ol = jnp.take_along_axis(lo_s, opp[:, None], 1)[:, 0]
    # var = (cost_best - cost_opp) >> 10, exactly from limbs
    var = (bh - oh) * 32 + ((bl - ol) >> 10)
    return best, var.astype(jnp.int32)


def _filter_plane(plane, skip8, pri, sec, damping, dirs, var, n,
                  is_luma):
    """Filter one plane; blocks of size n, dirs/var [B] from luma."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    B = nby * nbx
    P = jnp.pad(plane.astype(jnp.int32), 2, constant_values=LARGE)
    by = jnp.asarray((np.repeat(np.arange(nby), nbx) * n).astype(np.int32))
    bx = jnp.asarray((np.tile(np.arange(nbx), nby) * n).astype(np.int32))

    def patch_one(r0, c0):
        return jax.lax.dynamic_slice(P, (r0, c0), (n + 4, n + 4))

    patch = jax.vmap(patch_one)(by, bx).reshape(B, -1)  # [B,(n+4)^2]
    x = patch.reshape(B, n + 4, n + 4)[:, 2:2 + n, 2:2 + n] \
        .reshape(B, n * n).astype(jnp.int32)
    pri_np, sec_np = _tap_tables(n)
    pri_t, sec_t = jnp.asarray(pri_np), jnp.asarray(sec_np)
    # per-plane primary strength / dir handling
    if is_luma:
        vs = jnp.where((var >> 6) > 0,
                       jnp.minimum(_msb(var >> 6), 12), 0)
        pri_adj = jnp.where(var > 0, (pri * (4 + vs) + 8) >> 4, 0)
        d_eff = jnp.where(pri > 0, dirs, 0)
    else:
        pri_adj = jnp.full(dirs.shape, pri, jnp.int32)
        d_eff = jnp.where(pri > 0, dirs, 0)
    pdamp = damping if is_luma else damping - 1
    taps0 = jnp.asarray([t[0] for t in PRI_TAPS])
    taps1 = jnp.asarray([t[1] for t in PRI_TAPS])
    parity = pri_adj & 1
    # tap order in _tap_tables: (k0,+), (k0,-), (k1,+), (k1,-)
    pri_taps = jnp.stack([taps0[parity], taps0[parity],
                          taps1[parity], taps1[parity]], 1)  # [B,4]
    s = jnp.zeros((B, n * n), jnp.int32)
    mx = x
    mn = x
    pidx = pri_t[d_eff]                           # [B, 4, n*n]
    for t in range(4):
        p = jnp.take_along_axis(patch, pidx[:, t], 1).astype(jnp.int32)
        valid = p != LARGE
        c = _constrain(p - x, pri_adj[:, None], pdamp)
        s = s + jnp.where(valid, pri_taps[:, t, None] * c, 0)
        mx = jnp.where(valid, jnp.maximum(mx, p), mx)
        mn = jnp.where(valid, jnp.minimum(mn, p), mn)
    sidx = sec_t[d_eff]                           # [B, 8, n*n]
    for t in range(8):
        p = jnp.take_along_axis(patch, sidx[:, t], 1).astype(jnp.int32)
        valid = (p != LARGE) & (sec > 0)
        c = _constrain(p - x, sec, pdamp)
        s = s + jnp.where(valid, SEC_TAPS[t // 4] * c, 0)
        mx = jnp.where(valid, jnp.maximum(mx, p), mx)
        mn = jnp.where(valid, jnp.minimum(mn, p), mn)
    y = x + ((8 + s - (s < 0)) >> 4)
    y = jnp.clip(y, mn, mx)
    active = (~skip8.reshape(B)) & ((pri_adj > 0) | (sec > 0))
    y = jnp.where(active[:, None], y, x)
    out = y.reshape(nby, nbx, n, n).transpose(0, 2, 1, 3).reshape(h, w)
    return out.astype(plane.dtype)


def cdef_filter_frame_jax(planes, skip8, y_pri, y_sec, uv_pri, uv_sec,
                          damping):
    """JAX CDEF over [y, u, v] int32 planes. skip8 [h/8, w/8] bool."""
    y = planes[0]
    h, w = y.shape
    yb = (y.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
          .reshape(-1, 8, 8).astype(jnp.int32))
    dirs, var = cdef_directions_jax(yb)
    out_y = _filter_plane(y, skip8, y_pri, y_sec, damping, dirs, var,
                          8, True)
    out_u = _filter_plane(planes[1], skip8, uv_pri, uv_sec, damping,
                          dirs, var, 4, False)
    out_v = _filter_plane(planes[2], skip8, uv_pri, uv_sec, damping,
                          dirs, var, 4, False)
    return [out_y, out_u, out_v]


# secondary strengths must be in {0, 1, 2, 4} (spec 2-bit code, 3->4)
CDEF_LADDER = [
    (0, 0, 0, 0), (1, 0, 1, 0), (2, 1, 1, 0), (3, 1, 2, 1),
    (5, 2, 4, 1), (7, 2, 5, 2), (10, 2, 8, 2), (14, 4, 12, 4),
]


def cdef_search_frame_jax(planes, srcs, skip8, damping):
    """Per-frame CDEF strength-set search (rav1e rdo_loop_decision
    restructured as a whole-frame pass, SURVEY §7.0): filter the
    post-deblock recon with each ladder entry, pick the one with the
    lowest SSE vs source. Returns (idx int32, filtered planes).

    The direction analysis runs once (it only depends on the recon);
    only the filter taps vary across candidates."""
    import numpy as np
    cand = jnp.asarray(np.array(CDEF_LADDER, np.int32))

    def one(c):
        out = cdef_filter_frame_jax(planes, skip8, c[0], c[1], c[2],
                                    c[3], damping)
        sse = sum(jnp.sum((o - s).astype(jnp.float32) ** 2)
                  for o, s in zip(out, srcs))
        return sse, out

    sses, outs = jax.vmap(one)(cand)
    k = jnp.argmin(sses)
    return k, [o[k] for o in outs]


def cdef_search_persb_jax(planes, srcs, skip8, damping):
    """Per-64x64-SB CDEF strength-index RDO over the 8-entry ladder
    (rav1e rdo_loop_decision's per-SB index into the frame's strength
    presets, cdef_bits = 3). All 8 filtered frames are computed once;
    each SB picks its SSE-argmin entry and the output is assembled by
    per-SB selection. Returns (idx_sb [H/64, W/64] int32, planes)."""
    cand = jnp.asarray(np.array(CDEF_LADDER, np.int32))

    def one(c):
        return cdef_filter_frame_jax(planes, skip8, c[0], c[1], c[2],
                                     c[3], damping)

    outs = jax.vmap(one)(cand)          # [8, ...] per plane
    h, w = planes[0].shape
    nby, nbx = h // 32, w // 32
    nr, nc = (nby + 1) // 2, (nbx + 1) // 2
    K = len(CDEF_LADDER)

    def blk_sse(out, src, b):
        d = (out - src[None]).astype(jnp.float32) ** 2
        return d.reshape(K, nby, b, nbx, b).sum((2, 4))

    sse32 = (blk_sse(outs[0], srcs[0], 32)
             + blk_sse(outs[1], srcs[1], 16)
             + blk_sse(outs[2], srcs[2], 16))      # [8, nby, nbx]
    # aggregate 32-blocks 2x2 into 64-SBs (frame need not be
    # 64-aligned: edge SBs just cover fewer 32-blocks)
    ssep = jnp.pad(sse32, ((0, 0), (0, nr * 2 - nby),
                           (0, nc * 2 - nbx)))
    sse_sb = ssep.reshape(K, nr, 2, nc, 2).sum((2, 4))
    idx = jnp.argmin(sse_sb, axis=0)               # [nr, nc]
    idx32 = jnp.repeat(jnp.repeat(idx, 2, 0), 2, 1)[:nby, :nbx]

    def assemble(out, b):
        blk = out.reshape(K, nby, b, nbx, b)
        sel = jnp.take_along_axis(
            blk, idx32[None, :, None, :, None], axis=0)[0]
        return sel.reshape(nby * b, nbx * b)

    return idx, [assemble(outs[0], 32), assemble(outs[1], 16),
                 assemble(outs[2], 16)]
