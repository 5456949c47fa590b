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


def cdef_filter_frame_jax(planes, skip8, y_pri, y_sec, uv_pri, uv_sec,
                          damping):
    """JAX CDEF over [y, u, v] int32 planes. skip8 [h/8, w/8] bool.

    Plane-space formulation: every tap is a static shifted slice of
    the padded plane selected per-pixel by the 8x8-block direction —
    no per-block gathers. d_eff = 0 when pri == 0 (spec: the clamp
    window still uses the primary taps of direction 0)."""
    dg, vg = _dirs_var(planes[0])

    def fp(plane, n, pri, sec, is_luma):
        deff = jnp.where(pri > 0, dg, 0)
        pp = _prep_plane(plane, _upsample(deff, n), n, is_luma)
        return _filter_from_prep(
            pp, _upsample(skip8, n), pri, sec, damping,
            _upsample(vg, n) if is_luma else None)

    return [fp(planes[0], 8, y_pri, y_sec, True),
            fp(planes[1], 4, uv_pri, uv_sec, False),
            fp(planes[2], 4, uv_pri, uv_sec, False)]


# secondary strengths must be in {0, 1, 2, 4} (spec 2-bit code, 3->4)
CDEF_LADDER = [
    (0, 0, 0, 0), (1, 0, 1, 0), (2, 1, 1, 0), (3, 1, 2, 1),
    (5, 2, 4, 1), (7, 2, 5, 2), (10, 2, 8, 2), (14, 4, 12, 4),
]


def compact_ladder(cdef_map):
    """Compress the frame's signaled strength set to the ladder
    entries its SBs actually chose (rav1e signals nb_strengths the
    same way): the full 8-entry set costs ~12 header bytes + 3
    bits/SB — real rate on small frames. Returns (strengths list,
    cdef_bits, remapped per-SB map)."""
    used = np.unique(np.asarray(cdef_map))
    bits = int(np.ceil(np.log2(len(used)))) if len(used) > 1 else 0
    lut = np.zeros(len(CDEF_LADDER), np.uint8)
    for i, u in enumerate(used):
        lut[int(u)] = i
    strengths = [tuple(CDEF_LADDER[int(u)]) for u in used]
    while len(strengths) < (1 << bits):
        strengths.append(strengths[-1])
    return strengths, bits, lut[np.asarray(cdef_map)]


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


@lru_cache(maxsize=None)
def _shift_tables():
    """Per-direction tap offsets: primary [8][4], secondary [8][8]
    (dy, dx) — slot order: (k0,+),(k0,-),(k1,+),
    (k1,-) primary; ((d+2,k),±),((d-2,k),±) per k secondary."""
    pri = [[None] * 4 for _ in range(8)]
    sec = [[None] * 8 for _ in range(8)]
    for d in range(8):
        t = 0
        for k in range(2):
            dy, dx = CDEF_DIRECTIONS[d][k]
            for sgn in (1, -1):
                pri[d][t] = (sgn * dy, sgn * dx)
                t += 1
        t = 0
        for k in range(2):
            for d2 in ((d + 2) & 7, (d - 2) & 7):
                dy, dx = CDEF_DIRECTIONS[d2][k]
                for sgn in (1, -1):
                    sec[d][t] = (sgn * dy, sgn * dx)
                    t += 1
    return pri, sec


def _prep_plane(plane, dirs_pix, n, is_luma):
    """Candidate-independent part of the CDEF filter, in PLANE space:
    tap values as static shifted slices of the padded plane selected
    per-pixel by direction — no gathers (the per-block dynamic_slice /
    take_along_axis formulation profiled at ~750 ms/frame at 1080p;
    this one is pure VPU shifts+selects).

    dirs_pix [h, w] int32: luma-block direction upsampled to this
    plane's pixels. d_eff == dirs for every non-identity ladder entry
    (pri > 0); the identity entry's output is discarded by `active`."""
    h, w = plane.shape
    x = plane.astype(jnp.int32)
    P = jnp.pad(x, 2, constant_values=LARGE)
    pri_off, sec_off = _shift_tables()

    def shifted(dy, dx):
        return jax.lax.slice(P, (2 + dy, 2 + dx), (2 + dy + h, 2 + dx + w))

    def select(offsets_per_dir):
        acc = jnp.zeros((h, w), jnp.int32)
        for d in range(8):
            dy, dx = offsets_per_dir[d]
            acc = acc + jnp.where(dirs_pix == d, shifted(dy, dx), 0)
        return acc

    p_pri = [select([pri_off[d][t] for d in range(8)])
             for t in range(4)]
    p_sec = [select([sec_off[d][t] for d in range(8)])
             for t in range(8)]
    return dict(x=x, p_pri=p_pri, p_sec=p_sec, n=n, is_luma=is_luma,
                dtype=plane.dtype)


def _filter_from_prep(pp, skip_pix, pri, sec, damping, var_pix,
                      coeff_shift: int = 0):
    """Apply one (pri, sec) strength pair from precomputed tap planes.
    Elementwise twin of ops.ref.cdef's filter tail — identical
    arithmetic. Strengths/damping arrive PRE-scaled for bd > 8
    (strength << coeff_shift, damping + coeff_shift); the tap-parity
    select uses the unscaled strength (spec Cdef_Pri_Taps index
    (priStr >> CoeffShift) & 1).
    skip_pix / var_pix are per-pixel maps on this plane's grid."""
    x = pp["x"]
    if pp["is_luma"]:
        vs = jnp.where((var_pix >> 6) > 0,
                       jnp.minimum(_msb(var_pix >> 6), 12), 0)
        pri_adj = jnp.where(var_pix > 0, (pri * (4 + vs) + 8) >> 4, 0)
    else:
        pri_adj = jnp.full(x.shape, pri, jnp.int32)
    pdamp = damping if pp["is_luma"] else damping - 1
    # taps by strength parity as a select, not a per-pixel gather (the
    # [2]-table gather cost ~155 ms/frame at 1080p under the 8-way
    # candidate vmap)
    parity = (pri_adj >> coeff_shift) & 1
    tap_a = jnp.where(parity == 0, PRI_TAPS[0][0], PRI_TAPS[1][0])
    tap_b = jnp.where(parity == 0, PRI_TAPS[0][1], PRI_TAPS[1][1])
    pri_taps = [tap_a, tap_a, tap_b, tap_b]
    s = jnp.zeros_like(x)
    mx = x
    mn = x
    for t in range(4):
        p = pp["p_pri"][t]
        valid = p != LARGE
        c = _constrain(p - x, pri_adj, pdamp)
        s = s + jnp.where(valid, pri_taps[t] * c, 0)
        mx = jnp.where(valid, jnp.maximum(mx, p), mx)
        mn = jnp.where(valid, jnp.minimum(mn, p), mn)
    for t in range(8):
        p = pp["p_sec"][t]
        valid = (p != LARGE) & (sec > 0)
        c = _constrain(p - x, sec, pdamp)
        s = s + jnp.where(valid, SEC_TAPS[t // 4] * c, 0)
        mx = jnp.where(valid, jnp.maximum(mx, p), mx)
        mn = jnp.where(valid, jnp.minimum(mn, p), mn)
    y = x + ((8 + s - (s < 0)) >> 4)
    y = jnp.clip(y, mn, mx)
    active = (~skip_pix) & ((pri_adj > 0) | (sec > 0))
    y = jnp.where(active, y, x)
    return y.astype(pp["dtype"])


def _upsample(grid, n):
    return jnp.repeat(jnp.repeat(grid, n, axis=0), n, axis=1)


def _dirs_var(y):
    """Direction/variance per 8x8 luma block, as [h/8, w/8] grids."""
    h, w = y.shape
    yb = (y.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
          .reshape(-1, 8, 8).astype(jnp.int32))
    dirs, var = cdef_directions_jax(yb)
    return dirs.reshape(h // 8, w // 8), var.reshape(h // 8, w // 8)


def cdef_search_persb_jax(planes, srcs, skip8, damping, lam=None,
                          bd: int = 8):
    """Per-64x64-SB CDEF strength-index RDO over the 8-entry ladder
    (rav1e rdo_loop_decision's per-SB index into the frame's strength
    presets, cdef_bits = 3). Direction analysis and the per-direction
    tap selection run ONCE (plane-space static shifts, no gathers);
    the 8 candidates only redo the elementwise constrain/weight math.
    Each SB picks its SSE-argmin entry.

    lam (traced float, optional) enables rav1e-style nb_strengths RD:
    the signaled set is restricted to the {1,2,4,8}-entry subset that
    minimizes total SSE + λ·(12 bits/entry + cdef_bits/SB) — the full
    8-entry ladder costs ~96 header bits + 3 bits per SB, real rate
    on small frames and easy content (rav1e cdef_dist search over
    nb_strengths, src/cdef.rs::rdo_loop_decision).
    Returns (idx_sb [ceil(H/64), ceil(W/64)] int32, planes).

    bd > 8: spec 7.15.3 CoeffShift — directions/variance run on the
    8-bit-shifted samples, the (8-bit-scale) header strengths scale
    by << shift and the damping by + shift at filter time."""
    shift = bd - 8
    y = planes[0]
    h, w = y.shape
    dg, vg = _dirs_var(y >> shift if shift else y)
    pp_y = _prep_plane(y, _upsample(dg, 8), 8, True)
    pp_u = _prep_plane(planes[1], _upsample(dg, 4), 4, False)
    pp_v = _prep_plane(planes[2], _upsample(dg, 4), 4, False)
    var_y = _upsample(vg, 8)
    skip_y = _upsample(skip8, 8)
    skip_c = _upsample(skip8, 4)
    damp = damping + shift

    cand = jnp.asarray(np.array(CDEF_LADDER, np.int32))
    nby, nbx = h // 32, w // 32
    nr, nc = (nby + 1) // 2, (nbx + 1) // 2
    K = len(CDEF_LADDER)
    # 64-aligned frames rank the ladder on a 2-of-4 checkerboard of
    # each SB's 32-blocks (TL + BR) and apply only the winner — 8
    # full-frame filter passes become 8 half passes + 1 apply (the
    # 8-way full evaluation was ~23 ms of the 1080p P step). The
    # filter tail is purely elementwise over the prep planes, so the
    # sampled views are free reshapes.
    sampled = (h % 64 == 0 and w % 64 == 0
               and planes[1].shape[0] * 2 == h)

    def diag(a, b):
        v = a.reshape(nr, 2, b, nc, 2, b)
        return jnp.stack([v[:, 0, :, :, 0, :], v[:, 1, :, :, 1, :]], 0)

    if sampled:
        pp_ys = {**pp_y, "x": diag(pp_y["x"], 32),
                 "p_pri": [diag(p, 32) for p in pp_y["p_pri"]],
                 "p_sec": [diag(p, 32) for p in pp_y["p_sec"]]}
        pp_us = {**pp_u, "x": diag(pp_u["x"], 16),
                 "p_pri": [diag(p, 16) for p in pp_u["p_pri"]],
                 "p_sec": [diag(p, 16) for p in pp_u["p_sec"]]}
        pp_vs = {**pp_v, "x": diag(pp_v["x"], 16),
                 "p_pri": [diag(p, 16) for p in pp_v["p_pri"]],
                 "p_sec": [diag(p, 16) for p in pp_v["p_sec"]]}
        skip_ys, skip_cs = diag(skip_y, 32), diag(skip_c, 16)
        var_ys = diag(var_y, 32)
        src_ys, src_us, src_vs = (diag(srcs[0], 32), diag(srcs[1], 16),
                                  diag(srcs[2], 16))

        def one_s(c):
            return [_filter_from_prep(pp_ys, skip_ys, c[0] << shift,
                                      c[1] << shift, damp, var_ys,
                                      coeff_shift=shift),
                    _filter_from_prep(pp_us, skip_cs, c[2] << shift,
                                      c[3] << shift, damp, None,
                                      coeff_shift=shift),
                    _filter_from_prep(pp_vs, skip_cs, c[2] << shift,
                                      c[3] << shift, damp, None,
                                      coeff_shift=shift)]

        outs_s = jax.vmap(one_s)(cand)   # [K, 2, nr, b, nc, b] each

        def samp_sse(out, src):
            d = (out - src[None]).astype(jnp.float32) ** 2
            return d.sum((1, 3, 5))      # [K, nr, nc]

        # x2: half the pixels stand for the SB (keeps the λ scale of
        # the nb_strengths subset RD comparable to the full search)
        sse_sb = 2.0 * (samp_sse(outs_s[0], src_ys)
                        + samp_sse(outs_s[1], src_us)
                        + samp_sse(outs_s[2], src_vs))
    else:
        def one(c):
            return [_filter_from_prep(pp_y, skip_y, c[0] << shift,
                                      c[1] << shift, damp, var_y,
                                      coeff_shift=shift),
                    _filter_from_prep(pp_u, skip_c, c[2] << shift,
                                      c[3] << shift, damp, None,
                                      coeff_shift=shift),
                    _filter_from_prep(pp_v, skip_c, c[2] << shift,
                                      c[3] << shift, damp, None,
                                      coeff_shift=shift)]

        outs = jax.vmap(one)(cand)          # [8, ...] per plane

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
    if lam is not None:
        # nb_strengths RD: enumerate every 1/2/4/8-entry subset of the
        # ladder as a static mask matrix; each SB takes the min inside
        # the subset, plus λ·(header entry bits + per-SB index bits)
        from itertools import combinations
        masks, bits = [], []
        for n in (1, 2, 4, 8):
            for sub in combinations(range(K), n):
                m = np.zeros(K, bool)
                m[list(sub)] = True
                masks.append(m)
                bits.append(12.0 * n + float(nr * nc)
                            * (0 if n == 1 else np.log2(n)))
        masks = jnp.asarray(np.array(masks))           # [S, K]
        bits = jnp.asarray(np.array(bits, np.float32))  # [S]
        flat = sse_sb.reshape(K, nr * nc)
        msse = jnp.where(masks[:, :, None], flat[None], jnp.inf)
        tot = msse.min(1).sum(1) + lam * bits           # [S]
        best = jnp.argmin(tot)
        allowed = masks[best]                           # [K]
        sse_sb = jnp.where(allowed[:, None, None], sse_sb, jnp.inf)
    idx = jnp.argmin(sse_sb, axis=0)               # [nr, nc]
    if sampled:
        # single full-frame apply with per-pixel strengths from the
        # winning ladder entries (pri_adj/parity/constrain all take
        # per-pixel arrays)
        py = _upsample(cand[:, 0][idx], 64)[:h, :w] << shift
        sy = _upsample(cand[:, 1][idx], 64)[:h, :w] << shift
        pc_ = _upsample(cand[:, 2][idx], 32)[:h // 2, :w // 2] << shift
        sc_ = _upsample(cand[:, 3][idx], 32)[:h // 2, :w // 2] << shift
        return idx, [
            _filter_from_prep(pp_y, skip_y, py, sy, damp, var_y,
                              coeff_shift=shift),
            _filter_from_prep(pp_u, skip_c, pc_, sc_, damp, None,
                              coeff_shift=shift),
            _filter_from_prep(pp_v, skip_c, pc_, sc_, damp, None,
                              coeff_shift=shift)]
    idx32 = jnp.repeat(jnp.repeat(idx, 2, 0), 2, 1)[:nby, :nbx]

    def assemble(out, b):
        blk = out.reshape(K, nby, b, nbx, b)
        sel = jnp.take_along_axis(
            blk, idx32[None, :, None, :, None], axis=0)[0]
        return sel.reshape(nby * b, nbx * b)

    return idx, [assemble(outs[0], 32), assemble(outs[1], 16),
                 assemble(outs[2], 16)]


def cdef_search_persb_tiled(planes, srcs, skip8, damping, axis_name,
                            T: int, tile_idx, lam=None, bd: int = 8):
    """cdef_search_persb_jax inside a shard_map tile column.

    CDEF crosses tile boundaries (spec 7.15: it runs on the
    deblocked frame, not per tile), so each shard extends its column
    slice with an 8-px pixel halo from its neighbors via ONE ppermute
    per side; frame-edge columns read the LARGE sentinel (same as the
    unsharded search's frame border). The nb_strengths subset RD sums
    its per-subset totals with a psum so every shard signals the
    identical ladder; per-SB indices stay local. On T=1 the halos are
    both sentinels — byte-identical to the unsharded search."""
    E = 8                        # luma halo (8x8-dir aligned)
    shift = bd - 8
    perm_r = [(i, i + 1) for i in range(T - 1)]
    perm_l = [(i + 1, i) for i in range(T - 1)]

    def halo_ext(x, e, fill):
        left = jax.lax.ppermute(x[:, -e:], axis_name, perm_r)
        right = jax.lax.ppermute(x[:, :e], axis_name, perm_l)
        left = jnp.where(tile_idx == 0, fill, left)
        right = jnp.where(tile_idx == T - 1, fill, right)
        return jnp.concatenate([left, x, right], axis=1)

    ye = halo_ext(planes[0].astype(jnp.int32), E, LARGE)
    ue = halo_ext(planes[1].astype(jnp.int32), E // 2, LARGE)
    ve = halo_ext(planes[2].astype(jnp.int32), E // 2, LARGE)
    # halo skip state is irrelevant (outputs crop to the center)
    sk = jnp.pad(skip8, ((0, 0), (E // 8, E // 8)))
    h, w = planes[0].shape
    # the dir search must not see the sentinel as pixel data: clamp
    # the halo into pixel range for the direction pass only
    y_dir = jnp.clip(ye, 0, (1 << bd) - 1)
    dg, vg = _dirs_var(y_dir >> shift if shift else y_dir)
    pp_y = _prep_plane(ye, _upsample(dg, 8), 8, True)
    pp_u = _prep_plane(ue, _upsample(dg, 4), 4, False)
    pp_v = _prep_plane(ve, _upsample(dg, 4), 4, False)
    var_y = _upsample(vg, 8)
    skip_y = _upsample(sk, 8)
    skip_c = _upsample(sk, 4)
    damp = damping + shift

    def one(c):
        return [_filter_from_prep(pp_y, skip_y, c[0] << shift,
                                  c[1] << shift, damp, var_y,
                                  coeff_shift=shift),
                _filter_from_prep(pp_u, skip_c, c[2] << shift,
                                  c[3] << shift, damp, None,
                                  coeff_shift=shift),
                _filter_from_prep(pp_v, skip_c, c[2] << shift,
                                  c[3] << shift, damp, None,
                                  coeff_shift=shift)]

    cand = jnp.asarray(np.array(CDEF_LADDER, np.int32))
    outs = jax.vmap(one)(cand)
    # crop to the tile's own columns
    outs = [outs[0][:, :, E:-E], outs[1][:, :, E // 2:-E // 2],
            outs[2][:, :, E // 2:-E // 2]]
    nby, nbx = h // 32, w // 32
    nr, nc = (nby + 1) // 2, (nbx + 1) // 2
    K = len(CDEF_LADDER)

    def blk_sse(out, src, b):
        d = (out - src[None]).astype(jnp.float32) ** 2
        return d.reshape(K, nby, b, nbx, b).sum((2, 4))

    sse32 = (blk_sse(outs[0], srcs[0], 32)
             + blk_sse(outs[1], srcs[1], 16)
             + blk_sse(outs[2], srcs[2], 16))
    ssep = jnp.pad(sse32, ((0, 0), (0, nr * 2 - nby),
                           (0, nc * 2 - nbx)))
    sse_sb = ssep.reshape(K, nr, 2, nc, 2).sum((2, 4))
    if lam is not None:
        from itertools import combinations
        masks, bits = [], []
        n_sb_frame = nr * nc * T
        for n in (1, 2, 4, 8):
            for sub in combinations(range(K), n):
                m = np.zeros(K, bool)
                m[list(sub)] = True
                masks.append(m)
                bits.append(12.0 * n + float(n_sb_frame)
                            * (0 if n == 1 else np.log2(n)))
        masks = jnp.asarray(np.array(masks))
        bits = jnp.asarray(np.array(bits, np.float32))
        flat = sse_sb.reshape(K, nr * nc)
        msse = jnp.where(masks[:, :, None], flat[None], jnp.inf)
        # frame-global subset totals: psum the per-shard sums so every
        # tile picks the same allowed set
        tot = jax.lax.psum(msse.min(1).sum(1), axis_name) + lam * bits
        best = jnp.argmin(tot)
        allowed = masks[best]
        sse_sb = jnp.where(allowed[:, None, None], sse_sb, jnp.inf)
    idx = jnp.argmin(sse_sb, axis=0)
    idx32 = jnp.repeat(jnp.repeat(idx, 2, 0), 2, 1)[:nby, :nbx]

    def assemble(out, b):
        blk = out.reshape(K, nby, b, nbx, b)
        sel = jnp.take_along_axis(
            blk, idx32[None, :, None, :, None], axis=0)[0]
        return sel.reshape(nby * b, nbx * b)

    return idx, [assemble(outs[0], 32), assemble(outs[1], 16),
                 assemble(outs[2], 16)]
