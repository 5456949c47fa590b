"""Deblocking filter on TPU (jnp twin of ops.ref.deblock).

Whole-frame batched: with a uniform TX grid (spacing >= 8) the filter
reach (±7 luma / ±3 chroma) never overlaps between edges, so ALL
vertical edges filter in one gather/compute/scatter, then all
horizontal edges — the spec's serial edge order is irrelevant here
(rav1e src/deblock.rs::deblock_filter_frame, restructured per
SURVEY §7.0 "filter searches as whole-frame passes").

Filter levels are TRACED scalars: the level search vmaps this kernel
over a candidate set with zero recompiles (deblock_filter_optimize
analog, whole-frame).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _filter_stack(p, q, limit, blimit, thresh, size, bd=8, mask=None):
    """jnp twin of ops.ref.deblock._filter_edge. p/q: [M, n] int32,
    p[:, 0] nearest the edge; limit/blimit/thresh traced int32."""
    F = 1 << (bd - 8)
    # spec 7.14.6.2: the level-derived thresholds scale with bit depth
    limit, blimit, thresh = limit * F, blimit * F, thresh * F
    p0, p1 = p[:, 0], p[:, 1]
    q0, q1 = q[:, 0], q[:, 1]
    fmask = ((jnp.abs(p1 - p0) <= limit) & (jnp.abs(q1 - q0) <= limit)
             & (jnp.abs(p0 - q0) * 2 + jnp.abs(p1 - q1) // 2 <= blimit))
    if mask is not None:
        fmask = fmask & mask
    if size >= 6:
        p2, q2 = p[:, 2], q[:, 2]
        fmask &= (jnp.abs(p2 - p1) <= limit) & (jnp.abs(q2 - q1) <= limit)
    if size >= 8:
        p3, q3 = p[:, 3], q[:, 3]
        fmask &= (jnp.abs(p3 - p2) <= limit) & (jnp.abs(q3 - q2) <= limit)
    hev = (jnp.abs(p1 - p0) > thresh) | (jnp.abs(q1 - q0) > thresh)

    off = 0x80 * F
    lo, hi = -128 * F, 128 * F - 1

    def c3(x):
        return jnp.clip(x, lo, hi)

    ps1, ps0 = p1 - off, p0 - off
    qs0, qs1 = q0 - off, q1 - off
    fil = jnp.where(hev, c3(ps1 - qs1), 0)
    fil = c3(fil + 3 * (qs0 - ps0))
    f1 = c3(fil + 4) >> 3
    f2 = c3(fil + 3) >> 3
    n_q0 = c3(qs0 - f1) + off
    n_p0 = c3(ps0 + f2) + off
    f3 = (f1 + 1) >> 1
    n_q1 = c3(qs1 - f3) + off
    n_p1 = c3(ps1 + f3) + off

    def r3(x):
        return (x + 4) >> 3

    def r4(x):
        return (x + 8) >> 4

    out_p = p
    out_q = q
    if size == 4:
        sel4 = fmask
        out_p = out_p.at[:, 0].set(jnp.where(sel4, n_p0, p0))
        out_p = out_p.at[:, 1].set(jnp.where(sel4 & ~hev, n_p1, p1))
        out_q = out_q.at[:, 0].set(jnp.where(sel4, n_q0, q0))
        out_q = out_q.at[:, 1].set(jnp.where(sel4 & ~hev, n_q1, q1))
        return out_p, out_q

    if size == 6:
        p2, q2 = p[:, 2], q[:, 2]
        flat = (jnp.maximum(
            jnp.maximum(jnp.abs(p1 - p0), jnp.abs(q1 - q0)),
            jnp.maximum(jnp.abs(p2 - p0), jnp.abs(q2 - q0))) <= F)
        w_p1 = r3(p2 * 3 + p1 * 2 + p0 * 2 + q0)
        w_p0 = r3(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1)
        w_q0 = r3(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2)
        w_q1 = r3(p0 + q0 * 2 + q1 * 2 + q2 * 3)
        selw = fmask & flat
        sel4 = fmask & ~flat
        out_p = out_p.at[:, 0].set(
            jnp.where(selw, w_p0, jnp.where(sel4, n_p0, p0)))
        out_p = out_p.at[:, 1].set(
            jnp.where(selw, w_p1, jnp.where(sel4 & ~hev, n_p1, p1)))
        out_q = out_q.at[:, 0].set(
            jnp.where(selw, w_q0, jnp.where(sel4, n_q0, q0)))
        out_q = out_q.at[:, 1].set(
            jnp.where(selw, w_q1, jnp.where(sel4 & ~hev, n_q1, q1)))
        return out_p, out_q

    p2, p3 = p[:, 2], p[:, 3]
    q2, q3 = q[:, 2], q[:, 3]

    def maxr(*xs):
        m = xs[0]
        for x in xs[1:]:
            m = jnp.maximum(m, x)
        return m

    flat = maxr(jnp.abs(p1 - p0), jnp.abs(q1 - q0), jnp.abs(p2 - p0),
                jnp.abs(q2 - q0), jnp.abs(p3 - p0), jnp.abs(q3 - q0)) <= F
    e_p2 = r3(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0)
    e_p1 = r3(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1)
    e_p0 = r3(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2)
    e_q0 = r3(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3)
    e_q1 = r3(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3)
    e_q2 = r3(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3)

    if size == 8:
        selw = fmask & flat
        sel4 = fmask & ~flat
        out_p = out_p.at[:, 2].set(jnp.where(selw, e_p2, p2))
        out_p = out_p.at[:, 1].set(
            jnp.where(selw, e_p1, jnp.where(sel4 & ~hev, n_p1, p1)))
        out_p = out_p.at[:, 0].set(
            jnp.where(selw, e_p0, jnp.where(sel4, n_p0, p0)))
        out_q = out_q.at[:, 0].set(
            jnp.where(selw, e_q0, jnp.where(sel4, n_q0, q0)))
        out_q = out_q.at[:, 1].set(
            jnp.where(selw, e_q1, jnp.where(sel4 & ~hev, n_q1, q1)))
        out_q = out_q.at[:, 2].set(jnp.where(selw, e_q2, q2))
        return out_p, out_q

    assert size == 14
    p4, p5, p6 = p[:, 4], p[:, 5], p[:, 6]
    q4, q5, q6 = q[:, 4], q[:, 5], q[:, 6]
    flat2 = maxr(jnp.abs(p4 - p0), jnp.abs(q4 - q0), jnp.abs(p5 - p0),
                 jnp.abs(q5 - q0), jnp.abs(p6 - p0),
                 jnp.abs(q6 - q0)) <= F
    w_p5 = r4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0)
    w_p4 = r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1)
    w_p3 = r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1
              + q2)
    w_p2 = r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1
              + q2 + q3)
    w_p1 = r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1
              + q2 + q3 + q4)
    w_p0 = r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2
              + q3 + q4 + q5)
    w_q0 = r4(q6 + q5 + q4 + q3 + q2 + q1 * 2 + q0 * 2 + p0 * 2 + p1 + p2
              + p3 + p4 + p5)
    w_q1 = r4(q6 * 2 + q5 + q4 + q3 + q2 * 2 + q1 * 2 + q0 * 2 + p0 + p1
              + p2 + p3 + p4)
    w_q2 = r4(q6 * 3 + q5 + q4 + q3 * 2 + q2 * 2 + q1 * 2 + q0 + p0 + p1
              + p2 + p3)
    w_q3 = r4(q6 * 4 + q5 + q4 * 2 + q3 * 2 + q2 * 2 + q1 + q0 + p0 + p1
              + p2)
    w_q4 = r4(q6 * 5 + q5 * 2 + q4 * 2 + q3 * 2 + q2 + q1 + q0 + p0 + p1)
    w_q5 = r4(q6 * 7 + q5 * 2 + q4 * 2 + q3 + q2 + q1 + q0 + p0)

    sel14 = fmask & flat & flat2
    sel8 = fmask & flat & ~flat2
    sel4 = fmask & ~flat
    for i, (w14, e8, n4, orig, use_n4) in enumerate([
            (w_p0, e_p0, n_p0, p0, True), (w_p1, e_p1, n_p1, p1, False),
            (w_p2, e_p2, None, p2, None)]):
        v = jnp.where(sel14, w14, jnp.where(sel8, e8, orig))
        if i == 0:
            v = jnp.where(sel4, n_p0, v)
        elif i == 1:
            v = jnp.where(sel4 & ~hev, n_p1, v)
        out_p = out_p.at[:, i].set(v)
    out_p = out_p.at[:, 3].set(jnp.where(sel14, w_p3, p3))
    out_p = out_p.at[:, 4].set(jnp.where(sel14, w_p4, p4))
    out_p = out_p.at[:, 5].set(jnp.where(sel14, w_p5, p5))
    for i, (w14, e8, orig) in enumerate([
            (w_q0, e_q0, q0), (w_q1, e_q1, q1), (w_q2, e_q2, q2)]):
        v = jnp.where(sel14, w14, jnp.where(sel8, e8, orig))
        if i == 0:
            v = jnp.where(sel4, n_q0, v)
        elif i == 1:
            v = jnp.where(sel4 & ~hev, n_q1, v)
        out_q = out_q.at[:, i].set(v)
    out_q = out_q.at[:, 3].set(jnp.where(sel14, w_q3, q3))
    out_q = out_q.at[:, 4].set(jnp.where(sel14, w_q4, q4))
    out_q = out_q.at[:, 5].set(jnp.where(sel14, w_q5, q5))
    return out_p, out_q


def _levels_to_thresholds(level):
    """sharpness=0 thresholds, traced (ops.ref.deblock._thresholds)."""
    limit = jnp.maximum(level, 1)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    return limit, blimit, thresh


def deblock_plane_jax(plane, block: int, level_v, level_h,
                      is_luma: bool, bd: int = 8, split_map=None,
                      outer_block: int = 32, edge_on_v=None,
                      edge_on_h=None, merge_map=None, sub_map=None):
    """Filter one plane with traced levels. plane [H, W] int32; level 0
    disables (the filter mask never passes with limit>=1? no — gate
    explicitly). split_map: traced bool [bh, bw] per outer block —
    inner edges filter only where set (mirrors ops.ref.deblock).
    merge_map: traced bool [nr, nc] per 64x64 SB — PARTITION_NONE at
    64 removes the SB-internal 32-level prediction edges (they are no
    longer block edges in the stream).

    sub_map: traced bool [H//cs, W//cs] with cs = block//2 — cells
    whose TX is the half size (16x16 quads split to four 8x8 blocks:
    TX_8X8 luma / TX_4X4 chroma). The spec derives the filter length
    from the MIN adjacent TX (7.14.5): block-grid edges flanked by a
    sub cell drop 14->8 taps (luma) / 6->4 (chroma) PER ROW, and new
    half-spacing interior edges appear inside sub quads (8-tap luma /
    4-tap chroma). At 4:2:0 the luma 8-cell grid and the chroma 4-cell
    grid coincide, so ONE [H/8, W/8] array serves all three planes."""
    H, W = plane.shape
    size = 14 if is_luma else 6
    n = size // 2
    size2 = 8 if is_luma else 4   # sub-TX filter + its sample span
    n2 = size2 // 2
    cs = block // 2               # sub-TX extent on this plane
    ob = outer_block if is_luma else outer_block // 2
    sb = 2 * ob                   # 64x64 SB extent on this plane
    out = plane

    def edge_mask_v(xs):
        # [H, E] active-row mask per edge from split/merge maps
        if split_map is None and merge_map is None:
            return None
        cols = []
        for x in xs:
            if x % ob != 0:
                bj = x // ob
                m = (jnp.repeat(split_map[:, bj], ob)[:H]
                     if split_map is not None
                     else jnp.ones((H,), bool))
            elif merge_map is not None and x % sb != 0:
                m = ~jnp.repeat(merge_map[:, x // sb], sb)[:H]
            else:
                m = jnp.ones((H,), bool)
            cols.append(m)
        return jnp.stack(cols, axis=1)

    def edge_mask_h(ys):
        if split_map is None and merge_map is None:
            return None
        rows = []
        for y in ys:
            if y % ob != 0:
                bi = y // ob
                m = (jnp.repeat(split_map[bi, :], ob)[:W]
                     if split_map is not None
                     else jnp.ones((W,), bool))
            elif merge_map is not None and y % sb != 0:
                m = ~jnp.repeat(merge_map[y // sb, :], sb)[:W]
            else:
                m = jnp.ones((W,), bool)
            rows.append(m)
        return jnp.stack(rows, axis=1)

    # Uniform edge spacing means the p/q samples of ALL edges are pure
    # slices of the [.., G, block] group reshape, and the filtered
    # plane reassembles by concatenation — no XLA gather/scatter
    # anywhere (scatters serialized this pass on TPU; the uniform grid
    # is what makes the whole-frame batch legal in the first place).
    assert block >= size, (block, size)
    xs = np.arange(block, W, block)
    if len(xs):
        assert W % block == 0, (W, block)
        E = len(xs)
        limit, blimit, thresh = _levels_to_thresholds(level_v)
        g = out.reshape(H, W // block, block)
        p = g[:, :-1, block - n:][..., ::-1]          # [H, E, n]
        q = g[:, 1:, :n]
        m = edge_mask_v(xs)
        if edge_on_v is not None:
            eo = jnp.broadcast_to(edge_on_v[None, :], (H, E))
            m = eo if m is None else (m & eo)
        small = None
        if sub_map is not None:
            # per-(row, edge) sub-TX flank: MIN adjacent TX is the
            # half size wherever either neighboring cs-cell is sub
            sm = (sub_map[:, xs // cs - 1]
                  | sub_map[:, xs // cs])             # [H//cs, E]
            small = jnp.repeat(sm, cs, axis=0)[:H]
            m_big = ~small if m is None else (m & ~small)
            m_small = small if m is None else (m & small)
        else:
            m_big = m
        pf = p.reshape(-1, n)
        qf = q.reshape(-1, n)
        mb = m_big.reshape(-1) if m_big is not None else None
        np_, nq = _filter_stack(pf, qf, limit, blimit, thresh, size,
                                bd, mb)
        if small is not None:
            np2, nq2 = _filter_stack(pf[:, :n2], qf[:, :n2], limit,
                                     blimit, thresh, size2, bd,
                                     m_small.reshape(-1))
            sc = small.reshape(-1)[:, None]
            np_ = np_.at[:, :n2].set(jnp.where(sc, np2, np_[:, :n2]))
            nq = nq.at[:, :n2].set(jnp.where(sc, nq2, nq[:, :n2]))
        on = level_v > 0
        np_ = jnp.where(on, np_, pf).reshape(H, E, n)[..., ::-1]
        nq = jnp.where(on, nq, qf).reshape(H, E, n)
        q_side = jnp.concatenate([g[:, :1, :n], nq], axis=1)
        p_side = jnp.concatenate([np_, g[:, -1:, block - n:]], axis=1)
        out = jnp.concatenate(
            [q_side, g[:, :, n:block - n], p_side], axis=2
        ).reshape(H, W)

    if sub_map is not None and W >= 2 * block:
        # interior half-spacing vertical edges (one per block group,
        # at column k*block + cs): exist only inside sub quads; both
        # flanks are sub TXs there, so one static size2 pass suffices
        limit, blimit, thresh = _levels_to_thresholds(level_v)
        g = out.reshape(H, W // block, block)
        p = g[:, :, cs - n2: cs][..., ::-1]           # [H, G, n2]
        q = g[:, :, cs: cs + n2]
        ecols = (np.arange(W // block) * block + cs) // cs    # odd
        sm = sub_map[:, ecols - 1] & sub_map[:, ecols]
        m = jnp.repeat(sm, cs, axis=0)[:H].reshape(-1)
        np_, nq = _filter_stack(p.reshape(-1, n2), q.reshape(-1, n2),
                                limit, blimit, thresh, size2, bd, m)
        on = level_v > 0
        np_ = jnp.where(on, np_, p.reshape(-1, n2)
                        ).reshape(H, -1, n2)[..., ::-1]
        nq = jnp.where(on, nq, q.reshape(-1, n2)).reshape(H, -1, n2)
        out = jnp.concatenate(
            [g[:, :, :cs - n2], np_, nq, g[:, :, cs + n2:]], axis=2
        ).reshape(H, W)

    ys = np.arange(block, H, block)
    if len(ys):
        assert H % block == 0, (H, block)
        E = len(ys)
        limit, blimit, thresh = _levels_to_thresholds(level_h)
        g = out.reshape(H // block, block, W)
        # [E, n, W] with row 0 nearest the edge -> [W, E, n]
        p = g[:-1, block - n:, :][:, ::-1].transpose(2, 0, 1)
        q = g[1:, :n, :].transpose(2, 0, 1)
        m = edge_mask_h(ys)
        if edge_on_h is not None:
            eo = jnp.broadcast_to(edge_on_h[None, :], (W, E))
            m = eo if m is None else (m & eo)
        small = None
        if sub_map is not None:
            sm = (sub_map[ys // cs - 1, :]
                  | sub_map[ys // cs, :])             # [E, W//cs]
            small = jnp.repeat(sm, cs, axis=1)[:, :W].T   # [W, E]
            m_big = ~small if m is None else (m & ~small)
            m_small = small if m is None else (m & small)
        else:
            m_big = m
        pf = p.reshape(-1, n)
        qf = q.reshape(-1, n)
        mb = m_big.reshape(-1) if m_big is not None else None
        np_, nq = _filter_stack(pf, qf, limit, blimit, thresh, size,
                                bd, mb)
        if small is not None:
            np2, nq2 = _filter_stack(pf[:, :n2], qf[:, :n2], limit,
                                     blimit, thresh, size2, bd,
                                     m_small.reshape(-1))
            sc = small.reshape(-1)[:, None]
            np_ = np_.at[:, :n2].set(jnp.where(sc, np2, np_[:, :n2]))
            nq = nq.at[:, :n2].set(jnp.where(sc, nq2, nq[:, :n2]))
        on = level_h > 0
        np_ = jnp.where(on, np_, pf
                        ).reshape(W, E, n)[..., ::-1].transpose(1, 2, 0)
        nq = jnp.where(on, nq, qf
                       ).reshape(W, E, n).transpose(1, 2, 0)
        q_side = jnp.concatenate([g[:1, :n, :], nq], axis=0)
        p_side = jnp.concatenate([np_, g[-1:, block - n:, :]], axis=0)
        out = jnp.concatenate(
            [q_side, g[:, n:block - n, :], p_side], axis=1
        ).reshape(H, W)

    if sub_map is not None and H >= 2 * block:
        # interior half-spacing horizontal edges inside sub quads
        limit, blimit, thresh = _levels_to_thresholds(level_h)
        g = out.reshape(H // block, block, W)
        p = g[:, cs - n2: cs, :][:, ::-1].transpose(2, 0, 1)
        q = g[:, cs: cs + n2, :].transpose(2, 0, 1)   # [W, G, n2]
        erows = (np.arange(H // block) * block + cs) // cs
        sm = sub_map[erows - 1, :] & sub_map[erows, :]  # [G, W//cs]
        m = jnp.repeat(sm, cs, axis=1)[:, :W].T.reshape(-1)
        G = H // block
        np_, nq = _filter_stack(p.reshape(-1, n2), q.reshape(-1, n2),
                                limit, blimit, thresh, size2, bd, m)
        on = level_h > 0
        np_ = jnp.where(on, np_, p.reshape(-1, n2)
                        ).reshape(W, G, n2)[..., ::-1].transpose(1, 2, 0)
        nq = jnp.where(on, nq, q.reshape(-1, n2)
                       ).reshape(W, G, n2).transpose(1, 2, 0)
        out = jnp.concatenate(
            [g[:, :cs - n2, :], np_, nq, g[:, cs + n2:, :]], axis=1
        ).reshape(H, W)
    return out


def deblock_frame_jax(planes, level_y, level_uv, block_y: int = 32,
                      block_c: int = 16, bd: int = 8, split_map=None,
                      merge_map=None, sub_map=None):
    """Deblock [y, u, v] with traced levels (y_v = y_h = level_y)."""
    y = deblock_plane_jax(planes[0], block_y, level_y, level_y, True,
                          bd, split_map, merge_map=merge_map,
                          sub_map=sub_map)
    u = deblock_plane_jax(planes[1], block_c, level_uv, level_uv, False,
                          bd, split_map, merge_map=merge_map,
                          sub_map=sub_map)
    v = deblock_plane_jax(planes[2], block_c, level_uv, level_uv, False,
                          bd, split_map, merge_map=merge_map,
                          sub_map=sub_map)
    return [y, u, v]


def deblock_search(planes, srcs, base_level, block_y: int = 32,
                   block_c: int = 16, bd: int = 8, split_map=None,
                   merge_map=None, sub_map=None):
    """Whole-frame deblock level search (deblock_filter_optimize
    analog): try a fixed ladder of scale factors around the q-derived
    level, pick the one minimizing luma SSE vs source. Returns
    (level chosen [int32 scalar], filtered planes).

    The candidate SSEs are ESTIMATED on a 64-aligned center row band
    (~1/3 of the frame) and only the winner filters the whole frame:
    5 full-frame candidate passes cost ~5x one pass; the estimate
    form costs ~2.6x (level choice is encoder policy — the applied
    filtering stays spec-exact)."""
    scales = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0], jnp.float32)
    cand = jnp.clip((scales * base_level).astype(jnp.int32), 0, 63)
    H = planes[0].shape[0]
    lo = (H // 3) // 64 * 64
    hi = max(lo + 64, (2 * H // 3) // 64 * 64)
    use_est = hi < H and H >= 256

    if use_est:
        planes_c = [planes[0][lo:hi],
                    planes[1][lo >> 1: hi >> 1],
                    planes[2][lo >> 1: hi >> 1]]
        srcs_c = [srcs[0][lo:hi],
                  srcs[1][lo >> 1: hi >> 1],
                  srcs[2][lo >> 1: hi >> 1]]
        ob = 32                    # split_map granularity (luma px)
        split_c = (split_map[lo // ob: hi // ob]
                   if split_map is not None else None)
        merge_c = (merge_map[lo // 64: hi // 64]
                   if merge_map is not None else None)
        sub_c = (sub_map[lo // 8: hi // 8]
                 if sub_map is not None else None)
    else:
        planes_c, srcs_c = planes, srcs
        split_c, merge_c, sub_c = split_map, merge_map, sub_map

    def est(level):
        out = deblock_frame_jax(planes_c, level, level, block_y,
                                block_c, bd, split_c, merge_map=merge_c,
                                sub_map=sub_c)
        return sum(jnp.sum((o - s).astype(jnp.float32) ** 2)
                   for o, s in zip(out, srcs_c))

    sses = jax.vmap(est)(cand)
    k = jnp.argmin(sses)
    best = cand[k]
    out = deblock_frame_jax(planes, best, best, block_y, block_c,
                            bd, split_map, merge_map=merge_map,
                            sub_map=sub_map)
    return best, out


def deblock_search_tiled(planes, srcs, base_level, split_grid,
                         axis_name: str, T: int, tile_idx,
                         bd: int = 8):
    """Tiled deblock + level search inside shard_map (SURVEY §5.7
    "cross-tile halos ... the codec's ring attention").

    planes/srcs: this shard's [h, tw] column slice. Halo columns are
    exchanged once via ppermute (they are level-independent), then the
    candidate ladder vmaps pure filtering over the extended arrays.
    Tile-boundary edges are double-computed by both neighbors (each
    keeps its own side — the filter output is identical); frame-edge
    tiles gate their outer boundary edge off. SSEs psum over the tile
    axis so every shard picks the same frame-global level."""
    tw = planes[0].shape[1]
    perm_r = [(i, i + 1) for i in range(T - 1)]   # send right
    perm_l = [(i + 1, i) for i in range(T - 1)]   # send left

    def halo_ext(x, hw):
        left = jax.lax.ppermute(x[:, -hw:], axis_name, perm_r)
        right = jax.lax.ppermute(x[:, :hw], axis_name, perm_l)
        return jnp.concatenate([left, x, right], axis=1)

    ye = halo_ext(planes[0], 32)
    ue = halo_ext(planes[1], 16)
    ve = halo_ext(planes[2], 16)
    sg = jnp.concatenate(
        [jax.lax.ppermute(split_grid[:, -1:], axis_name, perm_r),
         split_grid,
         jax.lax.ppermute(split_grid[:, :1], axis_name, perm_l)],
        axis=1)

    not_first = tile_idx != 0
    not_last = tile_idx != T - 1

    def edge_on(W_ext, block, lo, hi):
        n_e = len(np.arange(block, W_ext, block))
        eo = jnp.ones((n_e,), bool)
        eo = eo.at[lo // block - 1].set(not_first)
        eo = eo.at[hi // block - 1].set(not_last)
        return eo

    eo_y = edge_on(64 + tw, 16, 32, 32 + tw)
    eo_c = edge_on(32 + tw // 2, 8, 16, 16 + tw // 2)

    scales = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0], jnp.float32)
    cand = jnp.clip((scales * base_level).astype(jnp.int32), 0, 63)

    def one(level):
        oy = deblock_plane_jax(ye, 16, level, level, True, bd, sg,
                               32, edge_on_v=eo_y)[:, 32:32 + tw]
        ou = deblock_plane_jax(ue, 8, level, level, False, bd, sg,
                               32, edge_on_v=eo_c)[:, 16:16 + tw // 2]
        ov = deblock_plane_jax(ve, 8, level, level, False, bd, sg,
                               32, edge_on_v=eo_c)[:, 16:16 + tw // 2]
        sse = sum(jnp.sum((o - s).astype(jnp.float32) ** 2)
                  for o, s in zip((oy, ou, ov), srcs))
        return jax.lax.psum(sse, axis_name), (oy, ou, ov)

    sses, outs = jax.vmap(one)(cand)
    k = jnp.argmin(sses)
    return cand[k], [o[k] for o in outs]
