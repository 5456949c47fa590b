"""Deblocking filter (AV1 spec §7.14) — numpy reference.

Reference parity: rav1e src/deblock.rs (deblock_filter_frame). This
version covers the uniform-transform-grid case the current encoder
emits (every NxN block one TX, all edges are prediction+tx edges, no
deltas/segments), filtering all vertical edges then all horizontal
edges per plane, exactly as the decoder will.

Filters: luma 4/8/14-tap, chroma 4/6-tap, with spec masks (filter
mask, flat, flat2/outer, hev).
"""

from __future__ import annotations

import numpy as np


def _thresholds(level: int, sharpness: int = 0):
    shift = 2 if sharpness > 4 else (1 if sharpness > 0 else 0)
    if sharpness > 0:
        limit = np.clip(level >> shift, 1, 9 - sharpness)
    else:
        limit = max(1, level)
    blimit = 2 * (level + 2) + limit
    thresh = level >> 4
    return int(limit), int(blimit), int(thresh)


def _filter_edge(p, q, limit, blimit, thresh, size, bd=8, row_mask=None):
    """Filter one edge. p: [...,: n] samples left/above of the edge in
    reverse order isn't used; layout: p[:, i] = p_i (p0 nearest edge),
    q[:, i] = q_i. Returns new (p, q) (modified up to taps)."""
    F = 1 << (bd - 8)
    # spec 7.14.6.2: the level-derived thresholds scale with bit depth
    limit, blimit, thresh = limit * F, blimit * F, thresh * F
    p = p.astype(np.int32)
    q = q.astype(np.int32)
    p0, p1 = p[:, 0], p[:, 1]
    q0, q1 = q[:, 0], q[:, 1]
    fmask = ((np.abs(p1 - p0) <= limit) & (np.abs(q1 - q0) <= limit)
             & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blimit))
    if row_mask is not None:
        fmask = fmask & row_mask
    if size >= 6:
        p2, q2 = p[:, 2], q[:, 2]
        fmask &= (np.abs(p2 - p1) <= limit) & (np.abs(q2 - q1) <= limit)
    if size >= 8:
        p3, q3 = p[:, 3], q[:, 3]
        fmask &= (np.abs(p3 - p2) <= limit) & (np.abs(q3 - q2) <= limit)
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)

    out_p = p.copy()
    out_q = q.copy()

    # narrow filter (4): signed arithmetic with char-range clamps
    # (libaom filter4 / spec 7.14.6.3)
    off = 0x80 * F
    lo, hi = -128 * F, 128 * F - 1

    def c3(x):
        return np.clip(x, lo, hi)

    ps1, ps0 = p1 - off, p0 - off
    qs0, qs1 = q0 - off, q1 - off
    fil = np.where(hev, c3(ps1 - qs1), 0)
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

    if size == 4:
        sel4 = fmask
        out_p[:, 0] = np.where(sel4, n_p0, p0)
        out_p[:, 1] = np.where(sel4 & ~hev, n_p1, p1)
        out_q[:, 0] = np.where(sel4, n_q0, q0)
        out_q[:, 1] = np.where(sel4 & ~hev, n_q1, q1)
        return out_p, out_q

    if size == 6:
        p2, q2 = p[:, 2], q[:, 2]
        flat = (np.maximum.reduce([np.abs(p1 - p0), np.abs(q1 - q0),
                                   np.abs(p2 - p0), np.abs(q2 - q0)])
                <= F)
        w_p1 = r3(p2 * 3 + p1 * 2 + p0 * 2 + q0)
        w_p0 = r3(p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1)
        w_q0 = r3(p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2)
        w_q1 = r3(p0 + q0 * 2 + q1 * 2 + q2 * 3)
        selw = fmask & flat
        sel4 = fmask & ~flat
        out_p[:, 0] = np.where(selw, w_p0, np.where(sel4, n_p0, p0))
        out_p[:, 1] = np.where(selw, w_p1,
                               np.where(sel4 & ~hev, n_p1, p1))
        out_q[:, 0] = np.where(selw, w_q0, np.where(sel4, n_q0, q0))
        out_q[:, 1] = np.where(selw, w_q1,
                               np.where(sel4 & ~hev, n_q1, q1))
        return out_p, out_q

    p2, p3 = p[:, 2], p[:, 3]
    q2, q3 = q[:, 2], q[:, 3]
    flat = (np.maximum.reduce([
        np.abs(p1 - p0), np.abs(q1 - q0), np.abs(p2 - p0),
        np.abs(q2 - q0), np.abs(p3 - p0), np.abs(q3 - q0)]) <= F)
    # 8-tap outputs
    e_p2 = r3(p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0)
    e_p1 = r3(p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1)
    e_p0 = r3(p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2)
    e_q0 = r3(p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3)
    e_q1 = r3(p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3)
    e_q2 = r3(p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3)

    if size == 8:
        selw = fmask & flat
        sel4 = fmask & ~flat
        out_p[:, 2] = np.where(selw, e_p2, p2)
        out_p[:, 1] = np.where(selw, e_p1,
                               np.where(sel4 & ~hev, n_p1, p1))
        out_p[:, 0] = np.where(selw, e_p0, np.where(sel4, n_p0, p0))
        out_q[:, 0] = np.where(selw, e_q0, np.where(sel4, n_q0, q0))
        out_q[:, 1] = np.where(selw, e_q1,
                               np.where(sel4 & ~hev, n_q1, q1))
        out_q[:, 2] = np.where(selw, e_q2, q2)
        return out_p, out_q

    assert size == 14
    p4, p5, p6 = p[:, 4], p[:, 5], p[:, 6]
    q4, q5, q6 = q[:, 4], q[:, 5], q[:, 6]
    flat2 = (np.maximum.reduce([
        np.abs(p4 - p0), np.abs(q4 - q0), np.abs(p5 - p0),
        np.abs(q5 - q0), np.abs(p6 - p0), np.abs(q6 - q0)]) <= F)
    # 13-tap wide filter, weights sum to 16 (dav1d lf wd16)
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
    for i, (w14, e8, orig) in enumerate([
            (w_p0, e_p0, p0), (w_p1, e_p1, p1), (w_p2, e_p2, p2)]):
        out_p[:, i] = np.where(sel14, w14, np.where(sel8, e8, orig))
    out_p[:, 3] = np.where(sel14, w_p3, p3)
    out_p[:, 4] = np.where(sel14, w_p4, p4)
    out_p[:, 5] = np.where(sel14, w_p5, p5)
    for i, (w14, e8, orig) in enumerate([
            (w_q0, e_q0, q0), (w_q1, e_q1, q1), (w_q2, e_q2, q2)]):
        out_q[:, i] = np.where(sel14, w14, np.where(sel8, e8, orig))
    out_q[:, 3] = np.where(sel14, w_q3, q3)
    out_q[:, 4] = np.where(sel14, w_q4, q4)
    out_q[:, 5] = np.where(sel14, w_q5, q5)
    # narrow fallback for non-flat rows
    out_p[:, 0] = np.where(sel4, n_p0, out_p[:, 0])
    out_p[:, 1] = np.where(sel4 & ~hev, n_p1, out_p[:, 1])
    out_q[:, 0] = np.where(sel4, n_q0, out_q[:, 0])
    out_q[:, 1] = np.where(sel4 & ~hev, n_q1, out_q[:, 1])
    return out_p, out_q


def deblock_plane(plane: np.ndarray, block: int, level_v: int,
                  level_h: int, is_luma: bool, sharpness: int = 0,
                  bd: int = 8, split_map: np.ndarray | None = None,
                  outer_block: int = 32) -> np.ndarray:
    """Filter a plane. `block` is the (split) transform size; edges at
    multiples of `block` inside an outer block are filtered only where
    split_map (per outer block, [bh][bw]) is set; outer-block edges
    always filter (they are prediction edges)."""
    out = plane.astype(np.int32).copy()
    size = 14 if is_luma else 6
    ob = outer_block if is_luma else outer_block // 2
    if level_v > 0:
        limit, blimit, thresh = _thresholds(level_v, sharpness)
        for x in range(block, out.shape[1], block):
            if split_map is not None and x % ob != 0:
                bj = x // ob
                rows = np.repeat(split_map[:, bj], ob)[: out.shape[0]]
                if not rows.any():
                    continue
            else:
                rows = None
            n = size // 2
            pcols = out[:, x - n: x][:, ::-1]  # p0 at edge
            qcols = out[:, x: x + n]
            np_, nq = _filter_edge(pcols, qcols, limit, blimit, thresh,
                                   size, bd, rows)
            out[:, x - n: x] = np_[:, ::-1]
            out[:, x: x + n] = nq
    if level_h > 0:
        limit, blimit, thresh = _thresholds(level_h, sharpness)
        for y in range(block, out.shape[0], block):
            if split_map is not None and y % ob != 0:
                bi = y // ob
                cols = np.repeat(split_map[bi, :], ob)[: out.shape[1]]
                if not cols.any():
                    continue
            else:
                cols = None
            n = size // 2
            prow = out[y - n: y, :][::-1, :].T
            qrow = out[y: y + n, :].T
            np_, nq = _filter_edge(prow, qrow, limit, blimit, thresh,
                                   size, bd, cols)
            out[y - n: y, :] = np_.T[::-1, :]
            out[y: y + n, :] = nq.T
    return out


def level_from_qindex(qindex: int) -> int:
    """Fast deblock level heuristic (reference: rav1e fast_deblock)."""
    # roughly libaom's av1_get_filter_level default curve
    return int(np.clip(qindex // 12, 0, 63))
