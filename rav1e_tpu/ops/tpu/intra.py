"""Batched intra prediction on TPU (jnp, integer-exact vs ops.ref.intra).

Predicts [N, h, w] blocks from per-block edge vectors for the
non-directional + V/H mode set (directional fractional modes land with
the full-intra milestone). Availability semantics follow the spec:
missing above row -> base-1, missing left -> base+1 (for V/H/PAETH),
DC averages only available edges.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rav1e_tpu.core.constants import PredictionMode
from rav1e_tpu.ops.ref.intra import SM_WEIGHTS

BASE = 128  # 8-bit


def _edges(above, left, tl, have_a, have_l):
    """Spec edge fill (7.11.2 / dav1d ipred_prepare):
    missing above -> replicate left[0] (or base-1 when no left);
    missing left -> replicate above[0] (or base+1); top-left falls back
    to above[0] / left[0] / base."""
    ha = have_a[:, None]
    hl = have_l[:, None]
    a_fill = jnp.where(hl, left[:, :1], BASE - 1)
    l_fill = jnp.where(ha, above[:, :1], BASE + 1)
    a = jnp.where(ha, above, a_fill)
    l_ = jnp.where(hl, left, l_fill)
    t = jnp.where(have_a & have_l, tl,
                  jnp.where(have_a, above[:, 0],
                            jnp.where(have_l, left[:, 0], BASE)))
    return a, l_, t


def pred_dc(above, left, have_a, have_l, h, w):
    sum_a = above.sum(axis=-1)
    sum_l = left.sum(axis=-1)
    both = (sum_a + sum_l + ((w + h) >> 1)) // (w + h)
    only_a = (sum_a + (w >> 1)) >> (w.bit_length() - 1)
    only_l = (sum_l + (h >> 1)) >> (h.bit_length() - 1)
    dc = jnp.where(have_a & have_l, both,
                   jnp.where(have_a, only_a,
                             jnp.where(have_l, only_l, BASE)))
    return jnp.broadcast_to(dc[:, None, None], (dc.shape[0], h, w))


def pred_v(above, left, tl, have_a, have_l, h, w):
    a, _, _t = _edges(above, left, tl, have_a, have_l)
    return jnp.broadcast_to(a[:, None, :], (a.shape[0], h, w))


def pred_h(above, left, tl, have_a, have_l, h, w):
    _, l_, _t = _edges(above, left, tl, have_a, have_l)
    return jnp.broadcast_to(l_[:, :, None], (l_.shape[0], h, w))


def pred_paeth(above, left, tl, have_a, have_l, h, w):
    a, l_, t = _edges(above, left, tl, have_a, have_l)
    av = a[:, None, :]
    lv = l_[:, :, None]
    tv = t[:, None, None]
    pa = jnp.abs(lv - tv)
    pl = jnp.abs(av - tv)
    ptl = jnp.abs(av + lv - 2 * tv)
    out = jnp.where((pa <= pl) & (pa <= ptl),
                    jnp.broadcast_to(av, (a.shape[0], h, w)),
                    jnp.where(pl <= ptl,
                              jnp.broadcast_to(lv, (a.shape[0], h, w)),
                              jnp.broadcast_to(tv, (a.shape[0], h, w))))
    return out


def _smooth(above, left, tl, have_a, have_l, h, w, kind):
    a, l_, _t = _edges(above, left, tl, have_a, have_l)
    a = a.astype(jnp.int64) if False else a
    right = a[:, w - 1]
    bottom = l_[:, h - 1]
    wh = jnp.asarray(np.array(SM_WEIGHTS[h], np.int32))[None, :, None]
    ww = jnp.asarray(np.array(SM_WEIGHTS[w], np.int32))[None, None, :]
    av = a[:, None, :]
    lv = l_[:, :, None]
    if kind == "both":
        sm = (wh * av + (256 - wh) * bottom[:, None, None]
              + ww * lv + (256 - ww) * right[:, None, None])
        out = (sm + 256) >> 9
    elif kind == "v":
        sm = wh * av + (256 - wh) * bottom[:, None, None]
        out = (sm + 128) >> 8
    else:
        sm = ww * lv + (256 - ww) * right[:, None, None]
        out = (sm + 128) >> 8
    return jnp.clip(out, 0, 255)


MODE_TO_ANGLE = {
    PredictionMode.D45_PRED: 45, PredictionMode.D67_PRED: 67,
    PredictionMode.D113_PRED: 113, PredictionMode.D135_PRED: 135,
    PredictionMode.D157_PRED: 157, PredictionMode.D203_PRED: 203,
}


def pred_directional(p_angle, aext, lext, tl, have_a, have_l, h, w):
    """Spec 7.11.2.4 directional prediction, batched, static angle,
    no edge filter/upsample (seq.enable_intra_edge_filter = 0 on the
    TPU path). aext/lext: [N, w+h] extended edges (caller gathers real
    above-right pixels or replicates exactly as the decoder's edge
    build does); integer-exact vs ops.ref.intra.predict_directional."""
    from rav1e_tpu.ops.ref.intra import DR_INTRA_DERIVATIVE
    n = aext.shape[0]
    ha = have_a[:, None]
    hl = have_l[:, None]
    a_fill = jnp.where(hl, lext[:, :1], BASE - 1)
    l_fill = jnp.where(ha, aext[:, :1], BASE + 1)
    a = jnp.where(ha, aext, a_fill)
    l_ = jnp.where(hl, lext, l_fill)
    t = jnp.where(have_a & have_l, tl,
                  jnp.where(have_a, aext[:, 0],
                            jnp.where(have_l, lext[:, 0], BASE)))
    AR = jnp.concatenate([t[:, None], a], axis=1)   # [N, w+h+1]
    LC = jnp.concatenate([t[:, None], l_], axis=1)
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    if p_angle < 90:
        dx = DR_INTRA_DERIVATIVE[p_angle]
        idx = (ii + 1) * dx
        base = (idx >> 6) + jj
        shift = (idx >> 1) & 31
        max_base = w + h - 1
        b0 = np.minimum(base, max_base) + 1
        b1 = np.minimum(base + 1, max_base) + 1
        out = (AR[:, b0] * (32 - shift) + AR[:, b1] * shift + 16) >> 5
        over = jnp.asarray(base > max_base)
        return jnp.where(over[None], AR[:, max_base + 1][:, None, None],
                         out)
    if p_angle > 180:
        dy = DR_INTRA_DERIVATIVE[270 - p_angle]
        idx = (jj + 1) * dy
        base = (idx >> 6) + ii
        shift = (idx >> 1) & 31
        max_base = w + h - 1
        b0 = np.minimum(base, max_base) + 1
        b1 = np.minimum(base + 1, max_base) + 1
        out = (LC[:, b0] * (32 - shift) + LC[:, b1] * shift + 16) >> 5
        over = jnp.asarray(base > max_base)
        return jnp.where(over[None], LC[:, max_base + 1][:, None, None],
                         out)
    # zone 2: 90 < angle < 180, reads above[-1..w) and left[-1..h)
    dx = DR_INTRA_DERIVATIVE.get(180 - p_angle, 0)
    dy = DR_INTRA_DERIVATIVE.get(p_angle - 90, 0)
    idx_a = (jj << 6) - (ii + 1) * dx
    base_a = idx_a >> 6
    use_a = jnp.asarray(base_a >= -1)
    shift_a = (idx_a >> 1) & 31
    ba0 = np.clip(base_a, -1, w - 1) + 1
    ba1 = np.minimum(np.clip(base_a + 1, -1, w) + 1, w + h)
    out_a = (AR[:, ba0] * (32 - shift_a) + AR[:, ba1] * shift_a + 16) >> 5
    idx_l = (ii << 6) - (jj + 1) * dy
    base_l = idx_l >> 6
    shift_l = (idx_l >> 1) & 31
    bl0 = np.clip(base_l, -1, h - 1) + 1
    bl1 = np.minimum(np.clip(base_l + 1, -1, h) + 1, w + h)
    out_l = (LC[:, bl0] * (32 - shift_l) + LC[:, bl1] * shift_l + 16) >> 5
    return jnp.where(use_a[None], out_a, out_l)


def predict_modes(modes, above, left, tl, have_a, have_l, h, w,
                  aext=None, lext=None):
    """Stack predictions for the given mode list: [K, N, h, w].

    Directional modes need the extended edges (aext/lext, length w+h,
    built with decoder-exact above-right/below-left availability);
    when absent they fall back to replication of the last edge pixel —
    callers must then mask selection to blocks where the decoder
    replicates too."""
    if aext is None:
        aext = jnp.concatenate(
            [above, jnp.repeat(above[:, -1:], h, axis=1)], axis=1)
    if lext is None:
        lext = jnp.concatenate(
            [left, jnp.repeat(left[:, -1:], w, axis=1)], axis=1)
    outs = []
    for m in modes:
        if m == PredictionMode.DC_PRED:
            outs.append(pred_dc(above, left, have_a, have_l, h, w))
        elif m == PredictionMode.V_PRED:
            outs.append(pred_v(above, left, tl, have_a, have_l, h, w))
        elif m == PredictionMode.H_PRED:
            outs.append(pred_h(above, left, tl, have_a, have_l, h, w))
        elif m == PredictionMode.PAETH_PRED:
            outs.append(pred_paeth(above, left, tl, have_a, have_l, h, w))
        elif m == PredictionMode.SMOOTH_PRED:
            outs.append(_smooth(above, left, tl, have_a, have_l, h, w, "both"))
        elif m == PredictionMode.SMOOTH_V_PRED:
            outs.append(_smooth(above, left, tl, have_a, have_l, h, w, "v"))
        elif m == PredictionMode.SMOOTH_H_PRED:
            outs.append(_smooth(above, left, tl, have_a, have_l, h, w, "h"))
        elif m in MODE_TO_ANGLE:
            outs.append(pred_directional(MODE_TO_ANGLE[m], aext, lext,
                                         tl, have_a, have_l, h, w))
        else:
            raise NotImplementedError(m)
    return jnp.stack(outs, axis=0).astype(jnp.int32)
