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


def predict_modes(modes, above, left, tl, have_a, have_l, h, w):
    """Stack predictions for the given mode list: [K, N, h, w]."""
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
        else:
            raise NotImplementedError(m)
    return jnp.stack(outs, axis=0).astype(jnp.int32)
