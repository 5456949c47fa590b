"""Intra prediction (AV1 spec §7.11.2) — numpy reference.

Reference parity: rav1e src/predict.rs / src/recon_intra.rs: edge
assembly with availability rules, DC/V/H/Smooth/Paeth predictors,
directional modes with 6-bit fractional positions (added with the
full intra milestone).

Predictors operate on the RECONSTRUCTED neighbors (the encoder must
reproduce decoder state exactly).
"""

from __future__ import annotations

import numpy as np

from rav1e_tpu.core.constants import PredictionMode

# spec Sm_Weights_Tx_* (smooth prediction weights by block dimension)
SM_WEIGHTS = {
    4: [255, 149, 85, 64],
    8: [255, 197, 146, 105, 73, 50, 37, 32],
    16: [255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33, 26, 20, 17, 16],
    32: [255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111, 101, 92,
         83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14, 12, 10, 9, 8, 8],
    64: [255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176, 169, 163,
         156, 150, 144, 138, 133, 127, 121, 116, 111, 106, 101, 96, 91, 86,
         82, 77, 73, 69, 65, 61, 57, 54, 50, 47, 44, 41, 38, 35, 32, 29, 27,
         25, 22, 20, 18, 16, 15, 13, 12, 10, 9, 8, 7, 6, 6, 5, 5, 4, 4, 4],
}


# spec Dr_Intra_Derivative (sparse, by prediction angle; 64*cot(angle)
# rounded). Verified against libdav1d's packed copy (.rodata@67137).
DR_INTRA_DERIVATIVE = {
    3: 1023, 6: 547, 9: 372, 14: 273, 17: 215, 20: 178, 23: 151,
    26: 132, 29: 116, 32: 102, 36: 90, 39: 80, 42: 71, 45: 64,
    48: 57, 51: 51, 54: 45, 58: 40, 61: 35, 64: 31, 67: 27, 70: 23,
    73: 19, 76: 15, 81: 11, 84: 7, 87: 3,
}


def predict_directional(p_angle: int, w: int, h: int, above: np.ndarray,
                        left: np.ndarray, top_left: int,
                        bd: int = 8) -> np.ndarray:
    """Spec 7.11.2.4 directional prediction, no edge filter/upsampling
    (sequence signals enable_intra_edge_filter=0).

    above must hold w+h entries (above-right replicated per edge
    rules); left must hold w+h entries (below-left replicated)."""
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    if p_angle < 90:
        dx = DR_INTRA_DERIVATIVE[p_angle]
        a = above.astype(np.int32)
        idx = (ii + 1) * dx
        base = (idx >> 6) + jj
        shift = (idx >> 1) & 31
        max_base = w + h - 1
        b0 = np.minimum(base, max_base)
        b1 = np.minimum(base + 1, max_base)
        out = (a[b0] * (32 - shift) + a[b1] * shift + 16) >> 5
        return np.where(base > max_base, a[max_base], out).astype(np.int32)
    if p_angle > 180:
        dy = DR_INTRA_DERIVATIVE[270 - p_angle]
        ll = left.astype(np.int32)
        idx = (jj + 1) * dy
        base = (idx >> 6) + ii
        shift = (idx >> 1) & 31
        max_base = w + h - 1
        b0 = np.minimum(base, max_base)
        b1 = np.minimum(base + 1, max_base)
        out = (ll[b0] * (32 - shift) + ll[b1] * shift + 16) >> 5
        return np.where(base > max_base, ll[max_base], out).astype(np.int32)
    # zone 2: 90 <= p_angle <= 180, both edges + top-left
    dx = DR_INTRA_DERIVATIVE.get(180 - p_angle, 0)
    dy = DR_INTRA_DERIVATIVE.get(p_angle - 90, 0)
    # edge vectors with top_left at index 0 (spec uses base >= -1)
    a = np.concatenate([[top_left], above[:w].astype(np.int32)])
    ll = np.concatenate([[top_left], left[:h].astype(np.int32)])
    if p_angle == 90:
        return np.tile(above[:w].astype(np.int32), (h, 1))
    if p_angle == 180:
        return np.tile(left[:h].astype(np.int32)[:, None], (1, w))
    idx_a = (jj << 6) - (ii + 1) * dx
    base_a = idx_a >> 6                      # >= -1 means above usable
    shift_a = (idx_a >> 1) & 31
    ba0 = np.clip(base_a, -1, w - 1) + 1
    ba1 = np.clip(base_a + 1, -1, w - 1) + 1
    out_a = (a[ba0] * (32 - shift_a) + a[ba1] * shift_a + 16) >> 5
    idx_l = (ii << 6) - (jj + 1) * dy
    base_l = idx_l >> 6
    shift_l = (idx_l >> 1) & 31
    bl0 = np.clip(base_l, -1, h - 1) + 1
    bl1 = np.clip(base_l + 1, -1, h - 1) + 1
    out_l = (ll[bl0] * (32 - shift_l) + ll[bl1] * shift_l + 16) >> 5
    return np.where(base_a >= -1, out_a, out_l).astype(np.int32)


def cfl_ac(luma_rec: np.ndarray, cw: int, ch: int, ss_x: int = 1,
           ss_y: int = 1) -> np.ndarray:
    """Spec 7.11.5 luma AC: subsample-averaged recon luma scaled to
    x8 (sum << (3 - ss_x - ss_y)), mean-subtracted round-half-up."""
    l2 = luma_rec[: ch << ss_y, : cw << ss_x].astype(np.int32)
    if ss_x and ss_y:
        L = (l2[0::2, 0::2] + l2[0::2, 1::2]
             + l2[1::2, 0::2] + l2[1::2, 1::2]) << 1
    elif ss_x:
        L = (l2[:, 0::2] + l2[:, 1::2]) << 2
    else:
        L = l2 << 3
    n = (cw * ch).bit_length() - 1
    avg = (int(L.sum()) + (1 << (n - 1))) >> n
    return L - avg


def cfl_predict(dc_pred: np.ndarray, ac: np.ndarray, alpha: int,
                bd: int = 8) -> np.ndarray:
    """pred = DC + Round2Signed(alpha * ac, 6), clipped."""
    scaled = alpha * ac
    out = dc_pred + np.sign(scaled) * ((np.abs(scaled) + 32) >> 6)
    return np.clip(out, 0, (1 << bd) - 1).astype(np.int32)


_DIRECTIONAL = {
    PredictionMode.D45_PRED: 45, PredictionMode.D67_PRED: 67,
    PredictionMode.D113_PRED: 113, PredictionMode.D135_PRED: 135,
    PredictionMode.D157_PRED: 157, PredictionMode.D203_PRED: 203,
}


def predict(mode: PredictionMode, w: int, h: int,
            above: np.ndarray | None, left: np.ndarray | None,
            top_left: int | None, bd: int = 8,
            have_above: bool | None = None,
            have_left: bool | None = None,
            angle_delta: int = 0) -> np.ndarray:
    """Predict a w x h block from neighbor arrays.

    above: length >= w (may be longer for directional), or None if the
    above row is unavailable. left: length >= h or None. Values are
    reconstructed pixels. have_above/have_left override availability
    when the caller passes spec-filled edge arrays (DC averages only
    truly available sides even though the fill exists)."""
    base = 1 << (bd - 1)
    maxv = (1 << bd) - 1
    have_a = above is not None
    have_l = left is not None
    # true availability (for DC averaging) vs filled-array presence
    avail_a = have_a if have_above is None else have_above
    avail_l = have_l if have_left is None else have_left
    if mode == PredictionMode.DC_PRED:
        have_a, have_l = avail_a, avail_l
        if have_a and have_l:
            s = int(above[:w].sum()) + int(left[:h].sum())
            avg = (s + ((w + h) >> 1)) // (w + h)
        elif have_a:
            avg = (int(above[:w].sum()) + (w >> 1)) >> (w.bit_length() - 1)
        elif have_l:
            avg = (int(left[:h].sum()) + (h >> 1)) >> (h.bit_length() - 1)
        else:
            avg = base
        return np.full((h, w), avg, np.int32)
    if mode == PredictionMode.V_PRED and angle_delta == 0:
        a = above if have_a else np.full(w, base - 1, np.int32)
        return np.tile(a[:w].astype(np.int32), (h, 1))
    if mode == PredictionMode.H_PRED and angle_delta == 0:
        ll = left if have_l else np.full(h, base + 1, np.int32)
        return np.tile(ll[:h].astype(np.int32)[:, None], (1, w))
    if mode in (PredictionMode.V_PRED, PredictionMode.H_PRED):
        base_angle = (90 if mode == PredictionMode.V_PRED
                      else 180) + 3 * angle_delta
        a = (above.astype(np.int32) if have_a
             else np.full(w + h, base - 1, np.int32))
        if len(a) < w + h:
            a = np.concatenate([a, np.full(w + h - len(a), a[-1])])
        ll = (left.astype(np.int32) if have_l
              else np.full(w + h, base + 1, np.int32))
        if len(ll) < w + h:
            ll = np.concatenate([ll, np.full(w + h - len(ll), ll[-1])])
        tl = int(top_left) if top_left is not None else base
        return predict_directional(base_angle, w, h, a, ll, tl, bd)
    if mode == PredictionMode.PAETH_PRED:
        a = (above[:w].astype(np.int32) if have_a
             else np.full(w, base - 1, np.int32))
        ll = (left[:h].astype(np.int32) if have_l
              else np.full(h, base + 1, np.int32))
        tl = int(top_left) if top_left is not None else base
        pa = np.abs(ll[:, None] - tl)        # |left - tl| dist for above
        pl = np.abs(a[None, :] - tl)
        ptl = np.abs(a[None, :] + ll[:, None] - 2 * tl)
        out = np.where((pa <= pl) & (pa <= ptl), np.tile(a, (h, 1)),
                       np.where(pl <= ptl, np.tile(ll[:, None], (1, w)), tl))
        return out.astype(np.int32)
    if mode in _DIRECTIONAL:
        base_angle = _DIRECTIONAL[mode] + 3 * angle_delta
        a = (above.astype(np.int32) if have_a
             else np.full(w + h, base - 1, np.int32))
        if len(a) < w + h:
            a = np.concatenate([a, np.full(w + h - len(a), a[-1])])
        ll = (left.astype(np.int32) if have_l
              else np.full(w + h, base + 1, np.int32))
        if len(ll) < w + h:
            ll = np.concatenate([ll, np.full(w + h - len(ll), ll[-1])])
        tl = int(top_left) if top_left is not None else base
        return predict_directional(base_angle, w, h, a, ll, tl, bd)
    if mode in (PredictionMode.SMOOTH_PRED, PredictionMode.SMOOTH_V_PRED,
                PredictionMode.SMOOTH_H_PRED):
        a = (above[:w].astype(np.int64) if have_a
             else np.full(w, base - 1, np.int64))
        ll = (left[:h].astype(np.int64) if have_l
              else np.full(h, base + 1, np.int64))
        right = a[w - 1]
        bottom = ll[h - 1]
        wh = np.array(SM_WEIGHTS[h], np.int64)[:, None]
        ww = np.array(SM_WEIGHTS[w], np.int64)[None, :]
        if mode == PredictionMode.SMOOTH_PRED:
            sm = (wh * a[None, :] + (256 - wh) * bottom
                  + ww * ll[:, None] + (256 - ww) * right)
            out = (sm + 256) >> 9
        elif mode == PredictionMode.SMOOTH_V_PRED:
            sm = wh * a[None, :] + (256 - wh) * bottom
            out = (sm + 128) >> 8
        else:
            sm = ww * ll[:, None] + (256 - ww) * right
            out = (sm + 128) >> 8
        return np.clip(out, 0, maxv).astype(np.int32)
    raise NotImplementedError(mode)
