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


def predict(mode: PredictionMode, w: int, h: int,
            above: np.ndarray | None, left: np.ndarray | None,
            top_left: int | None, bd: int = 8) -> np.ndarray:
    """Predict a w x h block from neighbor arrays.

    above: length >= w (may be longer for directional), or None if the
    above row is unavailable. left: length >= h or None. Values are
    reconstructed pixels.
    """
    base = 1 << (bd - 1)
    maxv = (1 << bd) - 1
    have_a = above is not None
    have_l = left is not None
    if mode == PredictionMode.DC_PRED:
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
    if mode == PredictionMode.V_PRED:
        a = above if have_a else np.full(w, base - 1, np.int32)
        return np.tile(a[:w].astype(np.int32), (h, 1))
    if mode == PredictionMode.H_PRED:
        ll = left if have_l else np.full(h, base + 1, np.int32)
        return np.tile(ll[:h].astype(np.int32)[:, None], (1, w))
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
