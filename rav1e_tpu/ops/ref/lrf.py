"""Loop restoration filters (AV1 spec 7.17) - numpy reference.

Reference parity: rav1e src/lrf.rs (Wiener 7-tap solve/apply, SGRPROJ
box sums, stripe processing). This implements the normative filters;
the decode oracles arbitrate rounding and stripe clamping.

Wiener: separable 7-tap, taps (w0,w1,w2) per direction with the center
implied (128 - 2*(w0+w1+w2)); vertical pass with InterRound0 rounding
into a clamped intermediate, then horizontal with InterRound1.

Stripes: restoration operates on 64-row stripes offset so the first
stripe is 56 rows; filter rows clamp to within 2 rows of the stripe
edge. With CDEF off, the stripe boundary pixels equal the frame
pixels, so no separate pre-CDEF boundary buffer is needed.
"""

from __future__ import annotations

import numpy as np

WIENER_TAPS_MID = (3, -7, 15)
WIENER_TAPS_MIN = (-5, -23, -17)
WIENER_TAPS_MAX = (10, 8, 46)
WIENER_TAPS_K = (1, 2, 3)


def _wiener_7(taps3):
    w0, w1, w2 = taps3
    return np.array([w0, w1, w2, 128 - 2 * (w0 + w1 + w2), w2, w1, w0],
                    np.int64)


def wiener_filter_unit(src: np.ndarray, y0: int, x0: int, h: int, w: int,
                       vtaps, htaps, bd: int = 8,
                       stripe_h0: int = 56, stripe_h: int = 64
                       ) -> np.ndarray:
    """Filter one LRU [y0:y0+h, x0:x0+w] of plane `src` (the CDEF
    output). Horizontal pass first with a positive bias into a clamped
    intermediate, then vertical subtracting the propagated bias
    (dav1d/libaom wiener semantics). Filter rows clamp to the
    containing stripe +-2; columns clamp to the frame."""
    ph, pw = src.shape
    vf = _wiener_7(vtaps)
    hf = _wiener_7(htaps)
    rb_h = 3 + (2 if bd == 12 else 0)
    rb_v = 11 - (2 if bd == 12 else 0)
    off_h = 1 << (rb_h - 1)
    bias_h = 1 << (bd + 6)
    clip_lim = 1 << (bd + 1 + 7 - rb_h)
    off_v = 1 << (rb_v - 1)
    round_off_v = 1 << (bd + rb_v - 1)
    out = np.zeros((h, w), np.int64)
    cols = np.clip(np.arange(x0 - 3, x0 + w + 3), 0, pw - 1)
    for yy in range(y0, y0 + h):
        # stripe bounds for this row (first stripe is 8 rows shorter)
        if yy < stripe_h0:
            s_lo, s_hi = 0, stripe_h0 - 1
        else:
            k = (yy - stripe_h0) // stripe_h
            s_lo = stripe_h0 + k * stripe_h
            s_hi = s_lo + stripe_h - 1
        lo = max(0, s_lo - 2)
        hi = min(ph - 1, s_hi + 2)
        rows = np.clip(np.arange(yy - 3, yy + 4), lo, hi)
        patch = src[np.ix_(rows, cols)].astype(np.int64)  # [7, w+6]
        # horizontal pass on each of the 7 source rows
        hor = np.full((7, w), bias_h, np.int64)
        for t in range(7):
            hor += hf[t] * patch[:, t: t + w]
        hor = np.clip((hor + off_h) >> rb_h, 0, clip_lim - 1)
        s = np.full(w, -round_off_v, np.int64)
        s += np.tensordot(vf, hor, axes=(0, 0))
        s = (s + off_v) >> rb_v
        out[yy - y0] = np.clip(s, 0, (1 << bd) - 1)
    return out.astype(np.int32)


def solve_wiener(rec: np.ndarray, src: np.ndarray, y0: int, x0: int,
                 h: int, w: int, n_iter: int = 3):
    """Least-squares separable Wiener taps for one unit (alternating
    h/v solves; rav1e src/lrf.rs equivalent). Returns (vtaps, htaps)
    integer taps within the spec ranges."""
    r = rec[max(0, y0 - 3): y0 + h + 3, max(0, x0 - 3): x0 + w + 3]
    oy = y0 - max(0, y0 - 3)
    ox = x0 - max(0, x0 - 3)
    pad = np.pad(r.astype(np.float64), 3, mode="edge")
    t = src[y0: y0 + h, x0: x0 + w].astype(np.float64)

    def taps_vec(taps3):
        a, b, c = taps3
        return np.array([a, b, c, 128 - 2 * (a + b + c), c, b, a],
                        np.float64) / 128.0

    def apply_axis(img, taps3, axis):
        f = taps_vec(taps3)
        out = np.zeros_like(img)
        for k in range(7):
            out += f[k] * np.roll(img, 3 - k, axis=axis)
        return out

    def solve_axis(img, axis):
        """LS for 3 free taps on `img` vs target; basis_j =
        (x[-j-1] + x[+j+1] - 2 x0) / 128."""
        x0c = img[3 + oy: 3 + oy + h, 3 + ox: 3 + ox + w]
        B = []
        for j in range(3):
            d = 3 - j  # tap distance 3,2,1 for coeff index 0,1,2
            m = (np.roll(img, d, axis=axis) + np.roll(img, -d, axis=axis)
                 - 2 * img)[3 + oy: 3 + oy + h, 3 + ox: 3 + ox + w]
            B.append((m / 128.0).ravel())
        Bm = np.stack(B, 1)
        resid = (t - x0c).ravel()
        try:
            sol, *_ = np.linalg.lstsq(Bm, resid, rcond=None)
        except np.linalg.LinAlgError:
            return list(WIENER_TAPS_MID)
        taps = [int(np.clip(round(sol[j]), WIENER_TAPS_MIN[j],
                            WIENER_TAPS_MAX[j])) for j in range(3)]
        return taps

    v = list(WIENER_TAPS_MID)
    hh = list(WIENER_TAPS_MID)
    for _ in range(n_iter):
        vert = apply_axis(pad, v, 0)
        hh = solve_axis(vert, 1)
        horz = apply_axis(pad, hh, 1)
        v = solve_axis(horz, 0)
    return tuple(v), tuple(hh)


# per-set (s0, s1) strengths for the two SGR passes (r=2 then r=1),
# extracted from libdav1d .rodata@68768; s == 0 disables the pass
SGR_PARAMS_S = [
    (140, 3236), (112, 2158), (93, 1618), (80, 1438),
    (70, 1295), (58, 1177), (47, 1079), (37, 996),
    (30, 925), (25, 863), (0, 2589), (0, 1618),
    (0, 1177), (0, 925), (56, 0), (22, 0),
]
SGRPROJ_XQD_MIN = (-96, -32)
SGRPROJ_XQD_MAX = (31, 95)
SGRPROJ_XQD_MID = (-32, 31)
SGRPROJ_PRJ_SUBEXP_K = 4


def _sgr_box(src: np.ndarray, r: int, s: int, bd: int = 8):
    """One self-guided pass: per-pixel (A, B) from (2r+1)^2 box sums
    (spec 7.17.3 boxsum + selfguided intermediate)."""
    ph, pw = src.shape
    x = src.astype(np.int64)
    n = (2 * r + 1) ** 2
    # edge-extended integral sums
    pad = np.pad(x, r, mode="edge")
    pad2 = pad * pad
    c1 = np.cumsum(np.cumsum(np.pad(pad, ((1, 0), (1, 0))), 0), 1)
    c2 = np.cumsum(np.cumsum(np.pad(pad2, ((1, 0), (1, 0))), 0), 1)

    def box(c):
        k = 2 * r + 1
        return (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k])

    b = box(c1)       # sum of x
    a = box(c2)       # sum of x^2
    if bd > 8:
        d = bd - 8
        a = (a + (1 << (2 * d - 1))) >> (2 * d)
        b = (b + (1 << (d - 1))) >> d
    p = np.maximum(0, a * n - b * b)
    z = (p * s + (1 << 19)) >> 20
    A = np.where(z >= 255, 256,
                 np.where(z == 0, 1, ((z << 8) + z // 2) // (z + 1)))
    one_over_n = ((1 << 12) + (n >> 1)) // n
    B = ((256 - A) * b * one_over_n + (1 << 11)) >> 12
    return A, B


def sgr_filter_unit(src: np.ndarray, y0: int, x0: int, h: int, w: int,
                    sgr_set: int, xqd0: int, xqd1: int,
                    bd: int = 8) -> np.ndarray:
    """SGRPROJ restoration for one unit (spec 7.17.3): up to two
    self-guided passes (r=2 on even rows, r=1 everywhere) projected
    onto the source with the coded xqd weights."""
    s0, s1 = SGR_PARAMS_S[sgr_set]
    ph, pw = src.shape
    ys = np.arange(y0, y0 + h)
    xs = np.arange(x0, x0 + w)
    x = src[np.ix_(ys, xs)].astype(np.int64)
    u = x << 4
    acc = u << 7

    def cross2(A, B):
        """r=2: A/B valid on even rows; (5,6,5) weights; even output
        rows read their own row (shift 8), odd rows the two even
        neighbours (shift 9). Returns flt at 2^4 scale."""
        Ap = np.pad(A, ((2, 2), (1, 1)), mode="edge")
        Bp = np.pad(B, ((2, 2), (1, 1)), mode="edge")
        out = np.zeros((h, w), np.int64)
        for i, yy in enumerate(ys):
            xi = xs + 1
            if (yy & 1) == 0:
                r = yy + 2
                a = 5 * (Ap[r, xi - 1] + Ap[r, xi + 1]) + 6 * Ap[r, xi]
                b = 5 * (Bp[r, xi - 1] + Bp[r, xi + 1]) + 6 * Bp[r, xi]
                sh = 8
            else:
                a = b = 0
                for r in (yy + 1, yy + 3):
                    a = a + 5 * (Ap[r, xi - 1] + Ap[r, xi + 1]) \
                        + 6 * Ap[r, xi]
                    b = b + 5 * (Bp[r, xi - 1] + Bp[r, xi + 1]) \
                        + 6 * Bp[r, xi]
                sh = 9
            v = a * x[i] + b
            out[i] = (v + (1 << (sh - 1))) >> sh
        return out

    def cross1(A, B):
        """r=1: full 3x3 (3/4 weights), shift 9."""
        Ap = np.pad(A, 1, mode="edge")
        Bp = np.pad(B, 1, mode="edge")
        out = np.zeros((h, w), np.int64)
        wgt = [(3, 4, 3), (4, 4, 4), (3, 4, 3)]
        for i, yy in enumerate(ys):
            xi = xs + 1
            a = b = 0
            for dy in (-1, 0, 1):
                r = yy + 1 + dy
                w3 = wgt[dy + 1]
                a = a + w3[0] * Ap[r, xi - 1] + w3[1] * Ap[r, xi] \
                    + w3[2] * Ap[r, xi + 1]
                b = b + w3[0] * Bp[r, xi - 1] + w3[1] * Bp[r, xi] \
                    + w3[2] * Bp[r, xi + 1]
            v = a * x[i] + b
            out[i] = (v + (1 << 8)) >> 9
        return out

    if s0 and xqd0:
        A0, B0 = _sgr_box(src, 2, s0, bd)
        acc = acc + xqd0 * (cross2(A0, B0) - u)
    if s1 and xqd1:
        A1, B1 = _sgr_box(src, 1, s1, bd)
        acc = acc + xqd1 * (cross1(A1, B1) - u)
    out = (acc + (1 << 10)) >> 11
    return np.clip(out, 0, (1 << bd) - 1).astype(np.int32)


def count_units(frame_size: int, unit_size: int) -> int:
    """Spec count_units_in_frame: last partial unit merges when under
    half a unit."""
    return max((frame_size + (unit_size >> 1)) // unit_size, 1)
