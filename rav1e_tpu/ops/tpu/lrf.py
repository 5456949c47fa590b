"""Loop restoration search + apply on TPU (batched JAX twin of
ops/ref/lrf.py; reference parity: rav1e src/lrf.rs + the LRF leg of
src/rdo.rs::rdo_loop_decision).

TPU-first restructure: instead of the reference's per-unit host loop,
the plane is gathered ONCE into a [P, PH, PW] batch of stripe-piece
patches (LR units are stripe-aligned vertically, so one clamped row
gather per piece bakes in ALL spec stripe semantics — reads clamp to
stripe +-2 then the frame). Every candidate filter then runs as dense
batched integer ops:

* Wiener: separable 7-tap with per-piece taps as [P] scalars — the
  LS-solved taps and the 3 presets evaluate in ONE vmapped pass.
* SGRPROJ: box sums via 2D cumsum on the patch batch, the z = p*s
  dance in 13-bit hi/lo pieces (TPU int32 lanes; the reference uses
  int64), per-set batched.
* Tap solves: float32 normal equations per unit (closed-form 2x2/3x3)
  — tap choice is encoder-side policy, only the APPLY must be
  bit-exact, and it is (verified against ops.ref and the oracles).

The host keeps only the final per-unit argmin + grid assembly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.ops.ref.lrf import (SGR_PARAMS_S, SGRPROJ_XQD_MAX,
                                   SGRPROJ_XQD_MIN, WIENER_TAPS_MAX,
                                   WIENER_TAPS_MIN, count_units)

SGR_SETS = (0, 3, 6, 9, 11, 12, 14, 15)
WIENER_PRESETS = ((3, -7, 15), (0, -4, 8), (1, -2, 4))


def _piece_geometry(ph: int, pw: int, ss: int, unit_size: int = 64):
    """Static piece/unit layout for a plane.

    Returns dict with per-piece row gathers and metadata. A piece is
    the intersection of one LR unit with one stripe; all clamping is
    static (np at trace time)."""
    off = 8 >> ss
    stripe_h = 64 >> ss
    stripe_h0 = stripe_h - off
    n_ur = count_units(ph, unit_size)
    n_uc = count_units(pw, unit_size)
    # unit row bands
    ubands = []
    for ur in range(n_ur):
        y0 = 0 if ur == 0 else ur * unit_size - off
        y1 = ph if ur == n_ur - 1 else (ur + 1) * unit_size - off
        ubands.append((y0, y1))
    # column bands
    cbands = []
    for uc in range(n_uc):
        x0 = uc * unit_size
        x1 = pw if uc == n_uc - 1 else (uc + 1) * unit_size
        cbands.append((x0, x1))

    def stripe_of(y):
        if y < stripe_h0:
            return 0, stripe_h0 - 1
        k = (y - stripe_h0) // stripe_h
        lo = stripe_h0 + k * stripe_h
        return lo, lo + stripe_h - 1

    # pieces: (unit_row, y0, y1, row_lo, row_hi)
    pieces = []
    for ur, (y0, y1) in enumerate(ubands):
        yy = y0
        while yy < y1:
            s_lo, s_hi = stripe_of(yy)
            y_hi = min(s_hi + 1, y1)
            pieces.append((ur, yy, y_hi,
                           max(0, s_lo - 2), min(ph - 1, s_hi + 2)))
            yy = y_hi
    max_h = max(p[2] - p[1] for p in pieces)
    max_w = max(x1 - x0 for x0, x1 in cbands)
    return dict(n_ur=n_ur, n_uc=n_uc, ubands=ubands, cbands=cbands,
                pieces=pieces, max_h=max_h, max_w=max_w,
                stripe_h0=stripe_h0, stripe_h=stripe_h)


@lru_cache(maxsize=8)
def _gather_maps(ph: int, pw: int, ss: int, halo: int,
                 unit_size: int = 64):
    """Static (rows_idx [P, PH], cols_idx [P, PW], valid masks) for
    the piece-patch gather with `halo` px of clamped context. Rows
    clamp to the piece's stripe +-2 then the frame; cols clamp to the
    frame (spec get_source_sample)."""
    g = _piece_geometry(ph, pw, ss, unit_size)
    pieces, cbands = g["pieces"], g["cbands"]
    P = len(pieces) * len(cbands)
    PH = g["max_h"] + 2 * halo
    PW = g["max_w"] + 2 * halo
    rows = np.zeros((P, PH), np.int32)
    cols = np.zeros((P, PW), np.int32)
    hmask = np.zeros((P, g["max_h"]), bool)   # valid output rows
    wmask = np.zeros((P, g["max_w"]), bool)   # valid output cols
    meta = []  # (unit_row, unit_col, y0, h, x0, w)
    k = 0
    for (ur, y0, y1, rlo, rhi) in pieces:
        for uc, (x0, x1) in enumerate(cbands):
            h, w = y1 - y0, x1 - x0
            rows[k] = np.clip(np.arange(y0 - halo, y0 - halo + PH),
                              rlo, rhi)
            cols[k] = np.clip(np.arange(x0 - halo, x0 - halo + PW),
                              0, pw - 1)
            hmask[k, :h] = True
            wmask[k, :w] = True
            meta.append((ur, uc, y0, h, x0, w))
            k += 1
    return g, rows, cols, hmask, wmask, meta


def _gather_patches(plane, rows, cols):
    """[P, PH, PW] piece patches from one [ph, pw] plane."""
    return plane[rows[:, :, None], cols[:, None, :]]


# ---------------------------------------------------------------- #
# Wiener                                                            #
# ---------------------------------------------------------------- #

def _wiener_solve_batch(patch, tgt, wmask, hmask, chroma: bool):
    """Batched float32 alternating LS for the separable taps
    (solve_wiener twin; encoder policy, need not match numpy bitwise).
    patch [P, H+6, W+6] float32 edge-padded like np.pad(edge) — the
    gather maps already edge-replicate; tgt [P, H, W] float32;
    masks select valid pixels. Returns (v0..2, h0..2) int32 [P]."""
    P, PH, PW = patch.shape
    H, W = PH - 6, PW - 6
    mask = (hmask[:, :, None] & wmask[:, None, :]).astype(jnp.float32)
    j0 = 1 if chroma else 0
    mins = jnp.asarray(WIENER_TAPS_MIN, jnp.float32)
    maxs = jnp.asarray(WIENER_TAPS_MAX, jnp.float32)

    def taps7(t3):
        # t3 [P, 3] float -> normalized application via 3 symmetric
        # pairs + center
        return t3

    def apply_axis(img, t3, axis):
        # img [P, PH, PW]; 7-tap symmetric with center implied, /128
        if axis == 1:
            s = lambda d: jnp.roll(img, -d, axis=1)
        else:
            s = lambda d: jnp.roll(img, -d, axis=2)
        c = 128.0 - 2.0 * (t3[:, 0] + t3[:, 1] + t3[:, 2])
        out = (t3[:, 0, None, None] * (s(-3) + s(3))
               + t3[:, 1, None, None] * (s(-2) + s(2))
               + t3[:, 2, None, None] * (s(-1) + s(1))
               + c[:, None, None] * img)
        return out / 128.0

    def solve_axis(img, axis):
        # basis_j = (x[-d] + x[+d] - 2 x0) / 128, d = 3 - j
        if axis == 1:
            s = lambda d: img[:, 3 + d: 3 + d + H, 3: 3 + W]
        else:
            s = lambda d: img[:, 3: 3 + H, 3 + d: 3 + d + W]
        x0c = s(0)
        resid = (tgt - x0c) * mask
        Bs = []
        for j in range(3):
            d = 3 - j
            Bs.append(((s(-d) + s(d) - 2 * x0c) / 128.0) * mask)
        # normal equations over the free taps
        n = 3 - j0
        G = jnp.stack([jnp.stack([
            jnp.sum(Bs[j0 + i] * Bs[j0 + jj], axis=(1, 2))
            for jj in range(n)], -1) for i in range(n)], -2)
        r = jnp.stack([jnp.sum(Bs[j0 + i] * resid, axis=(1, 2))
                       for i in range(n)], -1)
        G = G + 1e-4 * jnp.eye(n, dtype=jnp.float32)
        sol = jnp.linalg.solve(G, r[..., None])[..., 0]  # [P, n]
        if j0:
            sol = jnp.concatenate(
                [jnp.zeros((P, 1), jnp.float32), sol], axis=1)
        sol = jnp.clip(jnp.round(sol), mins, maxs)
        if j0:
            sol = sol.at[:, 0].set(0.0)
        return sol

    mid = jnp.asarray([0.0 if chroma else 3.0, -7.0, 15.0],
                      jnp.float32)
    v = jnp.broadcast_to(mid, (P, 3))
    hh = v
    for _ in range(3):
        vert = apply_axis(patch, v, 1)
        hh = solve_axis(vert, 2)
        horz = apply_axis(patch, hh, 2)
        v = solve_axis(horz, 1)
    return v.astype(jnp.int32), hh.astype(jnp.int32)


# ---------------------------------------------------------------- #
# SGRPROJ                                                           #
# ---------------------------------------------------------------- #

def _mul_shift20(p, s: int):
    """(p * s + 2^19) >> 20 for p up to ~2^26 in int32 lanes: split p
    at 13 bits (the reference runs this in int64)."""
    p_hi = p >> 13
    p_lo = p & 0x1FFF
    t = p_lo * s + (1 << 19)
    return (p_hi * s + (t >> 13)) >> 7


def _sgr_ab_batch(patch, r: int, s: int, bd: int):
    """(A, B) on the extended [-1..H] x [-1..W] grid for a batch of
    stripe-piece patches (ops/ref/lrf.py _sgr_ab twin). patch
    [P, H+2+2r, W+2+2r] int32 with row/col clamping pre-baked
    (halo = 1 + r). Returns A, B [P, H+2, W+2] int32."""
    n = (2 * r + 1) ** 2
    e = patch
    c1 = jnp.cumsum(jnp.cumsum(
        jnp.pad(e, ((0, 0), (1, 0), (1, 0))), 1), 2)
    c2 = jnp.cumsum(jnp.cumsum(
        jnp.pad(e * e, ((0, 0), (1, 0), (1, 0))), 1), 2)
    k = 2 * r + 1

    def box(c):
        return (c[:, k:, k:] - c[:, :-k, k:]
                - c[:, k:, :-k] + c[:, :-k, :-k])

    b = box(c1)
    a = box(c2)
    if bd > 8:
        d = bd - 8
        a = (a + (1 << (2 * d - 1))) >> (2 * d)
        b = (b + (1 << (d - 1))) >> d
    p = jnp.maximum(0, a * n - b * b)
    z = _mul_shift20(p, s)
    A = jnp.where(z >= 255, 256,
                  jnp.where(z == 0, 1,
                            ((z << 8) + (z >> 1)) // (z + 1)))
    one_over_n = ((1 << 12) + (n >> 1)) // n
    B = ((256 - A) * b * one_over_n + (1 << 11)) >> 12
    return A, B


def _sgr_flt_batch(patch_r2, patch_x, r: int, s: int, bd: int,
                   row_par):
    """One self-guided pass at 2^4 scale over a piece batch
    (_sgr_flt_piece twin). patch_r2 [P, H+2+2r, W+2+2r] (halo 1+r);
    patch_x [P, H, W] the unit pixels; row_par [P, H] = (local row
    index & 1) validity for the r=2 odd/even split. Returns
    [P, H, W] int32."""
    A, B = _sgr_ab_batch(patch_r2, r, s, bd)
    P, H, W = patch_x.shape
    x = patch_x
    if r == 2:
        # odd rows: own-row (5,6,5) shift 8; even rows: rows i-1/i+1
        # combined, shift 9. A/B local grid row g = i + 1.
        def row3(M, g0):
            # M [P, H+2, W+2] -> per-output-row (5,6,5) across cols,
            # rows offset g0
            sl = M[:, g0: g0 + H, :]
            return 5 * (sl[:, :, :-2] + sl[:, :, 2:]) + 6 * sl[:, :, 1:-1]

        a_odd = row3(A, 1)
        b_odd = row3(B, 1)
        a_ev = row3(A, 0) + row3(A, 2)
        b_ev = row3(B, 0) + row3(B, 2)
        odd = row_par.astype(bool)[:, :, None]
        out = jnp.where(
            odd,
            (a_odd * x + b_odd + (1 << 7)) >> 8,
            (a_ev * x + b_ev + (1 << 8)) >> 9)
    else:
        wgt = ((3, 4, 3), (4, 4, 4), (3, 4, 3))
        a = 0
        b = 0
        for dy, w3 in zip((0, 1, 2), wgt):
            As = A[:, dy: dy + H, :]
            Bs = B[:, dy: dy + H, :]
            a = (a + w3[0] * As[:, :, :-2] + w3[1] * As[:, :, 1:-1]
                 + w3[2] * As[:, :, 2:])
            b = (b + w3[0] * Bs[:, :, :-2] + w3[1] * Bs[:, :, 1:-1]
                 + w3[2] * Bs[:, :, 2:])
        out = (a * x + b + (1 << 8)) >> 9
    return out


# ---------------------------------------------------------------- #
# whole-plane search                                                #
# ---------------------------------------------------------------- #

@lru_cache(maxsize=8)
def _search_fn(ph: int, pw: int, ss: int, bd: int, chroma: bool):
    """jitted whole-plane LR search step. Returns a function
    (rec, src) -> dict of per-unit candidate SSEs + params; the host
    does only the argmin + grid assembly."""
    g, rows3, cols3, hmask, wmask, meta = _gather_maps(ph, pw, ss, 3)
    _, rows4, cols4, _, _, _ = _gather_maps(ph, pw, ss, 4)
    P = rows3.shape[0]
    H, W = g["max_h"], g["max_w"]
    n_units = g["n_ur"] * g["n_uc"]
    unit_of = np.asarray([m[0] * g["n_uc"] + m[1] for m in meta],
                         np.int32)
    # local row parity for the r=2 pass: (y - piece_y0) & 1 of each
    # output row; rows beyond the piece height are masked anyway
    row_par = np.zeros((P, H), np.int32)
    for k, (ur, uc, y0, h, x0, w) in enumerate(meta):
        row_par[k, :h] = np.arange(h) & 1
    rows3_j = jnp.asarray(rows3)
    cols3_j = jnp.asarray(cols3)
    rows4_j = jnp.asarray(rows4)
    cols4_j = jnp.asarray(cols4)
    hm = jnp.asarray(hmask)
    wm = jnp.asarray(wmask)
    row_par_j = jnp.asarray(row_par)
    unit_j = jnp.asarray(unit_of)
    mask2 = hm[:, :, None] & wm[:, None, :]

    def unit_sum(v):
        # [P] -> [n_units] sum over pieces
        return jnp.zeros((n_units,), v.dtype).at[unit_j].add(v)

    def sse_of(f, tgt):
        d = jnp.where(mask2, f - tgt, 0).astype(jnp.float32)
        return unit_sum(jnp.sum(d * d, axis=(1, 2)))

    presets = np.asarray(WIENER_PRESETS, np.int32)
    if chroma:
        presets = presets.copy()
        presets[:, 0] = 0

    @jax.jit
    def step(rec, src):
        rec = rec.astype(jnp.int32)
        src = src.astype(jnp.int32)
        p3 = _gather_patches(rec, rows3_j, cols3_j)   # [P, H+6, W+6]
        tgt = p3[:, 3: 3 + H, 3: 3 + W]               # unfiltered rec
        s3 = _gather_patches(src, rows3_j, cols3_j)
        starget = s3[:, 3: 3 + H, 3: 3 + W]
        out = {}
        out["base_sse"] = sse_of(tgt, starget)

        # ---- Wiener: LS taps + presets ----
        vsol, hsol = _wiener_solve_batch(
            p3.astype(jnp.float32), starget.astype(jnp.float32),
            wm, hm, chroma)
        # per-unit taps: all pieces of a unit share the unit's solve —
        # use the FIRST piece's solution for determinism (pieces see
        # slightly different pixels); gather back per piece
        cand_sse = []
        cand_taps = []
        for vt, ht in ([(None, None)]
                       + [(tuple(p), tuple(p)) for p in presets]):
            if vt is None:
                v3, h3 = vsol, hsol
            else:
                v3 = jnp.broadcast_to(
                    jnp.asarray(vt, jnp.int32), (P, 3))
                h3 = jnp.broadcast_to(
                    jnp.asarray(ht, jnp.int32), (P, 3))
            f = _wiener_apply2(p3, v3, h3, bd)
            cand_sse.append(sse_of(f, starget))
            cand_taps.append((v3, h3))
        out["wiener_sse"] = jnp.stack(cand_sse)       # [4, n_units]
        out["wiener_vsol"] = vsol
        out["wiener_hsol"] = hsol

        # ---- SGR sets ----
        p4 = _gather_patches(rec, rows4_j, cols4_j)   # halo 4 (r=2+1+1)
        u = tgt << 4
        tgt7 = ((starget - tgt) << 11).astype(jnp.float32)
        sgr_sse = []
        sgr_xqd = []
        for sset in SGR_SETS:
            s0, s1 = SGR_PARAMS_S[sset]
            if s0:
                f0 = _sgr_flt_batch(p4[:, 1: -1, 1: -1], tgt, 2, s0,
                                    bd, row_par_j)
            else:
                f0 = u
            if s1:
                f1 = _sgr_flt_batch(p4[:, 2: -2, 2: -2], tgt, 1, s1,
                                    bd, row_par_j)
            else:
                f1 = u
            # LS weights per unit on (f - u) at 2^4 scale; target at
            # 2^11 relative scale like the reference ((tgt - u) << 7)
            a = jnp.where(mask2, f0 - u, 0).astype(jnp.float32)
            b = jnp.where(mask2, f1 - u, 0).astype(jnp.float32)
            aa = unit_sum(jnp.sum(a * a, (1, 2)))
            ab = unit_sum(jnp.sum(a * b, (1, 2)))
            bb = unit_sum(jnp.sum(b * b, (1, 2)))
            at = unit_sum(jnp.sum(a * tgt7, (1, 2)))
            bt = unit_sum(jnp.sum(b * tgt7, (1, 2)))
            if s0 and s1:
                det = aa * bb - ab * ab + 1e-6
                w0f = (at * bb - bt * ab) / det
                w2f = (bt * aa - at * ab) / det
            elif s0:
                w0f = at / jnp.maximum(aa, 1e-9)
                w2f = jnp.zeros_like(w0f)
            else:
                w0f = jnp.zeros_like(at)
                w2f = bt / jnp.maximum(bb, 1e-9)
            x0q = jnp.clip(jnp.round(w0f), SGRPROJ_XQD_MIN[0],
                           SGRPROJ_XQD_MAX[0]).astype(jnp.int32)
            if not s0:
                x0q = jnp.zeros_like(x0q)
            x1q = jnp.clip((1 << 7) - x0q
                           - jnp.round(w2f).astype(jnp.int32),
                           SGRPROJ_XQD_MIN[1], SGRPROJ_XQD_MAX[1])
            if not s1:
                x1q = jnp.clip(jnp.full_like(x0q, (1 << 7)) - x0q,
                               SGRPROJ_XQD_MIN[1], SGRPROJ_XQD_MAX[1])
            # apply with the quantized weights (sgr_filter_unit twin)
            w0 = x0q if s0 else jnp.zeros_like(x0q)
            w1 = x1q if s1 else (1 << 7) - w0
            w2 = (1 << 7) - w0 - w1
            w0p = w0[unit_j][:, None, None]
            w1p = w1[unit_j][:, None, None]
            w2p = w2[unit_j][:, None, None]
            acc = w1p * u + w0p * f0 + w2p * f1
            fs = jnp.clip((acc + (1 << 10)) >> 11, 0, (1 << bd) - 1)
            sgr_sse.append(sse_of(fs, starget))
            sgr_xqd.append(jnp.stack([x0q, x1q], -1))
        out["sgr_sse"] = jnp.stack(sgr_sse)           # [S, n_units]
        out["sgr_xqd"] = jnp.stack(sgr_xqd)           # [S, n_units, 2]
        return out

    return step, g, meta, unit_of


def _wiener_apply2(patch, v3, h3, bd):
    """Separable Wiener with distinct per-piece vertical (axis 1) and
    horizontal (axis 2) tap triples (integer, spec rounding)."""
    rb_h = 3 + (2 if bd == 12 else 0)
    rb_v = 11 - (2 if bd == 12 else 0)
    off_h = 1 << (rb_h - 1)
    bias_h = 1 << (bd + 6)
    clip_lim = 1 << (bd + 1 + 7 - rb_h)
    off_v = 1 << (rb_v - 1)
    round_off_v = 1 << (bd + rb_v - 1)
    P, PH, PW = patch.shape
    H, W = PH - 6, PW - 6

    def sep(x, t3, axis, n_keep):
        if axis == 1:
            s = lambda d: x[:, 3 + d: 3 + d + n_keep, :]
        else:
            s = lambda d: x[:, :, 3 + d: 3 + d + n_keep]
        c = (128 - 2 * (t3[:, 0] + t3[:, 1] + t3[:, 2]))[:, None, None]
        return (t3[:, 0, None, None] * (s(-3) + s(3))
                + t3[:, 1, None, None] * (s(-2) + s(2))
                + t3[:, 2, None, None] * (s(-1) + s(1)) + c * s(0))

    hor = bias_h + sep(patch, h3, 2, W)              # [P, PH, W]
    hor = jnp.clip((hor + off_h) >> rb_h, 0, clip_lim - 1)
    out = sep(hor, v3, 1, H) - round_off_v
    out = (out + off_v) >> rb_v
    return jnp.clip(out, 0, (1 << bd) - 1)


def search_lr_plane_tpu(rec: np.ndarray, src: np.ndarray,
                        bd: int = 8, ss: int = 0,
                        chroma: bool | None = None):
    """Drop-in twin of ops/ref/lrf.py::search_lr_plane — same return
    contract (grid, filtered plane, used flag) — with the whole search
    on device and only the per-unit argmin + apply-assembly on host.

    The final filtered plane is assembled with the REFERENCE per-unit
    integer apply for the winning params (bit-exactness belt: one
    numpy pass over only the units that chose a filter)."""
    from rav1e_tpu.ops.ref.lrf import sgr_filter_unit, wiener_filter_unit
    if chroma is None:
        chroma = ss > 0
    ph, pw = rec.shape
    step, g, meta, unit_of = _search_fn(ph, pw, ss, bd, bool(chroma))
    out = jax.device_get(step(jnp.asarray(np.asarray(rec, np.int32)),
                              jnp.asarray(np.asarray(src, np.int32))))
    n_ur, n_uc = g["n_ur"], g["n_uc"]
    base = out["base_sse"]
    wien = out["wiener_sse"]             # [4, U]
    sgr = out["sgr_sse"]                 # [S, U]
    # per-unit LS taps: from the unit's FIRST piece
    first_piece = {}
    for k, m in enumerate(meta):
        u = m[0] * n_uc + m[1]
        first_piece.setdefault(u, k)
    vsol = out["wiener_vsol"]
    hsol = out["wiener_hsol"]
    xqd = out["sgr_xqd"]                 # [S, U, 2]
    off = 8 >> ss
    stripe_h = 64 >> ss
    stripe_h0 = stripe_h - off
    grid = [[None] * n_uc for _ in range(n_ur)]
    filtered = np.asarray(rec, np.int32).copy()
    used = False
    for ur in range(n_ur):
        y0u, y1u = g["ubands"][ur]
        for uc in range(n_uc):
            u = ur * n_uc + uc
            b = float(base[u])
            cands = []
            fp = first_piece[u]
            for ci in range(wien.shape[0]):
                if ci == 0:
                    vt = tuple(int(t) for t in vsol[fp])
                    ht = tuple(int(t) for t in hsol[fp])
                else:
                    p = WIENER_PRESETS[ci - 1]
                    p = (0, p[1], p[2]) if chroma else p
                    vt = ht = p
                cands.append((float(wien[ci, u]), ("W", vt, ht)))
            for si, sset in enumerate(SGR_SETS):
                cands.append((float(sgr[si, u]),
                              ("S", sset, int(xqd[si, u, 0]),
                               int(xqd[si, u, 1]))))
            best_sse, best_kind = min(cands, key=lambda c: c[0])
            if best_sse >= b:
                continue
            x0 = uc * 64
            x1 = pw if uc == n_uc - 1 else (uc + 1) * 64
            h, w = y1u - y0u, x1 - x0
            if best_kind[0] == "W":
                f = wiener_filter_unit(rec, y0u, x0, h, w,
                                       best_kind[1], best_kind[2],
                                       bd=bd, stripe_h0=stripe_h0,
                                       stripe_h=stripe_h)
            else:
                f = sgr_filter_unit(rec, y0u, x0, h, w, best_kind[1],
                                    best_kind[2], best_kind[3],
                                    bd=bd, stripe_h0=stripe_h0,
                                    stripe_h=stripe_h)
            grid[ur][uc] = best_kind
            filtered[y0u:y1u, x0:x1] = f
            used = True
    return grid, filtered, used
