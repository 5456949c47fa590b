"""Fractional-bit cost tables from the default CDFs (WriterCounter twin).

rav1e prices every RDO candidate by running the real writer against a
bit-counting personality (src/ec.rs::WriterCounter, OD_BITRES fixed
point) with CDF checkpoint/rollback. The TPU inversion (SURVEY §7.0):
precompute per-symbol fractional-bit costs from the frame-initial
CDFs once per qindex, then evaluate whole candidate sets in one
batched pass. Costs are float bits; context-dependent tables are
averaged over contexts in probability space (the per-symbol *shape*
is what steers decisions; the λ calibration absorbs scale).

Structure mirrors entropy/coeffs.py::write_coeffs exactly:
  txb_skip → eob_pt (+hi bit + raw lsbs) → coeff_base_eob /
  coeff_base (+coeff_br chains) → signs + golomb tails.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from rav1e_tpu.core.constants import TxSize, TxType
from rav1e_tpu.entropy.cdf import qctx_for_qidx, tables
from rav1e_tpu.entropy.coeffs import (
    COEFF_BASE_RANGE,
    NUM_BASE_LEVELS,
    scan_order,
    tx_class,
    txs_ctx,
)

PROB_TOP = 1 << 15


def symbol_bits(icdf_row: np.ndarray) -> np.ndarray:
    """Bits to code each symbol of one inverse-CDF record.

    icdf convention (entropy/ec.py): fl = 32768 for s==0 else
    icdf[s-1]; fh = icdf[s]; p(s) = (fl - fh)/32768."""
    row = np.asarray(icdf_row, np.float64)
    fl = np.concatenate([[PROB_TOP], row[:-1]])
    p = np.maximum(fl - row, 1.0) / PROB_TOP
    return (-np.log2(p)).astype(np.float64)


def _avg_bits(cdf_block: np.ndarray) -> np.ndarray:
    """Average probabilities over all leading (context) axes, then
    convert to bits. cdf_block: [..., nsym] inverse CDFs."""
    b = np.asarray(cdf_block, np.float64)
    flat = b.reshape(-1, b.shape[-1])
    fl = np.concatenate([np.full((flat.shape[0], 1), PROB_TOP), flat[:, :-1]],
                        axis=1)
    p = np.maximum(fl - flat, 1.0) / PROB_TOP
    return -np.log2(np.mean(p, axis=0))


@lru_cache(maxsize=64)
def scan_pos_map(tx_size: TxSize, tx_type: TxType) -> np.ndarray:
    """[h, w] int32 map: pixel position -> index in scan order."""
    sw, sh = min(tx_size.width, 32), min(tx_size.height, 32)
    scan = scan_order(sw, sh, tx_class(tx_type))
    inv = np.empty(sw * sh, np.int32)
    inv[scan] = np.arange(sw * sh, dtype=np.int32)
    return inv.reshape(sh, sw)


def _br_chain(br_bits_row: np.ndarray) -> np.ndarray:
    """Cost of the coeff_br chain for |level| 0..15 given one context's
    per-symbol br bits ([4]): zero below 3; for L in 3..14 the rounds
    code min(L-3-idx, 3) until a symbol < 3; L=15 codes 3,3,3,3."""
    out = np.zeros(16)
    for L in range(3, 16):
        rng = L - 1 - NUM_BASE_LEVELS
        idx = 0
        while idx < COEFF_BASE_RANGE:
            k = min(rng - idx, 3)
            out[L] += br_bits_row[k]
            if k < 3:
                break
            idx += 3
    return out


@lru_cache(maxsize=32)
def tx_block_cost_luts(qindex: int, tx_size: TxSize, tx_type: TxType,
                       plane: int):
    """Context-exact cost LUTs for batched coefficient-rate evaluation
    of one (tx_size, tx_type, plane) slot. The coeff_base / coeff_br
    contexts depend only on *neighbor levels within the block* plus the
    scan-region offset, so the batched evaluator can reproduce the
    serial writer's context chain exactly (modulo in-tile CDF
    adaptation). Matches entropy/coeffs.py::write_coeffs.

    Returns dict of numpy arrays:
      scan_pos  [h,w]   position -> scan index
      off_grid  [h,w]   base-ctx region offset (2D class)
      base_bits [41][4] coeff_base bits by exact ctx
      eob_base_bits [4][3]  coeff_base_eob bits by eob region ctx
      br_lvl_bits  [21][16] br-chain bits for |level| by br ctx
      eob_cost  [n+1]   eob_pt + positional-extra bits by eob count
      eob_region [h,w]  coeff_base_eob region ctx by scan index is
                        computed from scan_pos at eval time (0..3)
      skip1, skip0      all_zero=1 / =0 bits (txb_skip ctx 0)
    """
    t = tables()
    q = qctx_for_qidx(qindex)
    tctx = txs_ctx(tx_size)
    pl = 0 if plane == 0 else 1
    tc = tx_class(tx_type)
    sw, sh = min(tx_size.width, 32), min(tx_size.height, 32)
    sp = scan_pos_map(tx_size, tx_type)
    n = sp.size

    base_bits = np.stack([symbol_bits(r)
                          for r in t["coeff_base"][q][tctx][pl]])
    eob_base_bits = np.stack([symbol_bits(r)
                              for r in t["coeff_base_eob"][q][tctx][pl]])
    br_rows = t["coeff_br"][q][min(tctx, 3)][pl]
    br_lvl_bits = np.stack([_br_chain(symbol_bits(r)) for r in br_rows])

    # base-ctx region offsets (TX_CLASS_2D); 1-D classes use the
    # position-derived 0/7/14 offsets
    from rav1e_tpu.entropy.coeffs import TX_CLASS_2D, TX_CLASS_VERT, \
        _lo_offsets
    off_grid = np.zeros((sh, sw), np.int32)
    if tc == TX_CLASS_2D:
        offs = _lo_offsets(sw, sh)
        rr = np.minimum(np.arange(sh), 4)[:, None]
        cc = np.minimum(np.arange(sw), 4)[None, :]
        off_grid = offs[rr, cc].astype(np.int32)
    else:
        pos = (np.arange(sh)[:, None] if tc == TX_CLASS_VERT
               else np.arange(sw)[None, :])
        off_grid = np.where(pos == 0, 0,
                            np.where(pos == 1, 7, 14)
                            ).astype(np.int32) * np.ones((sh, sw), np.int32)

    ptab = t[{16: "eob_pt_16", 64: "eob_pt_64", 128: "eob_pt_128",
              256: "eob_pt_256", 512: "eob_pt_512",
              1024: "eob_pt_1024"}[max(n, 16)]][q][pl]
    if ptab.ndim == 2:       # [emctx][syms]
        ptab = ptab[0 if tc == TX_CLASS_2D else 1]
    pt_bits = symbol_bits(ptab)
    eob_cost = np.zeros(n + 1, np.float32)
    for e in range(1, n + 1):
        pt = 0 if e == 1 else (e - 1).bit_length()
        extra = max(pt - 1, 0)   # 1 cdf hi bit + (pt-2) raw lsbs
        eob_cost[e] = pt_bits[min(pt, len(pt_bits) - 1)] + extra

    sk = symbol_bits(t["txb_skip"][q][tctx][0])
    return {"scan_pos": sp, "off_grid": off_grid,
            "base_bits": base_bits.astype(np.float32),
            "eob_base_bits": eob_base_bits.astype(np.float32),
            "br_lvl_bits": br_lvl_bits.astype(np.float32),
            "eob_cost": eob_cost,
            "skip1": np.float32(sk[1]), "skip0": np.float32(sk[0]),
            "tx_class": tc}


def estimate_block_bits_np(levels: np.ndarray, luts: dict) -> float:
    """Numpy reference of the batched rate model (jnp twin in
    pipelines). levels: signed [h][w]."""
    a = np.abs(levels).astype(np.int32)
    sp = luts["scan_pos"]
    nz = a > 0
    if not nz.any():
        return float(luts["skip1"])
    eob = int(sp[nz].max()) + 1
    h, w = a.shape
    tc = luts["tx_class"]
    lv3 = np.minimum(a, 3)
    lv15 = np.minimum(a, 15)

    def sh2(x, dr, dc):
        out = np.zeros_like(x)
        out[:h - dr if dr else h, :w - dc if dc else w] = x[dr:, dc:]
        return out

    from rav1e_tpu.entropy.coeffs import TX_CLASS_2D, TX_CLASS_VERT
    if tc == TX_CLASS_2D:
        nsum = (sh2(lv3, 0, 1) + sh2(lv3, 1, 0) + sh2(lv3, 1, 1)
                + sh2(lv3, 0, 2) + sh2(lv3, 2, 0))
        brsum = sh2(lv15, 0, 1) + sh2(lv15, 1, 0) + sh2(lv15, 1, 1)
        rr = np.arange(h)[:, None] * np.ones((1, w), int)
        cc = np.arange(w)[None, :] * np.ones((h, 1), int)
        br_off = np.where((rr == 0) & (cc == 0), 0,
                          np.where((rr < 2) & (cc < 2), 7, 14))
    elif tc == TX_CLASS_VERT:
        nsum = (sh2(lv3, 0, 1) + sh2(lv3, 1, 0) + sh2(lv3, 2, 0)
                + sh2(lv3, 3, 0) + sh2(lv3, 4, 0))
        brsum = sh2(lv15, 0, 1) + sh2(lv15, 1, 0) + sh2(lv15, 2, 0)
        br_off = np.where(np.arange(h)[:, None] == 0, 0, 14
                          ) * np.ones((1, w), int)
    else:
        nsum = (sh2(lv3, 0, 1) + sh2(lv3, 1, 0) + sh2(lv3, 0, 2)
                + sh2(lv3, 0, 3) + sh2(lv3, 0, 4))
        brsum = sh2(lv15, 0, 1) + sh2(lv15, 1, 0) + sh2(lv15, 0, 2)
        br_off = np.where(np.arange(w)[None, :] == 0, 0, 14
                          ) * np.ones((h, 1), int)
    bctx = np.minimum((nsum + 1) >> 1, 4) + luts["off_grid"]
    if tc == TX_CLASS_2D:
        bctx[0, 0] = 0
    brctx = np.minimum((brsum + 1) >> 1, 6) + br_off

    base = luts["base_bits"][bctx, lv3]
    br = luts["br_lvl_bits"][brctx, lv15]
    gol = np.where(a > 14,
                   2 * np.floor(np.log2(np.maximum(a - 14, 1))) + 1, 0.0)
    sign = (a > 0).astype(np.float32)
    per = base + br + gol + sign
    # eob position: coded with coeff_base_eob (region ctx), no base
    eregion = np.where(sp == 0, 0,
                       np.where(sp <= (sp.size >> 3), 1,
                                np.where(sp <= (sp.size >> 2), 2, 3)))
    ebits = (luts["eob_base_bits"][eregion, np.maximum(lv3 - 1, 0)]
             + br + gol + sign)
    at_eob = sp == eob - 1
    coded = sp < eob
    total = (float(luts["skip0"]) + float(luts["eob_cost"][eob])
             + float(np.where(at_eob, ebits, per)[coded].sum()))
    return total


# ---- mode / partition / mv costs -------------------------------------------

@lru_cache(maxsize=1)
def mode_cost_tables():
    """Context-averaged mode-signaling costs (bits), numpy float32."""
    t = tables()
    kf_y = _avg_bits(t["kf_y_mode"])           # [13]
    y = _avg_bits(t["y_mode"])                 # [13]
    uv = _avg_bits(t["uv_mode"])               # [13]
    uv_cfl = _avg_bits(t["uv_mode_cfl"])       # [14]
    angle = np.stack([symbol_bits(t["angle_delta"][i]) for i in range(8)])
    cfl_sign = symbol_bits(t["cfl_sign"])      # [8]
    cfl_alpha = np.stack([symbol_bits(t["cfl_alpha"][i]) for i in range(6)])
    skip = np.stack([symbol_bits(t["skip"][i]) for i in range(3)])
    part_mid = _avg_bits(t["partition_mid"].reshape(-1, 10))  # [10]
    part_8 = _avg_bits(t["partition_8"].reshape(-1, t["partition_8"].shape[-1]))
    return {"kf_y_mode": kf_y.astype(np.float32),
            "y_mode": y.astype(np.float32),
            "uv_mode": uv.astype(np.float32),
            "uv_mode_cfl": uv_cfl.astype(np.float32),
            "angle_delta": angle.astype(np.float32),
            "cfl_sign": cfl_sign.astype(np.float32),
            "cfl_alpha": cfl_alpha.astype(np.float32),
            "skip": skip.astype(np.float32),
            "partition_mid": part_mid.astype(np.float32),
            "partition_8": part_8.astype(np.float32)}


@lru_cache(maxsize=1)
def mv_component_bits(max_abs: int = 1024) -> np.ndarray:
    """Bits to code one MV component delta of magnitude m (1/8-pel
    units), m in 0..max_abs, averaged over the two components'
    default CDFs. Includes sign, class, class0/fr/hp or integer
    bits + fr + hp (spec 5.9.27 read_mv_component)."""
    t = tables()
    out = np.zeros(max_abs + 1, np.float32)
    cls_b = (symbol_bits(t["mv0_classes"]) + symbol_bits(t["mv1_classes"])) / 2
    sign_b = float((symbol_bits(t["mv0_sign"])
                    + symbol_bits(t["mv1_sign"])).mean() / 2)
    c0_b = (symbol_bits(t["mv0_class0"]) + symbol_bits(t["mv1_class0"])) / 2
    fr_b = float(((symbol_bits(t["mv0_fr"]) + symbol_bits(t["mv1_fr"])) / 2
                  ).mean())
    hp_b = float(((symbol_bits(t["mv0_hp"]) + symbol_bits(t["mv1_hp"])) / 2
                  ).mean())
    bit_b = ((np.stack([symbol_bits(r) for r in t["mv0_bits"]])
              + np.stack([symbol_bits(r) for r in t["mv1_bits"]])) / 2
             ).mean(axis=1)                     # [10] per-bit cost
    for m in range(1, max_abs + 1):
        z = m - 1
        # spec get_mv_class: class 0 covers z 0..15; class c>0 covers
        # [2^(c+3), 2^(c+4)) with c integer bits
        cls = 0 if z < 16 else min((z >> 3).bit_length() - 1, 10)
        b = sign_b + cls_b[cls]
        if cls == 0:
            b += float(c0_b.mean()) + fr_b + hp_b
        else:
            b += float(bit_b[:cls].sum()) + fr_b + hp_b
        out[m] = b
    # joint cost amortized: ~1.2 bits when either component nonzero
    return out


@lru_cache(maxsize=1)
def inter_mode_bits() -> dict:
    """Context-averaged single-ref inter mode signaling costs (bits).

    AV1 codes NEWMV as newmv_cdf sym 0; else GLOBALMV as zeromv sym 0;
    else refmv_cdf picks NEAREST (0) vs NEAR (1) (+drl index)."""
    t = tables()
    new_b = _avg_bits(t["newmv"])       # [2]: 0 = NEWMV, 1 = not
    zero_b = _avg_bits(t["zeromv"])     # [2]: 0 = GLOBALMV
    ref_b = _avg_bits(t["refmv"])       # [2]: 0 = NEARESTMV
    drl_b = _avg_bits(t["drl"])
    skip_b = _avg_bits(t["skip"])
    return {
        "NEWMV": float(new_b[0]),
        "GLOBALMV": float(new_b[1] + zero_b[0]),
        "NEARESTMV": float(new_b[1] + zero_b[1] + ref_b[0]),
        "NEARMV": float(new_b[1] + zero_b[1] + ref_b[1] + drl_b[0]),
        "skip0": float(skip_b[0]),
        "skip1": float(skip_b[1]),
    }


def rd_lambda(qindex: int, bit_depth: int = 8) -> float:
    """λ for cost = SSE + λ·bits. rav1e (src/rate.rs
    QuantizerParameters) derives λ from the quantizer step; we use the
    same q² shape with the constant calibrated against BD-rate on the
    harness clips (tools/bdrate_vs_rav1e.py)."""
    from rav1e_tpu.ops.ref.quant import dc_q
    q = dc_q(qindex, 0, bit_depth) / (8 << (bit_depth - 8))
    # 0.25 calibrated by BD-rate sweep (the static cost tables
    # over-estimate adapted-CDF bits ~1.3-2x, so the effective
    # constant sits above rav1e's)
    return 0.25 * q * q


def sad_lambda(qindex: int, bit_depth: int = 8) -> float:
    """λ for amplitude-domain costs (SAD / normalized SATD):
    cost = dist + λ_sad·bits. rav1e keeps a separate sad-domain
    lambda proportional to qstep (src/rate.rs QuantizerParameters
    lambda/sad_lambda pair); constant chosen so full-pel/subpel
    decisions match the SSE-domain trade-off at the decision margin
    (dSSE/dSATD ~ qstep/2 for near-deadzone residuals)."""
    from rav1e_tpu.ops.ref.quant import dc_q
    q = dc_q(qindex, 0, bit_depth) / (8 << (bit_depth - 8))
    return 0.65 * q
