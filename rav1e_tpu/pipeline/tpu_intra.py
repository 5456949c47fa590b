"""TPU wavefront intra encoder (single chip) with batched mode RDO.

The TPU inversion of rav1e's serial SB loop (SURVEY §7.0): blocks on
the same anti-diagonal have no prediction dependency, so each step
batches every block of one diagonal — and every candidate intra mode —
through shared jitted kernels: predict (all modes) -> forward DCT
(MXU) -> quantize -> dequantize -> bit-exact inverse -> reconstruct ->
RD-cost argmin. Whole frame = one lax.fori_loop dispatch.

Mirrors rav1e's rdo_mode_decision (src/rdo.rs) restructured as
fixed-shape candidate evaluation. Rate is the WriterCounter twin
(entropy/cost.py): context-exact coefficient bit costs + mode
signaling bits, cost = SSE + λ·bits with λ from the quantizer step
(src/rate.rs QuantizerParameters analog). Quantizer and cost tables
enter as traced values — rate-control q changes never recompile.

Entropy packing consumes the level/mode grids afterwards through the
native C++ packer (two-plane IR, SURVEY §7.0).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.core.constants import (
    BlockSize,
    FrameType,
    PartitionType,
    PredictionMode,
    TxSize,
    TxType,
)
from rav1e_tpu.entropy.obu import FrameParams, Sequence, TileInfo, keyframe_packet
from rav1e_tpu.entropy.tile import BlockDecision, TileWriter
from rav1e_tpu.ops.ref.quant import ac_q, dc_q, tx_scale
from rav1e_tpu.ops.tpu import transforms as T
from rav1e_tpu.pipeline.tpu_inter import nnz_stream, scanline
from rav1e_tpu.ops.tpu.intra import predict_modes

LB = 32  # luma block
CB = 16  # chroma block

P = PredictionMode
MODES_7 = (P.DC_PRED, P.V_PRED, P.H_PRED, P.SMOOTH_PRED,
           P.SMOOTH_V_PRED, P.SMOOTH_H_PRED, P.PAETH_PRED)
# full 13: + 6 directional. D45/D67 read the above-right extension
# (gathered decoder-exactly), D203 reads below-left (selection masked
# to blocks where the decoder replicates - see encode_keyframe_tpu).
MODES_FULL = MODES_7 + (P.D45_PRED, P.D67_PRED, P.D113_PRED,
                        P.D135_PRED, P.D157_PRED, P.D203_PRED)
# quad (16x16) sub-blocks skip the extension-reading zones entirely
# (zone-2 directionals D113/D135/D157 read only the standard edges)
MODES_QUAD = MODES_7 + (P.D113_PRED, P.D135_PRED, P.D157_PRED)
MODES_FAST = (P.DC_PRED,)
MODES_UV = (P.DC_PRED, P.V_PRED, P.H_PRED, P.SMOOTH_PRED)
MODES_UV_FULL = (P.DC_PRED, P.V_PRED, P.H_PRED, P.SMOOTH_PRED,
                 P.SMOOTH_V_PRED, P.SMOOTH_H_PRED, P.PAETH_PRED,
                 P.D113_PRED, P.D135_PRED, P.D157_PRED)
ANGULAR = (P.V_PRED, P.H_PRED, P.D45_PRED, P.D67_PRED, P.D113_PRED,
           P.D135_PRED, P.D157_PRED, P.D203_PRED)


# ---- rate model (WriterCounter twin, batched) ------------------------------

def rate_luts(qindex: int, tx_size, plane: int) -> dict:
    """Context-exact coefficient-rate LUTs for one (tx_size, plane)
    as jnp arrays (entropy/cost.py). All TPU-path TX types are
    2D-class, so one set per size/plane suffices.

    The batched evaluator (block_bits) must not index traced tables by
    per-element data — XLA lowers such gathers to ~10 ms per million
    elements on TPU, which dominated the whole mode pass. Instead the
    context LUTs are pre-expanded here (host numpy, per qindex) into
    position-dependent select tables with a SMALL leading data axis:
      base_sel [5, 4, h, w]  = base_bits[off_grid + m, lv3]
      br_sel   [7, 16, h, w] = br_lvl_bits[br_off + m, lv15]
      eob_sel  [3, h, w]     = eob_base_bits[eregion, t]
    so block_bits reduces every lookup to a short where-chain over the
    leading axis (pure VPU selects, fusion-friendly)."""
    from rav1e_tpu.entropy.cost import tx_block_cost_luts
    luts = tx_block_cost_luts(qindex, tx_size, TxType.DCT_DCT, plane)
    n = luts["scan_pos"].size
    sp = luts["scan_pos"]
    h, w = sp.shape
    eregion = np.where(sp == 0, 0,
                       np.where(sp <= (n >> 3), 1,
                                np.where(sp <= (n >> 2), 2, 3)))
    bb = luts["base_bits"]                    # [41, 4]
    off = luts["off_grid"]                    # [h, w]
    base_sel = np.empty((5, 4, h, w), np.float32)
    for m in range(5):
        base_sel[m] = bb[np.minimum(off + m, bb.shape[0] - 1)
                         ].transpose(2, 0, 1)
    base_sel[:, :, 0, 0] = bb[0][None]        # DC position: bctx = 0
    brl = luts["br_lvl_bits"]                 # [21, 16]
    rr = np.arange(h)[:, None]
    cc = np.arange(w)[None, :]
    br_off = np.where((rr == 0) & (cc == 0), 0,
                      np.where((rr < 2) & (cc < 2), 7, 14))
    br_sel = np.empty((7, 16, h, w), np.float32)
    for m in range(7):
        br_sel[m] = brl[np.minimum(br_off + m, brl.shape[0] - 1)
                        ].transpose(2, 0, 1)
    eob_sel = (luts["eob_base_bits"][eregion]      # [h, w, 3]
               .transpose(2, 0, 1).astype(np.float32))
    return {"scan_pos": jnp.asarray(sp),
            "base_sel": jnp.asarray(base_sel),
            "br_sel": jnp.asarray(br_sel),
            "eob_sel": jnp.asarray(eob_sel),
            "eob_cost": jnp.asarray(luts["eob_cost"]),
            "skip1": jnp.float32(luts["skip1"]),
            "skip0": jnp.float32(luts["skip0"])}


def _wsel(idx, tab, first: int = 0):
    """Gather-free lookup tab[idx] for a SMALL static leading axis:
    where-chain over tab's first dim (broadcasts [M, h, w] against
    idx [..., h, w]). Entries below `first` are taken as 0 (used for
    br chains, which cost 0 below level 3)."""
    out = (tab[0] * jnp.ones_like(idx, tab.dtype) if first == 0
           else jnp.zeros(idx.shape, tab.dtype))
    for k in range(max(first, 1), tab.shape[0]):
        out = jnp.where(idx == k, tab[k], out)
    return out


def block_bits(lv, L) -> jnp.ndarray:
    """Estimated coefficient bits for level blocks lv [..., h, w] with
    LUT set L (rate_luts). Reproduces the serial writer's context
    chain (entropy/coeffs.py::write_coeffs) batched: base/br contexts
    from neighbor levels, exact eob accounting, golomb tails. All
    context lookups are where-chains over the pre-expanded select
    tables (see rate_luts) — no per-element gathers."""
    a = jnp.abs(lv)
    lv3 = jnp.minimum(a, 3)
    lv15 = jnp.minimum(a, 15)

    def sh2(x, dr, dc):
        if not (dr or dc):
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, dr), (0, dc)]
                       )[..., dr:, dc:]

    nsum = (sh2(lv3, 0, 1) + sh2(lv3, 1, 0) + sh2(lv3, 1, 1)
            + sh2(lv3, 0, 2) + sh2(lv3, 2, 0))
    brsum = sh2(lv15, 0, 1) + sh2(lv15, 1, 0) + sh2(lv15, 1, 1)
    mm = jnp.minimum((nsum + 1) >> 1, 4)
    bm = jnp.minimum((brsum + 1) >> 1, 6)
    base = None
    for l in range(4):
        col = _wsel(mm, L["base_sel"][:, l])
        base = col if base is None else jnp.where(lv3 == l, col, base)
    br = None
    for m in range(7):
        row = _wsel(lv15, L["br_sel"][m], first=3)
        br = row if br is None else jnp.where(bm == m, row, br)
    gol = jnp.where(
        a > 14,
        2.0 * jnp.floor(jnp.log2(jnp.maximum(a - 14, 1).astype(
            jnp.float32))) + 1.0, 0.0)
    sign = (a > 0).astype(jnp.float32)
    per = base + br + gol + sign
    ebits = (_wsel(jnp.maximum(lv3 - 1, 0), L["eob_sel"])
             + br + gol + sign)
    sp = L["scan_pos"]
    eob = jnp.max(jnp.where(a > 0, sp + 1, 0), axis=(-2, -1))
    at_eob = sp == (eob[..., None, None] - 1)
    coded = sp < eob[..., None, None]
    body = jnp.sum(jnp.where(coded, jnp.where(at_eob, ebits, per), 0.0),
                   axis=(-2, -1))
    return jnp.where(eob == 0, L["skip1"],
                     L["skip0"] + L["eob_cost"][eob] + body)


def build_rd(qindex: int, modes_y, modes_uv, bit_depth: int = 8,
             modes_quad=None, use_cfl: bool = False,
             tx_search: bool = False, split8: bool = False) -> dict:
    """All traced RD inputs for wavefront_frame: quantizers, λ, rate
    LUTs, per-candidate mode-signaling bits, partition bits.

    tx_search adds "ytxb" [len(QUAD_TXS), K]: intra_ext_tx2 symbol
    bits per (tx candidate, quad mode) — its presence enables the
    luma TX16 tx-type loop in _quad_plane."""
    from rav1e_tpu.entropy.cost import mode_cost_tables, rd_lambda
    mc = mode_cost_tables()

    def mbits(table, m):
        b = float(table[int(m)])
        if m in ANGULAR:   # delta=0 symbol (angle_delta cdf idx m-1)
            b += float(mc["angle_delta"][int(m) - 1][3])
        return b

    ybits = np.array([mbits(mc["kf_y_mode"], m) for m in modes_y],
                     np.float32)
    uvbits = np.array([mbits(mc["uv_mode"], m) for m in modes_uv],
                      np.float32)
    yqbits = np.array([mbits(mc["kf_y_mode"], m)
                       for m in (modes_quad or modes_y)], np.float32)
    pm = mc["partition_mid"]
    out = {}
    if tx_search:
        # intra_ext_tx2 symbol cost by (tx candidate, mode): CDF row
        # sqr(16x16)=2, per prediction-mode context
        from rav1e_tpu.entropy.cost import symbol_bits, tables
        t2 = tables()["intra_ext_tx2"]
        qb = np.zeros((len(QUAD_TXS), len(modes_quad or modes_y)),
                      np.float32)
        for mi, m in enumerate(modes_quad or modes_y):
            b = symbol_bits(t2[2, int(m)])      # [sqr=2][mode] row
            for ti in range(len(QUAD_TXS)):
                qb[ti, mi] = b[ti + 1]          # set-2 symbols 1..4
        out["ytxb"] = jnp.asarray(qb)
    if use_cfl:
        # CFL mode + joint sign (ZERO_ZERO excluded) + 2 alpha symbols
        out["cfl_bits"] = jnp.float32(
            mc["uv_mode_cfl"][int(P.UV_CFL_PRED)]
            + float(mc["cfl_sign"][1:].mean())
            + 2.0 * float(mc["cfl_alpha"].mean()))
    from rav1e_tpu.ops.ref.quant import chroma_dq as _chroma_dq
    qc = qindex + _chroma_dq(qindex)
    out2 = {
        "qdc": jnp.int32(dc_q(qindex, 0, bit_depth)),
        "qac": jnp.int32(ac_q(qindex, 0, bit_depth)),
        "qdc_c": jnp.int32(dc_q(qc, 0, bit_depth)),
        "qac_c": jnp.int32(ac_q(qc, 0, bit_depth)),
        "lam": jnp.float32(rd_lambda(qindex, bit_depth)),
        "y32": rate_luts(qindex, TxSize.TX_32X32, 0),
        "y16": rate_luts(qindex, TxSize.TX_16X16, 0),
        "c16": rate_luts(qc, TxSize.TX_16X16, 1),
        "c8": rate_luts(qc, TxSize.TX_8X8, 1),
        "ybits": jnp.asarray(ybits),
        "uvbits": jnp.asarray(uvbits),
        "yqbits": jnp.asarray(yqbits),
        # partition signaling: NONE@32 vs SPLIT@32 + 4x NONE@16
        "split_bits": jnp.float32(
            pm[int(PartitionType.SPLIT)] - pm[int(PartitionType.NONE)]
            + 4.0 * pm[int(PartitionType.NONE)]),
    }
    if split8:
        # 16 -> 8 partition depth (rav1e s6 floor): TX_8X8 luma +
        # TX_4X4 chroma coefficient LUTs and the 16-level partition
        # delta (SPLIT@16 instead of NONE@16, plus 4x NONE@8 from the
        # partition_8 cdf)
        p8 = mc["partition_8"]
        out2["y8"] = rate_luts(qindex, TxSize.TX_8X8, 0)
        out2["c4"] = rate_luts(qc, TxSize.TX_4X4, 1)
        out2["split16_bits"] = jnp.float32(
            pm[int(PartitionType.SPLIT)] - pm[int(PartitionType.NONE)]
            + 4.0 * p8[int(PartitionType.NONE)])
    out2.update(out)
    return out2


def _q_dyn(cf, tx_size, dcq, acq):
    """Quantize with traced quantizer scalars (ops.ref.quant twin).
    dcq/acq may also be [n] per-block vectors (variance AQ: each
    block quantizes at its segment's qindex, spec get_qidx)."""
    shift = tx_scale(tx_size)
    h, w = tx_size.height, tx_size.width
    dc_mask = np.zeros((h, w), bool)
    dc_mask[0, 0] = True
    m = jnp.asarray(dc_mask)
    if getattr(dcq, "ndim", 0):
        dcq, acq = dcq[:, None, None], acq[:, None, None]
    q = jnp.where(m, dcq, acq).astype(jnp.int32)
    bias = jnp.where(m, 21, 17)
    a = jnp.abs(cf) << shift
    lv = jnp.minimum((a + (q * bias) // 64) // q, (1 << 15) - 1)
    return jnp.sign(cf) * lv


def _dq_dyn(lv, tx_size, dcq, acq):
    shift = tx_scale(tx_size)
    h, w = tx_size.height, tx_size.width
    dc_mask = np.zeros((h, w), bool)
    dc_mask[0, 0] = True
    m = jnp.asarray(dc_mask)
    if getattr(dcq, "ndim", 0):
        dcq, acq = dcq[:, None, None], acq[:, None, None]
    q = jnp.where(m, dcq, acq).astype(jnp.int32)
    dqv = ((jnp.abs(lv) * q) & 0xFFFFFF) >> shift
    return jnp.sign(lv) * dqv


def _cand_eval(preds, srcb, tx_size, dqs, tts, maxpx=255,
               approx=False):
    """Evaluate K prediction candidates: returns (rec, lv, sse) stacked
    [K, N, h, w] / [K, N]; tts: per-candidate TxType list.

    approx=True swaps the spec-exact integer inverse for the float
    MXU inverse (~10x cheaper) — for mode RANKING only; callers must
    reconstruct survivors exactly."""
    inv = T.inverse_approx if approx else T.inverse_transform
    K, n, blkh, blkw = preds.shape
    recs, lvs = [], []
    dq0, dq1 = dqs
    if getattr(dq0, "ndim", 0):
        # per-block quantizer vectors (variance AQ): candidate-major
        # flattening below needs them tiled K times
        dq0, dq1 = jnp.tile(dq0, K), jnp.tile(dq1, K)
    if len(set(tts)) == 1:
        resid = (srcb[None] - preds).reshape(K * n, blkh, blkw)
        cf = T.forward_transform(resid, tx_size, tts[0])
        lv = _q_dyn(cf, tx_size, dq0, dq1)
        dq = _dq_dyn(lv, tx_size, dq0, dq1)
        r2 = inv(dq, tx_size, tts[0])
        recb = jnp.clip(preds.reshape(K * n, blkh, blkw) + r2, 0, maxpx)
        recb = recb.astype(jnp.int32).reshape(K, n, blkh, blkw)
        lvk = lv.reshape(K, n, blkh, blkw)
    else:
        for k in range(K):
            resid = srcb - preds[k]
            cf = T.forward_transform(resid, tx_size, tts[k])
            lv = _q_dyn(cf, tx_size, dqs[0], dqs[1])
            dq = _dq_dyn(lv, tx_size, dqs[0], dqs[1])
            r2 = inv(dq, tx_size, tts[k])
            recs.append(jnp.clip(preds[k] + r2, 0, maxpx).astype(jnp.int32))
            lvs.append(lv)
        recb = jnp.stack(recs, 0)
        lvk = jnp.stack(lvs, 0)
    sse = jnp.sum((recb - srcb[None]).astype(jnp.float32) ** 2,
                  axis=(-2, -1))
    return recb, lvk, sse


# luma TX16 intra tx-type candidates: symbols 1..4 of INTRA_TX_SET2
# (spec Tx_Type_Intra_Inv set 2; IDTX excluded — screen-content tool)
QUAD_TXS = (TxType.DCT_DCT, TxType.ADST_ADST, TxType.ADST_DCT,
            TxType.DCT_ADST)


def _quad_plane(edge_above, edge_left, edge_tl, has_a0, has_l0, srcb,
                tx_size, dqs, modes, lam, tts, L, mbits,
                approx=False, txbits=None):
    """Evaluate the 4-way split of a block: each half-size sub-block
    RDO'd sequentially (TL, TR, BL, BR) using in-progress recon.

    txbits [len(QUAD_TXS), K]: when given, every mode is also searched
    over the QUAD_TXS luma tx types (rav1e rdo_tx_size_type's type
    loop) priced at the intra_ext_tx2 symbol cost.

    edge_above: [N, B] bottom row of the block above (valid if has_a0);
    edge_left: [N, B]; edge_tl: [N]. Returns (rec [N,B,B], lv [N,B,B],
    modes [N,4], tx symbols [N,4] int32, total cost [N])."""
    half = tx_size.height
    B = half * 2
    n = srcb.shape[0]
    K = len(modes)
    cur_rec = jnp.zeros((n, B, B), jnp.int32)
    cur_lv = jnp.zeros((n, B, B), jnp.int32)
    sub_modes = []
    sub_txs = []
    total = jnp.zeros((n,), jnp.float32)
    for (r0, c0) in ((0, 0), (0, half), (half, 0), (half, half)):
        if r0 > 0:
            above = cur_rec[:, r0 - 1, c0: c0 + half]
            has_a = jnp.ones((n,), bool)
        else:
            above = edge_above[:, c0: c0 + half]
            has_a = has_a0
        if c0 > 0:
            left = cur_rec[:, r0: r0 + half, c0 - 1]
            has_l = jnp.ones((n,), bool)
        else:
            left = edge_left[:, r0: r0 + half]
            has_l = has_l0
        if r0 > 0 and c0 > 0:
            tl = cur_rec[:, r0 - 1, c0 - 1]
        elif r0 > 0:
            tl = jnp.where(has_l0, edge_left[:, r0 - 1], 0)
        elif c0 > 0:
            tl = jnp.where(has_a0, edge_above[:, c0 - 1], 0)
        else:
            tl = edge_tl
        preds = predict_modes(modes, above, left, tl, has_a, has_l,
                              half, half)
        sub_src = srcb[:, r0: r0 + half, c0: c0 + half]
        sel = jnp.arange(n)
        if txbits is None:
            recb, lvk, sse = _cand_eval(preds, sub_src, tx_size, dqs,
                                        tts, approx=approx)
            cost = sse + lam * (block_bits(lvk, L) + mbits[:, None])
            best = jnp.argmin(cost, axis=0)
            rec_s, lv_s = recb[best, sel], lvk[best, sel]
            tx_s = jnp.ones((n,), jnp.int32)     # DCT: set-2 symbol 1
            cbest = cost[best, sel]
        else:
            recs, lvs, costs = [], [], []
            for ti, tt in enumerate(QUAD_TXS):
                recb, lvk, sse = _cand_eval(preds, sub_src, tx_size,
                                            dqs, [tt] * K,
                                            approx=approx)
                costs.append(sse + lam * (block_bits(lvk, L)
                                          + mbits[:, None]
                                          + txbits[ti][:, None]))
                recs.append(recb)
                lvs.append(lvk)
            cost = jnp.concatenate(costs, 0)      # [4K, n]
            recb = jnp.concatenate(recs, 0)
            lvk = jnp.concatenate(lvs, 0)
            best = jnp.argmin(cost, axis=0)
            rec_s, lv_s = recb[best, sel], lvk[best, sel]
            tx_s = best // K + 1                  # set-2 symbols 1..4
            cbest = cost[best, sel]
            best = best % K                       # mode index
        cur_rec = cur_rec.at[:, r0: r0 + half, c0: c0 + half].set(
            rec_s)
        cur_lv = cur_lv.at[:, r0: r0 + half, c0: c0 + half].set(
            lv_s)
        mode_tab = jnp.asarray(np.array([int(m) for m in modes], np.int32))
        sub_modes.append(mode_tab[best])
        sub_txs.append(tx_s)
        total = total + cbest
    return (cur_rec, cur_lv, jnp.stack(sub_modes, axis=-1),
            jnp.stack(sub_txs, axis=-1), total)


def _sub_edge(cur, ea, el, etl, has_a, has_l, r0, c0, half, n):
    """Edges for the sub-block at (r0, c0) of size `half` inside a
    block whose in-progress recon is `cur` [n, B, B]; ea/el/etl are
    the outer block's edges (valid per has_a/has_l)."""
    if r0 > 0:
        sa = cur[:, r0 - 1, c0: c0 + half]
        ha = jnp.ones((n,), bool)
    else:
        sa = ea[:, c0: c0 + half]
        ha = has_a
    if c0 > 0:
        sl = cur[:, r0: r0 + half, c0 - 1]
        hl = jnp.ones((n,), bool)
    else:
        sl = el[:, r0: r0 + half]
        hl = has_l
    if r0 > 0 and c0 > 0:
        stl = cur[:, r0 - 1, c0 - 1]
    elif r0 > 0:
        stl = jnp.where(has_l, el[:, r0 - 1], 0)
    elif c0 > 0:
        stl = jnp.where(has_a, ea[:, c0 - 1], 0)
    else:
        stl = etl
    return sa, sl, stl, ha, hl


def _cquad(edges_u, edges_v, has_a, has_l, src_u, src_v, tx, dqs,
           modes_uv, mode_tab_uv, lam, L, uvbits, cts, approx):
    """Joint-uv 4-way split of a chroma region of size 2*tx.height:
    four sub-blocks RDO'd sequentially (TL, TR, BL, BR), one shared
    uv mode per sub-block (u and v coded with the same mode, as the
    32-level chroma quads).  Returns (rec_u, rec_v, lv_u, lv_v,
    modes [n, 4], total cost [n])."""
    ea_u, el_u, etl_u = edges_u
    ea_v, el_v, etl_v = edges_v
    half = tx.height
    n = src_u.shape[0]
    sel = jnp.arange(n)
    B = 2 * half
    cu = jnp.zeros((n, B, B), jnp.int32)
    cv = jnp.zeros((n, B, B), jnp.int32)
    cul = jnp.zeros((n, B, B), jnp.int32)
    cvl = jnp.zeros((n, B, B), jnp.int32)
    ms = []
    tot = jnp.zeros((n,), jnp.float32)
    for (r0, c0) in ((0, 0), (0, half), (half, 0), (half, half)):
        sau, slu, stu, hau, hlu = _sub_edge(cu, ea_u, el_u, etl_u,
                                            has_a, has_l, r0, c0,
                                            half, n)
        sav, slv, stv, _, _ = _sub_edge(cv, ea_v, el_v, etl_v,
                                        has_a, has_l, r0, c0, half, n)
        pu = predict_modes(modes_uv, sau, slu, stu, hau, hlu,
                           half, half)
        pv = predict_modes(modes_uv, sav, slv, stv, hau, hlu,
                           half, half)
        ru_, lu2, su_ = _cand_eval(pu, src_u[:, r0: r0 + half,
                                             c0: c0 + half],
                                   tx, dqs, cts, approx=approx)
        rv_, lv2, sv_ = _cand_eval(pv, src_v[:, r0: r0 + half,
                                             c0: c0 + half],
                                   tx, dqs, cts, approx=approx)
        cst = (su_ + sv_ + lam * (block_bits(lu2, L)
                                  + block_bits(lv2, L)
                                  + uvbits[:, None]))
        bq = jnp.argmin(cst, axis=0)
        cu = cu.at[:, r0: r0 + half, c0: c0 + half].set(ru_[bq, sel])
        cv = cv.at[:, r0: r0 + half, c0: c0 + half].set(rv_[bq, sel])
        cul = cul.at[:, r0: r0 + half, c0: c0 + half].set(
            lu2[bq, sel])
        cvl = cvl.at[:, r0: r0 + half, c0: c0 + half].set(
            lv2[bq, sel])
        ms.append(mode_tab_uv[bq])
        tot = tot + cst[bq, sel]
    return cu, cv, cul, cvl, jnp.stack(ms, axis=-1), tot


@partial(jax.jit, static_argnames=("modes_y", "modes_uv", "modes_quad",
                                   "split_rdo", "approx", "dense"))
def wavefront_frame(state, srcs, ii_tab, jj_tab, mask_tab, rd,
                    modes_y, modes_uv, modes_quad=None,
                    split_rdo=False, approx=False, dense=False):
    """Whole-frame wavefront: fori_loop over diagonals, one dispatch.

    With split_rdo, each 32x32 node also evaluates the PARTITION_SPLIT
    alternative (four 16x16 luma + four 8x8 chroma sub-blocks) and the
    joint y+u+v cost decides, mirroring rav1e's rdo_partition_decision
    restructured as two fixed-shape candidate sets.

    rd: traced RD inputs from build_rd (quantizers, λ, rate LUTs, mode
    bits) — changing qindex does NOT recompile. rd may also carry
    "has_tr"/"d203_ok" [bh,bw] grids (decoder decode-order edge
    availability) when modes_y includes extension-reading directional
    modes; the diagonal schedule must then be 2i+j (the above-right
    source block sits on diagonal d-1).

    dense=True is the phase-1 mode-pass specialization: every block on
    ONE diagonal in raster order (ii/jj = full iota). All block reads
    become static reshapes and edge reads become static row/col shifts
    of the block grid — the generic traced-index gathers/scatters move
    the whole frame through XLA gather at 1080p and dominated phase-1
    device time."""
    if modes_quad is None:
        modes_quad = modes_y
    lam = rd["lam"]
    qdc, qac = rd["qdc"], rd["qac"]
    qdc_c, qac_c = rd["qdc_c"], rd["qac_c"]
    from rav1e_tpu.entropy.tile import chroma_tx_type

    bh_g, bw_g = state[0].shape[0], state[0].shape[1]

    def _dn(a):     # row i <- max(i-1, 0)
        return jnp.concatenate([a[:1], a[:-1]], 0)

    def _rt(a):     # col j <- max(j-1, 0)
        return jnp.concatenate([a[:, :1], a[:, :-1]], 1)

    def _lt(a):     # col j <- min(j+1, bw-1)
        return jnp.concatenate([a[:, 1:], a[:, -1:]], 1)

    def body(d, st):
        (ry, ru, rv, ly, lu, lvv, my, mu, sp, cf) = st
        if dense:
            ii = jnp.asarray(np.repeat(np.arange(bh_g), bw_g)
                             .astype(np.int32))
            jj = jnp.asarray(np.tile(np.arange(bw_g), bh_g)
                             .astype(np.int32))
            mask = jnp.ones((bh_g * bw_g,), bool)

            def blk(arr):
                return arr.reshape((-1,) + arr.shape[2:])

            def gather_edges(rec, _ii, _jj, blkh, blkw):
                above = blk(_dn(rec))[:, blkh - 1, :]
                left = blk(_rt(rec))[:, :, blkw - 1]
                tl = blk(_rt(_dn(rec)))[:, blkh - 1, blkw - 1]
                return above, left, tl
        else:
            ii, jj, mask = ii_tab[d], jj_tab[d], mask_tab[d]

            def blk(arr):
                return arr[ii, jj]

            def gather_edges(rec, _ii, _jj, blkh, blkw):
                above = rec[jnp.maximum(_ii - 1, 0), _jj][:, blkh - 1, :]
                left = rec[_ii, jnp.maximum(_jj - 1, 0)][:, :, blkw - 1]
                tl = rec[jnp.maximum(_ii - 1, 0),
                         jnp.maximum(_jj - 1, 0)][:, blkh - 1, blkw - 1]
                return above, left, tl

        n = ii.shape[0]
        sel = jnp.arange(n)
        has_a = ii > 0
        has_l = jj > 0
        m3 = mask[:, None, None]
        if "qdc_g" in rd:
            # variance AQ: per-block segment quantizers, gathered in
            # the same batch order as the source blocks
            qdc_b, qac_b = blk(rd["qdc_g"]), blk(rd["qac_g"])
            qdc_cb, qac_cb = blk(rd["qdc_cg"]), blk(rd["qac_cg"])
        else:
            qdc_b, qac_b, qdc_cb, qac_cb = qdc, qac, qdc_c, qac_c

        # ---- luma 32 candidates ----
        sy = srcs[0]
        srcb_y = blk(sy)
        a_y, l_y, tl_y = gather_edges(ry, ii, jj, LB, LB)
        aext = lext = None
        d203_pen = None
        if "has_tr" in rd:
            # above-right row from block (i-1, j+1): one diagonal
            # earlier under the 2i+j schedule, so already final
            bh_, bw_ = rd["has_tr"].shape
            if dense:
                ar = blk(_lt(_dn(ry)))[:, LB - 1, :]
                tr_ok = rd["has_tr"].reshape(-1)
            else:
                ar = ry[jnp.maximum(ii - 1, 0),
                        jnp.minimum(jj + 1, bw_ - 1)][:, LB - 1, :]
                tr_ok = rd["has_tr"][jnp.minimum(ii, bh_ - 1),
                                     jnp.minimum(jj, bw_ - 1)]
            aext = jnp.concatenate(
                [a_y, jnp.where(tr_ok[:, None], ar,
                                jnp.repeat(a_y[:, -1:], LB, axis=1))],
                axis=1)
            lext = jnp.concatenate(
                [l_y, jnp.repeat(l_y[:, -1:], LB, axis=1)], axis=1)
            d203_ok = (rd["d203_ok"].reshape(-1) if dense else
                       rd["d203_ok"][jnp.minimum(ii, bh_ - 1),
                                     jnp.minimum(jj, bw_ - 1)])
            d203_pen = jnp.where(d203_ok, 0.0, 1e18)
        preds32 = predict_modes(modes_y, a_y, l_y, tl_y, has_a, has_l,
                                LB, LB, aext=aext, lext=lext)
        rec32, lv32, sse32 = _cand_eval(
            preds32, srcb_y, TxSize.TX_32X32, (qdc_b, qac_b),
            [TxType.DCT_DCT] * len(modes_y), approx=approx)
        cost32 = sse32 + lam * (block_bits(lv32, rd["y32"])
                                + rd["ybits"][:, None])
        if d203_pen is not None:
            for k, m in enumerate(modes_y):
                if m == P.D203_PRED:
                    cost32 = cost32.at[k].add(d203_pen)
        b32 = jnp.argmin(cost32, axis=0)
        y32_rec, y32_lv = rec32[b32, sel], lv32[b32, sel]
        mode_tab = jnp.asarray(
            np.array([int(m) for m in modes_y], np.int32))
        y32_mode = mode_tab[b32]
        y32_cost = cost32[b32, sel]

        # ---- chroma 16 candidates (joint u+v mode) ----
        su, sv = srcs[1], srcs[2]
        cts16 = [chroma_tx_type(m, TxSize.TX_16X16, True)
                 for m in modes_uv]

        def chroma_cands(rec, src, tx, tts, dqs):
            cb = tx.height
            a, l_, tl = gather_edges(rec, ii, jj, cb, cb)
            preds = predict_modes(modes_uv, a, l_, tl, has_a, has_l,
                                  cb, cb)
            return (*_cand_eval(preds, blk(src), tx, dqs, tts,
                                approx=approx),
                    preds)

        ur, ulv, usse, pu_ = chroma_cands(ru, su, TxSize.TX_16X16,
                                          cts16, (qdc_cb, qac_cb))
        vr, vlv, vsse, pv_ = chroma_cands(rv, sv, TxSize.TX_16X16,
                                          cts16, (qdc_cb, qac_cb))
        ccost = (usse + vsse
                 + lam * (block_bits(ulv, rd["c16"])
                          + block_bits(vlv, rd["c16"])
                          + rd["uvbits"][:, None]))
        bc = jnp.argmin(ccost, axis=0)
        mode_tab_uv = jnp.asarray(
            np.array([int(m) for m in modes_uv], np.int32))
        c16_mode = mode_tab_uv[bc]
        c16 = [ur[bc, sel], vr[bc, sel], ulv[bc, sel], vlv[bc, sel],
               c16_mode, ccost[bc, sel]]
        cfl_sel = (jnp.zeros((n,), jnp.int32),
                   jnp.zeros((n,), jnp.int32))
        if "cfl_bits" in rd:
            # ---- CfL candidate (spec 7.11.5): chroma = DC + α·AC of
            # the reconstructed co-located luma; α per plane by
            # prediction-SSE argmin (rav1e rdo_cfl_alpha), then one
            # full trial at the chosen pair ----
            yr = y32_rec
            L = ((yr[:, 0::2, 0::2] + yr[:, 0::2, 1::2]
                  + yr[:, 1::2, 0::2] + yr[:, 1::2, 1::2]) << 1)
            nbits = 8  # log2(16*16)
            avg = (jnp.sum(L, axis=(1, 2), keepdims=True)
                   + (1 << (nbits - 1))) >> nbits
            ac = L - avg                                   # [N,16,16]
            alphas = jnp.arange(-16, 17, dtype=jnp.int32)  # [33]

            def cfl_plane(dc, src):
                scl = alphas[:, None, None, None] * ac[None]
                p = jnp.clip(dc[None] + jnp.sign(scl)
                             * ((jnp.abs(scl) + 32) >> 6), 0, 255)
                psse = jnp.sum((p - src[None]).astype(jnp.float32) ** 2,
                               axis=(-2, -1))
                k = jnp.argmin(psse, axis=0)
                return k - 16, p[k, sel]

            au, pred_cu = cfl_plane(pu_[0], blk(su))
            av, pred_cv = cfl_plane(pv_[0], blk(sv))
            ctt = chroma_tx_type(P.UV_CFL_PRED, TxSize.TX_16X16, True)
            ruc, luc, suc = _cand_eval(pred_cu[None], blk(su),
                                       TxSize.TX_16X16,
                                       (qdc_cb, qac_cb),
                                       [ctt], approx=approx)
            rvc, lvc, svc = _cand_eval(pred_cv[None], blk(sv),
                                       TxSize.TX_16X16,
                                       (qdc_cb, qac_cb),
                                       [ctt], approx=approx)
            both_zero = (au == 0) & (av == 0)
            cfl_cost = (suc[0] + svc[0]
                        + lam * (block_bits(luc[0], rd["c16"])
                                 + block_bits(lvc[0], rd["c16"])
                                 + rd["cfl_bits"])
                        + jnp.where(both_zero, 1e18, 0.0))
            take = cfl_cost < c16[5]
            t3 = take[:, None, None]
            c16[0] = jnp.where(t3, ruc[0], c16[0])
            c16[1] = jnp.where(t3, rvc[0], c16[1])
            c16[2] = jnp.where(t3, luc[0], c16[2])
            c16[3] = jnp.where(t3, lvc[0], c16[3])
            c16[4] = jnp.where(take, int(P.UV_CFL_PRED), c16[4])
            c16[5] = jnp.where(take, cfl_cost, c16[5])
            cfl_sel = (jnp.where(take, au, 0), jnp.where(take, av, 0))

        if split_rdo:
            # ---- merged luma+chroma per-quad loop: each 16 region
            # picks 16-whole vs (when rd carries y8/c4 LUTs) four 8x8
            # children, jointly over luma+chroma (rav1e
            # encode_partition_bottomup one level deeper — 8x8 is the
            # s6 partition floor, src/rdo.rs) ----
            split8 = "y8" in rd
            cts8 = [chroma_tx_type(m, TxSize.TX_8X8, True)
                    for m in modes_uv]
            cts4 = ([chroma_tx_type(m, TxSize.TX_4X4, True)
                     for m in modes_uv] if split8 else None)
            au, lu_, tlu = gather_edges(ru, ii, jj, CB, CB)
            av, lv_, tlv = gather_edges(rv, ii, jj, CB, CB)
            srcu, srcv = blk(su), blk(sv)
            K = len(modes_quad)
            mode_tab_q = jnp.asarray(
                np.array([int(m) for m in modes_quad], np.int32))
            txbits = rd.get("ytxb")
            cur = jnp.zeros((n, LB, LB), jnp.int32)
            clv = jnp.zeros((n, LB, LB), jnp.int32)
            cur_u = jnp.zeros((n, CB, CB), jnp.int32)
            cur_v = jnp.zeros((n, CB, CB), jnp.int32)
            cu_lv = jnp.zeros((n, CB, CB), jnp.int32)
            cv_lv = jnp.zeros((n, CB, CB), jnp.int32)
            yq_modes, yq_txs_l, cq_modes = [], [], []
            s16_l, ym8_l, uvm8_l = [], [], []
            tot_cost = jnp.zeros((n,), jnp.float32)
            half = CB
            h8 = CB // 2
            for qi, (r0, c0) in enumerate(
                    ((0, 0), (0, half), (half, 0), (half, half))):
                # --- luma 16-whole (optionally with tx-type search) -
                sa, sl, stl, ha, hl = _sub_edge(
                    cur, a_y, l_y, tl_y, has_a, has_l, r0, c0, half, n)
                preds = predict_modes(modes_quad, sa, sl, stl, ha, hl,
                                      half, half)
                sub_src = srcb_y[:, r0: r0 + half, c0: c0 + half]
                if txbits is None:
                    recb, lvk, sse = _cand_eval(
                        preds, sub_src, TxSize.TX_16X16,
                        (qdc_b, qac_b), [TxType.DCT_DCT] * K,
                        approx=approx)
                    cost = sse + lam * (block_bits(lvk, rd["y16"])
                                        + rd["yqbits"][:, None])
                    b16 = jnp.argmin(cost, axis=0)
                    rec16, lv16 = recb[b16, sel], lvk[b16, sel]
                    tx16 = jnp.ones((n,), jnp.int32)
                    cost16 = cost[b16, sel]
                else:
                    recs, lvs, costs = [], [], []
                    for ti, tt in enumerate(QUAD_TXS):
                        recb, lvk, sse = _cand_eval(
                            preds, sub_src, TxSize.TX_16X16,
                            (qdc_b, qac_b), [tt] * K, approx=approx)
                        costs.append(
                            sse + lam * (block_bits(lvk, rd["y16"])
                                         + rd["yqbits"][:, None]
                                         + txbits[ti][:, None]))
                        recs.append(recb)
                        lvs.append(lvk)
                    cost = jnp.concatenate(costs, 0)
                    recb = jnp.concatenate(recs, 0)
                    lvk = jnp.concatenate(lvs, 0)
                    b16 = jnp.argmin(cost, axis=0)
                    rec16, lv16 = recb[b16, sel], lvk[b16, sel]
                    tx16 = b16 // K + 1           # set-2 symbols 1..4
                    cost16 = cost[b16, sel]
                    b16 = b16 % K
                m16 = mode_tab_q[b16]
                # --- chroma 8-whole (joint uv) ---
                cr0, cc0 = r0 // 2, c0 // 2
                sau, slu, stu, hau, hlu = _sub_edge(
                    cur_u, au, lu_, tlu, has_a, has_l, cr0, cc0,
                    h8, n)
                sav, slv, stv, _, _ = _sub_edge(
                    cur_v, av, lv_, tlv, has_a, has_l, cr0, cc0,
                    h8, n)
                pu = predict_modes(modes_uv, sau, slu, stu, hau, hlu,
                                   h8, h8)
                pv = predict_modes(modes_uv, sav, slv, stv, hau, hlu,
                                   h8, h8)
                ssub_u = srcu[:, cr0: cr0 + h8, cc0: cc0 + h8]
                ssub_v = srcv[:, cr0: cr0 + h8, cc0: cc0 + h8]
                ru8, lu8, su8 = _cand_eval(pu, ssub_u, TxSize.TX_8X8,
                                           (qdc_cb, qac_cb), cts8,
                                           approx=approx)
                rv8, lv8, sv8 = _cand_eval(pv, ssub_v, TxSize.TX_8X8,
                                           (qdc_cb, qac_cb), cts8,
                                           approx=approx)
                cst = (su8 + sv8
                       + lam * (block_bits(lu8, rd["c8"])
                                + block_bits(lv8, rd["c8"])
                                + rd["uvbits"][:, None]))
                bq = jnp.argmin(cst, axis=0)
                c8u, c8v = ru8[bq, sel], rv8[bq, sel]
                c8ul, c8vl = lu8[bq, sel], lv8[bq, sel]
                cm8 = mode_tab_uv[bq]
                cost_c8 = cst[bq, sel]
                if split8:
                    # --- four 8x8 luma children + 4x4 chroma quad ---
                    y8_rec, y8_lv, y8_modes, _, y8_cost = _quad_plane(
                        sa, sl, stl, ha, hl, sub_src, TxSize.TX_8X8,
                        (qdc_b, qac_b), modes_quad, lam,
                        [TxType.DCT_DCT] * K, rd["y8"], rd["yqbits"],
                        approx=approx)
                    (u4, v4, u4l, v4l, c4m, c4_cost) = _cquad(
                        (sau, slu, stu), (sav, slv, stv), hau, hlu,
                        ssub_u, ssub_v, TxSize.TX_4X4,
                        (qdc_cb, qac_cb), modes_uv, mode_tab_uv, lam,
                        rd["c4"], rd["uvbits"], cts4, approx)
                    cost_split16 = (y8_cost + c4_cost
                                    + lam * rd["split16_bits"])
                    cost_whole = cost16 + cost_c8
                    s16 = cost_split16 < cost_whole
                    s3q = s16[:, None, None]
                    rec_q = jnp.where(s3q, y8_rec, rec16)
                    lv_q = jnp.where(s3q, y8_lv, lv16)
                    uq = jnp.where(s3q, u4, c8u)
                    vq = jnp.where(s3q, v4, c8v)
                    uql = jnp.where(s3q, u4l, c8ul)
                    vql = jnp.where(s3q, v4l, c8vl)
                    tot_cost = tot_cost + jnp.where(
                        s16, cost_split16, cost_whole)
                    s16_l.append(s16)
                    ym8_l.append(y8_modes)
                    uvm8_l.append(c4m)
                else:
                    rec_q, lv_q = rec16, lv16
                    uq, vq, uql, vql = c8u, c8v, c8ul, c8vl
                    tot_cost = tot_cost + cost16 + cost_c8
                cur = cur.at[:, r0: r0 + half, c0: c0 + half].set(
                    rec_q)
                clv = clv.at[:, r0: r0 + half, c0: c0 + half].set(
                    lv_q)
                cur_u = cur_u.at[:, cr0: cr0 + h8,
                                 cc0: cc0 + h8].set(uq)
                cur_v = cur_v.at[:, cr0: cr0 + h8,
                                 cc0: cc0 + h8].set(vq)
                cu_lv = cu_lv.at[:, cr0: cr0 + h8,
                                 cc0: cc0 + h8].set(uql)
                cv_lv = cv_lv.at[:, cr0: cr0 + h8,
                                 cc0: cc0 + h8].set(vql)
                yq_modes.append(m16)
                yq_txs_l.append(tx16)
                cq_modes.append(cm8)
            yq_rec, yq_lv = cur, clv
            yq_txs = jnp.stack(yq_txs_l, axis=-1)
            yq_modes = jnp.stack(yq_modes, axis=-1)
            cq_modes = jnp.stack(cq_modes, axis=-1)

            split_cost = tot_cost + lam * rd["split_bits"]
            none_cost = y32_cost + c16[5]
            split = split_cost < none_cost
            s3 = split[:, None, None]
            y_rec = jnp.where(s3, yq_rec, y32_rec)
            y_lv = jnp.where(s3, yq_lv, y32_lv)
            u_rec = jnp.where(s3, cur_u, c16[0])
            v_rec = jnp.where(s3, cur_v, c16[1])
            u_lv = jnp.where(s3, cu_lv, c16[2])
            v_lv = jnp.where(s3, cv_lv, c16[3])
            # mode stores: [bh, bw, 5]: slot 0 = 32-mode, 1..4 = quad
            y_modes = jnp.concatenate(
                [y32_mode[:, None], yq_modes], axis=-1)
            uv_modes = jnp.concatenate(
                [c16[4][:, None], cq_modes], axis=-1)
            y_txs = jnp.where(split[:, None], yq_txs, 1)
            if s16_l:
                # split16 only lives under a split-32 parent
                s16_arr = (jnp.stack(s16_l, axis=-1)
                           & split[:, None])
                ym8_arr = jnp.stack(ym8_l, axis=1)     # [n, 4, 4]
                uvm8_arr = jnp.stack(uvm8_l, axis=1)
            else:
                s16_arr = jnp.zeros((n, 4), bool)
                ym8_arr = jnp.zeros((n, 4, 4), jnp.int32)
                uvm8_arr = jnp.zeros((n, 4, 4), jnp.int32)
        else:
            split = jnp.zeros((n,), bool)
            y_rec, y_lv = y32_rec, y32_lv
            u_rec, v_rec = c16[0], c16[1]
            u_lv, v_lv = c16[2], c16[3]
            y_modes = jnp.concatenate(
                [y32_mode[:, None]] + [y32_mode[:, None]] * 4, axis=-1)
            uv_modes = jnp.concatenate(
                [c16[4][:, None]] + [c16[4][:, None]] * 4, axis=-1)
            y_txs = jnp.ones((n, 4), jnp.int32)
            s16_arr = jnp.zeros((n, 4), bool)
            ym8_arr = jnp.zeros((n, 4, 4), jnp.int32)
            uvm8_arr = jnp.zeros((n, 4, 4), jnp.int32)

        cfl_arr = jnp.where(split[:, None],
                            0, jnp.stack(list(cfl_sel), axis=-1))
        if dense:
            def g(x):
                return x.reshape((bh_g, bw_g) + x.shape[1:])

            return (g(y_rec), g(u_rec), g(v_rec), g(y_lv), g(u_lv),
                    g(v_lv), g(y_modes), g(uv_modes), g(split),
                    g(cfl_arr), g(y_txs), g(s16_arr), g(ym8_arr),
                    g(uvm8_arr))
        ry = ry.at[ii, jj].set(jnp.where(m3, y_rec, ry[ii, jj]))
        ru = ru.at[ii, jj].set(jnp.where(m3, u_rec, ru[ii, jj]))
        rv = rv.at[ii, jj].set(jnp.where(m3, v_rec, rv[ii, jj]))
        ly = ly.at[ii, jj].set(jnp.where(m3, y_lv, ly[ii, jj]))
        lu = lu.at[ii, jj].set(jnp.where(m3, u_lv, lu[ii, jj]))
        lvv = lvv.at[ii, jj].set(jnp.where(m3, v_lv, lvv[ii, jj]))
        my = my.at[ii, jj].set(
            jnp.where(mask[:, None], y_modes, my[ii, jj]))
        mu = mu.at[ii, jj].set(
            jnp.where(mask[:, None], uv_modes, mu[ii, jj]))
        sp = sp.at[ii, jj].set(jnp.where(mask, split, sp[ii, jj]))
        cf = cf.at[ii, jj].set(
            jnp.where(mask[:, None], cfl_arr, cf[ii, jj]))
        return (ry, ru, rv, ly, lu, lvv, my, mu, sp, cf)

    if dense:
        return body(0, state)
    return jax.lax.fori_loop(0, ii_tab.shape[0], body, state)


@partial(jax.jit, static_argnames=("blk_y", "blk_c"))
def _deblock_search_jit(planes, srcs, base, blk_y, blk_c, split_map):
    from rav1e_tpu.ops.tpu.deblock import deblock_search
    return deblock_search(planes, srcs, base, blk_y, blk_c, 8, split_map)


# ---- two-phase keyframe: batched mode pass + light recon wavefront --------
#
# Profiled on the tunneled v5e: the all-in-one wavefront costs ~17 ms
# of scatter/gather overhead PLUS ~24 ms of 13-mode candidate work per
# diagonal (126 diagonals at 1080p -> 5.2 s/frame). The split:
#   phase 1  mode_pass: the SAME wavefront body, launched once with
#            every block on a single "diagonal" and the SOURCE planes
#            standing in for the recon state - with source edges there
#            are no cross-block dependencies, so the whole 13-mode RDO
#            runs as one fully-batched dispatch. Only the decision
#            grids (modes, split, CfL alphas) are kept.
#   phase 2  recon_wavefront below: decoder-order reconstruction with
#            ONE mode per block, on diagonal-skewed state arrays where
#            every read/write is a contiguous dynamic row slice (no
#            scatters). Decisions come from source-edge RDO instead of
#            recon-edge RDO - at working q the edges differ by
#            quantization noise only (rav1e-style speed/quality trade).


@lru_cache(maxsize=8)
def _skew_tables(bh: int, bw: int, ext: bool):
    """Host tables for the diagonal-skewed layout: block (i, j) lives
    at [d, s] with d = (2 if ext else 1)*i + j, s = i. Returns
    (ii [D,S], jj [D,S] clamped block indices, has_l [D,S],
    valid [D,S], unskew_d [bh,bw], unskew_s [bh,bw])."""
    stride = 2 if ext else 1
    D = stride * (bh - 1) + bw
    S = bh
    ii = np.zeros((D, S), np.int32)
    jj = np.zeros((D, S), np.int32)
    valid = np.zeros((D, S), bool)
    un_d = np.zeros((bh, bw), np.int32)
    un_s = np.zeros((bh, bw), np.int32)
    for i in range(bh):
        for j in range(bw):
            d = stride * i + j
            ii[d, i], jj[d, i], valid[d, i] = i, j, True
            un_d[i, j], un_s[i, j] = d, i
    has_l = valid & (jj > 0)
    return ii, jj, has_l, valid, un_d, un_s


def _mode_lut(modes):
    lut = np.zeros(32, np.int32)
    for k, m in enumerate(modes):
        lut[int(m)] = k
    return lut


def _tts_select(modes, tx):
    """(distinct TxType list, per-mode tx-id LUT) for chroma chains."""
    from rav1e_tpu.entropy.tile import chroma_tx_type
    tts = []
    lut = np.zeros(32, np.int32)
    for m in list(modes) + [P.UV_CFL_PRED]:
        tt = chroma_tx_type(m, tx, True)
        if tt not in tts:
            tts.append(tt)
        lut[int(m)] = tts.index(tt)
    return tuple(tts), lut


@partial(jax.jit, static_argnames=("modes_y", "modes_uv", "modes_quad",
                                   "split_rdo", "use_cfl", "ext",
                                   "tx_search", "split8"))
def recon_wavefront(sy_sk, su_sk, sv_sk, ym_sk, uvm_sk, sp_sk, cf_sk,
                    has_l_tab, tr_tab, rd, modes_y, modes_uv,
                    modes_quad, split_rdo, use_cfl, ext,
                    ytx_sk=None, tx_search=False, s16_sk=None,
                    ym8_sk=None, uvm8_sk=None, split8=False):
    """Decoder-order reconstruction with FIXED per-block decisions.

    All arrays are diagonal-skewed: index [d, s] holds block
    (i=s, j=d-2s) (2i+j schedule when ext, else i+j). State rows are
    offset +3 so neighbor reads (d-1..d-3) never clamp. With
    tx_search, ytx_sk [D,S,4] carries each split quad's chosen
    intra_ext_tx2 symbol (1..4 -> QUAD_TXS). Returns skewed
    (rec_y, rec_u, rec_v, lv_y, lv_u, lv_v)."""
    D, S = sp_sk.shape
    qdc, qac = rd["qdc"], rd["qac"]
    qdc_c, qac_c = rd["qdc_c"], rd["qac_c"]
    luty = jnp.asarray(_mode_lut(modes_y))
    lutq = jnp.asarray(_mode_lut(modes_quad))
    lutuv_np = _mode_lut(modes_uv)
    lutuv_np[int(P.UV_CFL_PRED)] = len(modes_uv)
    lutuv = jnp.asarray(lutuv_np)
    tts16, tid16_np = _tts_select(modes_uv, TxSize.TX_16X16)
    tts8, tid8_np = _tts_select(modes_uv, TxSize.TX_8X8)
    tid16 = jnp.asarray(tid16_np)
    tid8 = jnp.asarray(tid8_np)
    if split8:
        tts4, tid4_np = _tts_select(modes_uv, TxSize.TX_4X4)
        tid4 = jnp.asarray(tid4_np)
    o_a, o_l, o_tl = (2, 1, 3) if ext else (1, 1, 2)
    slot_has_a = jnp.arange(S) > 0

    def shift1(x):
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], 0)

    def rows(arr, r):
        return jax.lax.dynamic_slice(
            arr, (r,) + (0,) * (arr.ndim - 1),
            (1,) + arr.shape[1:])[0]

    def code_one(pred, src, tx, dq0, dq1, tt=TxType.DCT_DCT):
        resid = src - pred
        cf = T.forward_transform(resid, tx, tt)
        lv = _q_dyn(cf, tx, dq0, dq1)
        dqv = _dq_dyn(lv, tx, dq0, dq1)
        r2 = T.inverse_transform(dqv, tx, tt)
        return jnp.clip(pred + r2, 0, 255).astype(jnp.int32), lv

    def code_sel(pred, src, tx, dq0, dq1, tts, tid):
        """TX chain per distinct chroma TxType, select by tid [S]."""
        recs, lvs = [], []
        for tt in tts:
            r_, l_ = code_one(pred, src, tx, dq0, dq1, tt)
            recs.append(r_)
            lvs.append(l_)
        rec = jnp.stack(recs, 0)
        lv = jnp.stack(lvs, 0)
        t3 = tid[None, :, None, None]
        return (jnp.take_along_axis(rec, t3, 0)[0],
                jnp.take_along_axis(lv, t3, 0)[0])

    def sel_modes(preds, k):
        return jnp.take_along_axis(
            preds, k[None, :, None, None], 0)[0]

    state = (
        jnp.zeros((D + 3, S, LB, LB), jnp.int32),
        jnp.zeros((D + 3, S, CB, CB), jnp.int32),
        jnp.zeros((D + 3, S, CB, CB), jnp.int32),
        jnp.zeros((D, S, LB, LB), jnp.int32),
        jnp.zeros((D, S, CB, CB), jnp.int32),
        jnp.zeros((D, S, CB, CB), jnp.int32),
    )

    def body(d, st):
        ry_sk, ru_sk, rv_sk, lvy_sk, lvu_sk, lvv_sk = st
        row = d + 3
        sy_d = rows(sy_sk, d)
        su_d = rows(su_sk, d)
        sv_d = rows(sv_sk, d)
        ym_d = rows(ym_sk, d)
        uvm_d = rows(uvm_sk, d)
        sp_d = rows(sp_sk, d)
        cf_d = rows(cf_sk, d)
        has_l = rows(has_l_tab, d)
        tr_ok = rows(tr_tab, d)
        ytx_d = rows(ytx_sk, d) if tx_search else None
        if "qdc_sk" in rd:
            # variance AQ: per-block segment quantizers (skewed grids)
            qdc_d, qac_d = rows(rd["qdc_sk"], d), rows(rd["qac_sk"], d)
            qdc_cd = rows(rd["qdc_csk"], d)
            qac_cd = rows(rd["qac_csk"], d)
        else:
            qdc_d, qac_d, qdc_cd, qac_cd = qdc, qac, qdc_c, qac_c

        # ---- luma edges (contiguous row reads + static shifts) ----
        ra = rows(ry_sk, row - o_a)
        rl = rows(ry_sk, row - o_l)
        rtl = rows(ry_sk, row - o_tl)
        a_y = shift1(ra[:, LB - 1, :])
        l_y = rl[:, :, LB - 1]
        tl_y = shift1(rtl[:, LB - 1, LB - 1])
        aext = lext = None
        if ext:
            ar = shift1(rl[:, LB - 1, :])     # (i-1, j+1): diag d-1
            aext = jnp.concatenate(
                [a_y, jnp.where(tr_ok[:, None], ar,
                                jnp.repeat(a_y[:, -1:], LB, 1))], 1)
            lext = jnp.concatenate(
                [l_y, jnp.repeat(l_y[:, -1:], LB, 1)], 1)

        # ---- luma 32 (single chosen mode) ----
        preds32 = predict_modes(modes_y, a_y, l_y, tl_y, slot_has_a,
                                has_l, LB, LB, aext=aext, lext=lext)
        p32 = sel_modes(preds32, luty[ym_d[:, 0]])
        rec32, lv32 = code_one(p32, sy_d, TxSize.TX_32X32, qdc_d,
                               qac_d)

        if split_rdo:
            # ---- luma 16-quads, one mode each (split8: each quad may
            # instead recon as four 8x8 children, s16_sk flags) ----
            cur = jnp.zeros((S, LB, LB), jnp.int32)
            clv = jnp.zeros((S, LB, LB), jnp.int32)
            half = CB
            s16_d = rows(s16_sk, d) if split8 else None
            ym8_d = rows(ym8_sk, d) if split8 else None
            uvm8_d = rows(uvm8_sk, d) if split8 else None
            for qi, (r0, c0) in enumerate(
                    ((0, 0), (0, half), (half, 0), (half, half))):
                if r0 > 0:
                    sa = cur[:, r0 - 1, c0: c0 + half]
                    ha = jnp.ones((S,), bool)
                else:
                    sa = a_y[:, c0: c0 + half]
                    ha = slot_has_a
                if c0 > 0:
                    sl = cur[:, r0: r0 + half, c0 - 1]
                    hl = jnp.ones((S,), bool)
                else:
                    sl = l_y[:, r0: r0 + half]
                    hl = has_l
                if r0 > 0 and c0 > 0:
                    stl = cur[:, r0 - 1, c0 - 1]
                elif r0 > 0:
                    stl = jnp.where(has_l, l_y[:, r0 - 1], 0)
                elif c0 > 0:
                    stl = jnp.where(slot_has_a, a_y[:, c0 - 1], 0)
                else:
                    stl = tl_y
                pq = predict_modes(modes_quad, sa, sl, stl, ha, hl,
                                   half, half)
                psel = sel_modes(pq, lutq[ym_d[:, 1 + qi]])
                sub_src = sy_d[:, r0: r0 + half, c0: c0 + half]
                if tx_search:
                    rq, lq = code_sel(psel, sub_src, TxSize.TX_16X16,
                                      qdc_d, qac_d, QUAD_TXS,
                                      ytx_d[:, qi] - 1)
                else:
                    rq, lq = code_one(psel, sub_src,
                                      TxSize.TX_16X16, qdc_d, qac_d)
                if split8:
                    # 8x8 children with fixed modes (DCT_DCT), edges
                    # from the in-progress 8-recon + the quad edges
                    cur8 = jnp.zeros((S, half, half), jnp.int32)
                    clv8 = jnp.zeros((S, half, half), jnp.int32)
                    for si, (sr, sc) in enumerate(
                            ((0, 0), (0, 8), (8, 0), (8, 8))):
                        sa8, sl8, stl8, ha8, hl8 = _sub_edge(
                            cur8, sa, sl, stl, ha, hl, sr, sc, 8, S)
                        p8 = predict_modes(modes_quad, sa8, sl8, stl8,
                                           ha8, hl8, 8, 8)
                        ps8 = sel_modes(p8, lutq[ym8_d[:, qi, si]])
                        r8, l8 = code_one(
                            ps8, sub_src[:, sr: sr + 8, sc: sc + 8],
                            TxSize.TX_8X8, qdc_d, qac_d)
                        cur8 = cur8.at[:, sr: sr + 8,
                                       sc: sc + 8].set(r8)
                        clv8 = clv8.at[:, sr: sr + 8,
                                       sc: sc + 8].set(l8)
                    s16q = s16_d[:, qi][:, None, None]
                    rq = jnp.where(s16q, cur8, rq)
                    lq = jnp.where(s16q, clv8, lq)
                cur = cur.at[:, r0: r0 + half, c0: c0 + half].set(rq)
                clv = clv.at[:, r0: r0 + half, c0: c0 + half].set(lq)
            s3 = sp_d[:, None, None]
            rec_y_d = jnp.where(s3, cur, rec32)
            lv_y_d = jnp.where(s3, clv, lv32)
        else:
            rec_y_d = rec32
            lv_y_d = lv32

        # ---- chroma edges ----
        def chroma_edges(rp):
            ca = shift1(rows(rp, row - o_a)[:, CB - 1, :])
            cl = rows(rp, row - o_l)[:, :, CB - 1]
            ctl = shift1(rows(rp, row - o_tl)[:, CB - 1, CB - 1])
            return ca, cl, ctl

        au, lu_, tlu = chroma_edges(ru_sk)
        av, lv_, tlv = chroma_edges(rv_sk)

        # ---- chroma 16 (chosen mode incl. CfL) ----
        pu = predict_modes(modes_uv, au, lu_, tlu, slot_has_a, has_l,
                           CB, CB)
        pv = predict_modes(modes_uv, av, lv_, tlv, slot_has_a, has_l,
                           CB, CB)
        if use_cfl:
            yr = rec_y_d
            L = ((yr[:, 0::2, 0::2] + yr[:, 0::2, 1::2]
                  + yr[:, 1::2, 0::2] + yr[:, 1::2, 1::2]) << 1)
            avg = (jnp.sum(L, axis=(1, 2), keepdims=True)
                   + (1 << 7)) >> 8
            ac = L - avg

            def cfl_pred(dc, alpha):
                scl = alpha[:, None, None] * ac
                return jnp.clip(
                    dc + jnp.sign(scl) * ((jnp.abs(scl) + 32) >> 6),
                    0, 255)

            pu = jnp.concatenate(
                [pu, cfl_pred(pu[0], cf_d[:, 0])[None]], 0)
            pv = jnp.concatenate(
                [pv, cfl_pred(pv[0], cf_d[:, 1])[None]], 0)
        ku = lutuv[uvm_d[:, 0]]
        selu = sel_modes(pu, ku)
        selv = sel_modes(pv, ku)
        rec_u16, lv_u16 = code_sel(selu, su_d, TxSize.TX_16X16,
                                   qdc_cd, qac_cd, tts16,
                                   tid16[uvm_d[:, 0]])
        rec_v16, lv_v16 = code_sel(selv, sv_d, TxSize.TX_16X16,
                                   qdc_cd, qac_cd, tts16,
                                   tid16[uvm_d[:, 0]])

        if split_rdo:
            # ---- chroma 8-quads ----
            cu = jnp.zeros((S, CB, CB), jnp.int32)
            cv = jnp.zeros((S, CB, CB), jnp.int32)
            cul = jnp.zeros((S, CB, CB), jnp.int32)
            cvl = jnp.zeros((S, CB, CB), jnp.int32)
            h8 = CB // 2
            for qi, (r0, c0) in enumerate(
                    ((0, 0), (0, h8), (h8, 0), (h8, h8))):
                def sub_edges(cur_, ea, el, etl):
                    if r0 > 0:
                        sa = cur_[:, r0 - 1, c0: c0 + h8]
                        ha = jnp.ones((S,), bool)
                    else:
                        sa = ea[:, c0: c0 + h8]
                        ha = slot_has_a
                    if c0 > 0:
                        sl = cur_[:, r0: r0 + h8, c0 - 1]
                        hl = jnp.ones((S,), bool)
                    else:
                        sl = el[:, r0: r0 + h8]
                        hl = has_l
                    if r0 > 0 and c0 > 0:
                        stl = cur_[:, r0 - 1, c0 - 1]
                    elif r0 > 0:
                        stl = jnp.where(has_l, el[:, r0 - 1], 0)
                    elif c0 > 0:
                        stl = jnp.where(slot_has_a, ea[:, c0 - 1], 0)
                    else:
                        stl = etl
                    return sa, sl, stl, ha, hl

                kq = lutuv[uvm_d[:, 1 + qi]]
                tq = tid8[uvm_d[:, 1 + qi]]
                for (cur_, clv_, ea, el, etl, src) in (
                        (cu, cul, au, lu_, tlu, su_d),
                        (cv, cvl, av, lv_, tlv, sv_d)):
                    sa, sl, stl, ha, hl = sub_edges(cur_, ea, el, etl)
                    pq = predict_modes(modes_uv, sa, sl, stl, ha, hl,
                                       h8, h8)
                    psel = sel_modes(pq, kq)
                    rq, lq = code_sel(
                        psel, src[:, r0: r0 + h8, c0: c0 + h8],
                        TxSize.TX_8X8, qdc_cd, qac_cd, tts8, tq)
                    if split8:
                        # 4x4 children with the shared per-child uv
                        # mode (uvm8) when the luma quad split to 8x8
                        cur4 = jnp.zeros((S, h8, h8), jnp.int32)
                        clv4 = jnp.zeros((S, h8, h8), jnp.int32)
                        for si, (sr, sc) in enumerate(
                                ((0, 0), (0, 4), (4, 0), (4, 4))):
                            sa4, sl4, stl4, ha4, hl4 = _sub_edge(
                                cur4, sa, sl, stl, ha, hl, sr, sc,
                                4, S)
                            p4 = predict_modes(modes_uv, sa4, sl4,
                                               stl4, ha4, hl4, 4, 4)
                            m4 = uvm8_d[:, qi, si]
                            ps4 = sel_modes(p4, lutuv[m4])
                            r4, l4 = code_sel(
                                ps4,
                                src[:, r0 + sr: r0 + sr + 4,
                                    c0 + sc: c0 + sc + 4],
                                TxSize.TX_4X4, qdc_cd, qac_cd,
                                tts4, tid4[m4])
                            cur4 = cur4.at[:, sr: sr + 4,
                                           sc: sc + 4].set(r4)
                            clv4 = clv4.at[:, sr: sr + 4,
                                           sc: sc + 4].set(l4)
                        s16q = s16_d[:, qi][:, None, None]
                        rq = jnp.where(s16q, cur4, rq)
                        lq = jnp.where(s16q, clv4, lq)
                    cur_2 = cur_.at[:, r0: r0 + h8,
                                    c0: c0 + h8].set(rq)
                    clv_2 = clv_.at[:, r0: r0 + h8,
                                    c0: c0 + h8].set(lq)
                    if src is su_d:
                        cu, cul = cur_2, clv_2
                    else:
                        cv, cvl = cur_2, clv_2
            s3 = sp_d[:, None, None]
            rec_u_d = jnp.where(s3, cu, rec_u16)
            rec_v_d = jnp.where(s3, cv, rec_v16)
            lv_u_d = jnp.where(s3, cul, lv_u16)
            lv_v_d = jnp.where(s3, cvl, lv_v16)
        else:
            rec_u_d, rec_v_d = rec_u16, rec_v16
            lv_u_d, lv_v_d = lv_u16, lv_v16

        dus = jax.lax.dynamic_update_slice
        ry_sk = dus(ry_sk, rec_y_d[None], (row, 0, 0, 0))
        ru_sk = dus(ru_sk, rec_u_d[None], (row, 0, 0, 0))
        rv_sk = dus(rv_sk, rec_v_d[None], (row, 0, 0, 0))
        lvy_sk = dus(lvy_sk, lv_y_d[None], (d, 0, 0, 0))
        lvu_sk = dus(lvu_sk, lv_u_d[None], (d, 0, 0, 0))
        lvv_sk = dus(lvv_sk, lv_v_d[None], (d, 0, 0, 0))
        return (ry_sk, ru_sk, rv_sk, lvy_sk, lvu_sk, lvv_sk)

    st = jax.lax.fori_loop(0, D, body, state)
    return (st[0][3:], st[1][3:], st[2][3:], st[3], st[4], st[5])


KF_META = 54   # per-block meta row: flags + modes + cfl + ytx + 8x8


def _kf_stream_cap(B: int) -> int:
    """Keyframes are coefficient-dense; double the P-path stream
    budget (128 nonzeros/block average)."""
    return B * 128


def _kf_quads(x, n):
    Bq = x.shape[0]
    return (x.reshape(Bq, 2, n, 2, n).transpose(0, 1, 3, 2, 4)
            .reshape(Bq, 4, n, n))


def _kf_skip_flags(state):
    """(skip_q [B,4], skip_b [B], split [B]) from the level grids
    (device twin of the host all-zero test)."""
    ly, lu, lvv, sp = state[3], state[4], state[5], state[8]
    bh, bw = sp.shape
    B = bh * bw
    ly_q = _kf_quads(ly.reshape(B, LB, LB), LB // 2)
    lu_q = _kf_quads(lu.reshape(B, CB, CB), CB // 2)
    lv_q = _kf_quads(lvv.reshape(B, CB, CB), CB // 2)
    nz = ((ly_q != 0).any(axis=(2, 3)) | (lu_q != 0).any(axis=(2, 3))
          | (lv_q != 0).any(axis=(2, 3)))
    skip_q = ~nz
    return skip_q, skip_q.all(axis=1), sp.reshape(B)


def _kf_sub_levels(state):
    """Per-8x8-child level views: (ly8 [B,4,4,8,8], lu4 [B,4,4,4,4],
    lv4 [B,4,4,4,4]) in (quad, sub-quad) order — the storage is
    spatial, these are reshapes."""
    ly, lu, lvv, sp = state[3], state[4], state[5], state[8]
    bh, bw = sp.shape
    B = bh * bw

    def subq(x, n):
        q = _kf_quads(x, 2 * n)                   # [B, 4, 2n, 2n]
        return _kf_quads(q.reshape(-1, 2 * n, 2 * n),
                         n).reshape(B, 4, 4, n, n)

    return (subq(ly.reshape(B, LB, LB), LB // 4),
            subq(lu.reshape(B, CB, CB), CB // 4),
            subq(lvv.reshape(B, CB, CB), CB // 4))


@partial(jax.jit,
         static_argnames=("split_rdo", "use_cdef", "use_deblock",
                          "cdef_rdo", "split8"))
def _kf_filters(state, srcs, base_lf, cdef_prm, lam, split_rdo,
                use_cdef, use_deblock, cdef_rdo=False, split8=False):
    """Keyframe in-loop filter dispatch (separate from the meta pack:
    fused, the filter searches degraded XLA's schedule of the big
    program). Returns (lf_lvl, cdef_idx, rec_packed uint8)."""
    ry, ru, rv = state[0], state[1], state[2]
    sp = state[8]
    bh, bw = sp.shape
    skip_q, skip_b, split = _kf_skip_flags(state)
    planes = [_from_blocks_j(ry), _from_blocks_j(ru),
              _from_blocks_j(rv)]
    if split8:
        # per-16-cell 8x8-TX flag grid for the spec MIN-adjacent-TX
        # filter-length derivation (deblock sub_map) + child skips
        s16 = state[11] & sp[:, :, None]
        sub16 = (s16.reshape(bh, bw, 2, 2).transpose(0, 2, 1, 3)
                 .reshape(bh * 2, bw * 2))
        sub_map = jnp.repeat(jnp.repeat(sub16, 2, 0), 2, 1)
        ly8, lu4, lv4 = _kf_sub_levels(state)
        nz8 = ((ly8 != 0).any(axis=(3, 4))
               | (lu4 != 0).any(axis=(3, 4))
               | (lv4 != 0).any(axis=(3, 4)))        # [B, 4, 4]
        skip_c = ~nz8
    else:
        sub_map = None
    lf_lvl = jnp.int32(0)
    if use_deblock:
        from rav1e_tpu.ops.tpu.deblock import deblock_search
        blk_y, blk_c = (16, 8) if split_rdo else (LB, CB)
        src_planes = [_from_blocks_j(s) for s in srcs]
        lf_lvl, planes = deblock_search(
            planes, src_planes, base_lf, blk_y, blk_c, 8,
            sp if split_rdo else None, sub_map=sub_map)
    nr, nc = (bh + 1) // 2, (bw + 1) // 2
    cdef_idx = jnp.zeros((nr, nc), jnp.int32)
    if use_cdef:
        sk = jnp.where(split[:, None], skip_q,
                       skip_b[:, None].repeat(4, 1)).reshape(bh, bw,
                                                             2, 2)
        skip8 = (sk.transpose(0, 2, 1, 3).reshape(bh * 2, bw * 2)
                 .repeat(2, 0).repeat(2, 1))
        if split8:
            # split16 quads: the CDEF skip test is per coded 8x8
            # child, not per 16 quad (and NONE-32 blocks still use
            # the whole-block skip)
            B = bh * bw
            qeff = jnp.where(split[:, None], skip_q,
                             skip_b[:, None].repeat(4, 1))
            eff = jnp.where(
                (state[11] & sp.reshape(bh, bw, 1)).reshape(B, 4, 1),
                skip_c, qeff[:, :, None])
            skip8 = (eff.reshape(bh, bw, 2, 2, 2, 2)
                     .transpose(0, 2, 4, 1, 3, 5)
                     .reshape(bh * 4, bw * 4))
        if cdef_rdo:
            # per-64x64-SB strength-index RDO over the 8-entry ladder
            # (rav1e rdo_loop_decision, cdef_bits=3) vs the SOURCE
            from rav1e_tpu.ops.tpu.cdef import cdef_search_persb_jax
            src_p = [_from_blocks_j(s).astype(jnp.int32)
                     for s in srcs]
            cdef_idx, planes = cdef_search_persb_jax(
                [p.astype(jnp.int32) for p in planes], src_p,
                skip8, cdef_prm[4], lam=lam)
        else:
            from rav1e_tpu.ops.tpu.cdef import cdef_filter_frame_jax
            planes = cdef_filter_frame_jax(
                [p.astype(jnp.int32) for p in planes], skip8,
                cdef_prm[0], cdef_prm[1], cdef_prm[2], cdef_prm[3],
                cdef_prm[4])
    rec_packed = jnp.concatenate(
        [planes[0].astype(jnp.uint8),
         jnp.concatenate([planes[1].astype(jnp.uint8),
                          planes[2].astype(jnp.uint8)], axis=1)],
        axis=0)
    return lf_lvl, cdef_idx, rec_packed


@partial(jax.jit, static_argnames=("split8",))
def _kf_meta(state, lf_lvl, cdef_idx, split8=False):
    """Keyframe compact meta packing so the host does ONE small fetch
    instead of pulling the full int32 state (~25 MB at 1080p over the
    tunneled chip link).

    Returns (meta flat int8 = [B+1 hdr rows | counts | nonzero
    pos/val stream | per-SB cdef idx], lv_y/lv_u/lv_v int16 device
    arrays for the overflow gather). Hdr row: flags (skip, split) |
    my[5] | mu[5] | cf[2] | ytx[4] | s16[4] | ym8[16] | uvm8[16];
    tail row: [lf_lvl]."""
    (ry, ru, rv, ly, lu, lvv, my, mu, sp, cf, ytx, s16, ym8,
     uvm8) = state
    bh, bw = sp.shape
    B = bh * bw
    skip_q, skip_b, split = _kf_skip_flags(state)
    ly_f = ly.reshape(B, LB, LB)
    lu_f = lu.reshape(B, CB, CB)
    lv_f = lvv.reshape(B, CB, CB)
    # nonzero coefficient stream (shared with the P path; imported at
    # module scope — importing inside this traced function would
    # create tpu_inter's module-level device constants under the
    # tracer and leak)
    if split8:
        ly8, lu4, lv4 = _kf_sub_levels(state)
        sl = scanline(ly_f, lu_f, lv_f, _kf_quads(ly_f, LB // 2),
                      _kf_quads(lu_f, CB // 2),
                      _kf_quads(lv_f, CB // 2), split, B,
                      lv_y8=ly8, lv_u4=lu4, lv_v4=lv4,
                      split16=s16.reshape(B, 4))
    else:
        sl = scanline(ly_f, lu_f, lv_f, _kf_quads(ly_f, LB // 2),
                      _kf_quads(lu_f, CB // 2),
                      _kf_quads(lv_f, CB // 2), split, B)
    counts, pos, val = nnz_stream(sl, _kf_stream_cap(B))
    flags = jnp.stack([skip_b, split], axis=1).astype(jnp.int8)
    row = jnp.concatenate(
        [flags, my.reshape(B, 5).astype(jnp.int8),
         mu.reshape(B, 5).astype(jnp.int8),
         cf.reshape(B, 2).astype(jnp.int8),
         ytx.reshape(B, 4).astype(jnp.int8),
         s16.reshape(B, 4).astype(jnp.int8),
         ym8.reshape(B, 16).astype(jnp.int8),
         uvm8.reshape(B, 16).astype(jnp.int8)], axis=1)
    row = jnp.pad(row, ((0, 0), (0, KF_META - row.shape[1])))
    tail = jnp.zeros((1, KF_META), jnp.int8)
    tail = tail.at[0, 0].set(lf_lvl.astype(jnp.int8))
    hdr = jnp.concatenate([row, tail], axis=0)

    def words1(x):
        x = x.astype(jnp.int32)
        return jnp.stack([(x >> 8).astype(jnp.int8),
                          (x & 255).astype(jnp.int8)], -1).reshape(-1)

    meta = jnp.concatenate([hdr.reshape(-1), words1(counts),
                            words1(pos), words1(val),
                            cdef_idx.reshape(-1).astype(jnp.int8)])
    return (meta, ly_f.astype(jnp.int16),
            lu_f.astype(jnp.int16), lv_f.astype(jnp.int16))


def _finalize_kf(state, srcs, base_lf, cdef_prm, lam, split_rdo,
                 use_cdef, use_deblock, cdef_rdo=False, split8=False):
    """Device-side keyframe epilogue as two chained dispatches:
    in-loop filter searches, then compact meta packing."""
    lf_lvl, cdef_idx, rec_packed = _kf_filters(
        state, srcs, base_lf, cdef_prm, lam, split_rdo, use_cdef,
        use_deblock, cdef_rdo=cdef_rdo, split8=split8)
    meta, lvy, lvu, lvv = _kf_meta(state, lf_lvl, cdef_idx,
                                   split8=split8)
    return meta, rec_packed, lvy, lvu, lvv


def _from_blocks_j(a):
    """jnp twin of _from_blocks."""
    bh, bw, b, _ = a.shape
    return a.transpose(0, 2, 1, 3).reshape(bh * b, bw * b)


@jax.jit
def _gather_dense_kf(lv_y, lv_u, lv_v, idx):
    return jnp.concatenate(
        [jnp.take(lv_y, idx, 0).reshape(idx.shape[0], -1),
         jnp.take(lv_u, idx, 0).reshape(idx.shape[0], -1),
         jnp.take(lv_v, idx, 0).reshape(idx.shape[0], -1)], axis=1)


def _detail_band8(y: np.ndarray) -> float:
    """Mean luma energy in the 8..16px spatial band: per-16x16-block
    variance minus per-8x8-block variance (what an 8x8 predictor can
    model that a 16x16 one cannot).  Host-side, ~10 ms at 1080p."""
    y = np.asarray(y, np.float32)
    h, w = y.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    v8 = (y[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8)
          .var(axis=(1, 3)).mean())
    h16, w16 = h // 16 * 16, w // 16 * 16
    v16 = (y[:h16, :w16].reshape(h16 // 16, 16, w16 // 16, 16)
           .var(axis=(1, 3)).mean())
    return float(v16 - v8)


def _to_blocks(p: np.ndarray, b: int) -> np.ndarray:
    h, w = p.shape
    return (p.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3)
            .astype(np.int32))


def _from_blocks(a: np.ndarray) -> np.ndarray:
    bh, bw, b, _ = a.shape
    return a.transpose(0, 2, 1, 3).reshape(bh * b, bw * b)


KF_SEG_ALT_Q = (-18, -6, 6, 18)     # variance-AQ segment q deltas


def encode_keyframe_tpu(planes: list[np.ndarray], qindex: int = 100,
                        speed: int = 6, deblock: bool = True,
                        cdef: tuple | None = None,
                        render_size: tuple | None = None,
                        seq_extra: dict | None = None,
                        cdef_rdo: bool = True, lr: bool = False,
                        aq: bool = False, deferred: bool = False):
    """TPU-batched KEY frame encode; dims must be multiples of 32.

    cdef: None disables CDEF at the sequence level; a 5-tuple enables
    it — with cdef_rdo (default) the 8-entry ladder is signaled
    (cdef_bits=3) and each 64x64 SB picks its SSE-argmin index on
    device (rav1e rdo_loop_decision); cdef[4] supplies the damping.
    cdef_rdo=False applies the 5-tuple as a fixed frame-wide strength.

    Returns (packet, recon planes) — recon is bit-exact decoder output
    (including deblocking when enabled).
    """
    y, u, v = planes
    h, w = y.shape
    assert h % LB == 0 and w % LB == 0, "pad to 32 for the TPU path"
    bh, bw = h // LB, w // LB
    sy = jnp.asarray(_to_blocks(y, LB))
    su = jnp.asarray(_to_blocks(u, CB))
    sv = jnp.asarray(_to_blocks(v, CB))
    # SpeedSettings is the single source of truth for the toolset
    # (rav1e SpeedSettings::from_preset; api/speed.py)
    from rav1e_tpu.api.speed import SpeedSettings
    ss = SpeedSettings.from_preset(speed)
    modes_y = (MODES_FULL if ss.intra_modes >= 13 else
               (MODES_7 if ss.intra_modes >= 7 else MODES_FAST))
    modes_quad = MODES_QUAD if ss.intra_modes >= 13 else modes_y
    modes_uv = (MODES_UV_FULL if ss.intra_modes >= 13 else
                (MODES_UV if ss.intra_modes >= 7 else MODES_FAST))
    split_rdo = ss.partition_split_rdo
    # D45/D67 read the above-right extension, whose source block
    # (i-1, j+1) sits on the SAME i+j anti-diagonal — so the
    # full-toolset recon schedule is d = 2i + j (the video-coding WPP
    # "2-column offset" wavefront). Cheap toolsets keep i+j.
    ext = any(m in (P.D45_PRED, P.D67_PRED, P.D203_PRED)
              for m in modes_y)
    tx_search = ss.tx_search and split_rdo
    # content-adaptive 8x8-partition gate: the 16->8 RDO only pays
    # where the source carries energy in the 8..16px band (the scale
    # an 8x8 predictor models better than a 16x16 one).  Smooth or
    # coarse-textured frames skip the extra candidate set entirely —
    # same speed-feature style as rav1e's block-importance gating.
    split8 = (ss.kf_split8 and split_rdo
              and _detail_band8(y) > 256.0)
    rd = build_rd(qindex, modes_y, modes_uv, modes_quad=modes_quad,
                  use_cfl=ss.cfl, tx_search=tx_search, split8=split8)
    seg_map = None
    if aq:
        # variance AQ (numpy-path parity, pipeline/intra.py): per-32
        # source activity -> quartile segment map; each block
        # quantizes at clip(q + alt_q[seg]) (spec get_qidx; rav1e
        # src/segmentation.rs). Rate LUTs and λ stay at base q — the
        # CDF init (hence symbol costs) depends only on base_q_idx.
        yb = (y.reshape(bh, LB, bw, LB).transpose(0, 2, 1, 3)
              .astype(np.float64))
        var = yb.var(axis=(2, 3))
        qs = (np.quantile(var, (0.25, 0.5, 0.75)) if var.size > 1
              else (var.flat[0],) * 3)
        seg_map = np.digitize(var, qs).astype(np.int8)
        from rav1e_tpu.entropy.cdf import tables as _cdf_tables
        from rav1e_tpu.ops.ref.quant import chroma_dq as _cdq
        t_ = _cdf_tables()
        # clamp the deltas so base+alt stays in [1,255]: qidx 0 would
        # flip the segment lossless (spec get_qidx clips at 0)
        alt = np.clip(np.asarray(KF_SEG_ALT_Q, np.int32),
                      1 - qindex, 255 - qindex)
        seg_alt_eff = [int(a) for a in alt]
        qi_b = (qindex + alt[seg_map]).astype(np.int32)
        qi_cb = np.clip(qi_b + _cdq(qindex), 0, 255)
        rd["qdc_g"] = jnp.asarray(t_["dc_q_8"][qi_b].astype(np.int32))
        rd["qac_g"] = jnp.asarray(t_["ac_q_8"][qi_b].astype(np.int32))
        rd["qdc_cg"] = jnp.asarray(
            t_["dc_q_8"][qi_cb].astype(np.int32))
        rd["qac_cg"] = jnp.asarray(
            t_["ac_q_8"][qi_cb].astype(np.int32))
    if ext:
        # decode-order edge availability (spec BlockDecoded): SB raster
        # + Z order within the SB; a 32-block's above-right/below-left
        # neighbor is decoded iff its (sb_row, sb_col, z) < ours
        def dkey(i, j):
            return (i // 2, j // 2, (i % 2) * 2 + (j % 2))

        has_tr = np.zeros((bh, bw), bool)
        has_bl = np.zeros((bh, bw), bool)
        for i in range(bh):
            for j in range(bw):
                if i > 0 and j + 1 < bw:
                    has_tr[i, j] = dkey(i - 1, j + 1) < dkey(i, j)
                if j > 0 and i + 1 < bh:
                    has_bl[i, j] = dkey(i + 1, j - 1) < dkey(i, j)
        rd["has_tr"] = jnp.asarray(has_tr)
        # D203 reads below-left: only selectable where the decoder
        # replicates (it would use real pixels we haven't computed yet)
        rd["d203_ok"] = jnp.asarray(~has_bl)
    else:
        has_tr = np.zeros((bh, bw), bool)

    # ---- phase 1: mode decisions from SOURCE edges, fully batched --
    # (the regular wavefront body, launched once with every block on
    # one "diagonal" and the source planes standing in for the recon
    # state — no cross-block dependencies, one big dispatch)
    B = bh * bw
    ii_all = np.repeat(np.arange(bh), bw).astype(np.int32)[None]
    jj_all = np.tile(np.arange(bw), bh).astype(np.int32)[None]
    mask_all = np.ones((1, B), bool)
    state0 = (
        sy, su, sv,
        jnp.zeros((bh, bw, LB, LB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
        jnp.zeros((bh, bw, 5), jnp.int32),
        jnp.zeros((bh, bw, 5), jnp.int32),
        jnp.zeros((bh, bw), bool),
        jnp.zeros((bh, bw, 2), jnp.int32),
    )
    import os as _os
    import time as _time
    _timing = bool(_os.environ.get("RAV1E_TPU_TIMING"))
    _t0 = _time.time()
    (ii_sk, jj_sk, has_l_sk, valid_sk,
     un_d, un_s) = _skew_tables(bh, bw, ext)
    tr_sk = jnp.asarray(has_tr[ii_sk, jj_sk] & valid_sk)
    isk, jsk = jnp.asarray(ii_sk), jnp.asarray(jj_sk)
    ud, us = jnp.asarray(un_d), jnp.asarray(un_s)

    def skew(arr):
        return arr[isk, jsk]

    def unskew(sk):
        return sk[ud, us]

    if seg_map is not None:
        # phase-2 reads quantizers per skewed diagonal row
        for kg, ks in (("qdc_g", "qdc_sk"), ("qac_g", "qac_sk"),
                       ("qdc_cg", "qdc_csk"), ("qac_cg", "qac_csk")):
            rd[ks] = skew(rd[kg])

    def phase1(edges):
        """Mode pass with `edges` (block grids) standing in for the
        recon state."""
        st = (edges[0], edges[1], edges[2]) + state0[3:]
        return wavefront_frame(st, (sy, su, sv), jnp.asarray(ii_all),
                               jnp.asarray(jj_all),
                               jnp.asarray(mask_all), rd, modes_y,
                               modes_uv, modes_quad, split_rdo,
                               approx=True, dense=True)

    def phase2(dec):
        my_d, mu_d, sp_d, cf_d, ytx_d = (dec[6], dec[7], dec[8],
                                         dec[9], dec[10])
        s16_d, ym8_d, uvm8_d = dec[11], dec[12], dec[13]
        out = recon_wavefront(
            skew(sy), skew(su), skew(sv), skew(my_d), skew(mu_d),
            skew(sp_d), skew(cf_d), jnp.asarray(has_l_sk), tr_sk, rd,
            modes_y, modes_uv, modes_quad, split_rdo, ss.cfl, ext,
            ytx_sk=skew(ytx_d) if tx_search else None,
            tx_search=tx_search,
            s16_sk=skew(s16_d) if split8 else None,
            ym8_sk=skew(ym8_d) if split8 else None,
            uvm8_sk=skew(uvm8_d) if split8 else None,
            split8=split8)
        return (my_d, mu_d, sp_d, cf_d, ytx_d, s16_d, ym8_d,
                uvm8_d), out

    dec = phase1((sy, su, sv))
    if _timing:
        jax.block_until_ready(dec[6])
        print(f"# kf phase1 {_time.time()-_t0:.3f}s")
        _t0 = _time.time()
    (my_d, mu_d, sp_d, cf_d, ytx_d, s16_d, ym8_d,
     uvm8_d), rw = phase2(dec)
    ry_sk, ru_sk, rv_sk, ly_sk, lu_sk, lvv_sk = rw
    if _timing:
        jax.block_until_ready(ry_sk)
        print(f"# kf phase2 {_time.time()-_t0:.3f}s")
        _t0 = _time.time()

    state = (unskew(ry_sk), unskew(ru_sk), unskew(rv_sk),
             unskew(ly_sk), unskew(lu_sk), unskew(lvv_sk),
             my_d, mu_d, sp_d, cf_d, ytx_d, s16_d, ym8_d, uvm8_d)

    # ---- device epilogue: filters + compact meta, ONE fetch ---------------
    from rav1e_tpu.ops.ref.deblock import level_from_qindex
    cdef_prm = jnp.asarray(
        list(cdef) if cdef is not None else [0, 0, 0, 0, 3], jnp.int32)
    use_cdef_rdo = cdef is not None and cdef_rdo
    from rav1e_tpu.entropy.cost import rd_lambda
    meta_d, rec_packed_d, lvy_d, lvu_d, lvv_d = _finalize_kf(
        state, (sy, su, sv), jnp.int32(level_from_qindex(qindex)),
        cdef_prm, jnp.float32(rd_lambda(qindex, 8)), split_rdo,
        cdef is not None, deblock, cdef_rdo=use_cdef_rdo,
        split8=split8)
    if _timing:
        jax.block_until_ready(meta_d)
        print(f"# kf epilogue {_time.time()-_t0:.3f}s")
        _t0 = _time.time()
    def _finish():
        """Host half: fetch the meta buffer, unpack the
        coefficient stream, entropy-pack the tile. Runs deferred
        (on a worker thread, overlapped with P-frame device
        compute) when deferred=True."""
        nonlocal _t0
        meta = np.asarray(meta_d)
        B = bh * bw
        cap = _kf_stream_cap(B)
        o0 = (B + 1) * KF_META
        body = meta[:o0].reshape(B + 1, KF_META)
        body, mtail = body[:-1], body[-1]
        lf = int(mtail[0])
        sp = (body[:, 1] != 0).reshape(bh, bw)
        my = body[:, 2:7].astype(np.int32).reshape(bh, bw, 5)
        mu = body[:, 7:12].astype(np.int32).reshape(bh, bw, 5)
        cfm = body[:, 12:14].astype(np.int32).reshape(bh, bw, 2)
        ytx = body[:, 14:18].astype(np.int32).reshape(bh, bw, 4)
        s16 = (body[:, 18:22] != 0)                       # [B, 4]
        ym8 = body[:, 22:38].astype(np.int32).reshape(B, 4, 4)
        uvm8 = body[:, 38:54].astype(np.int32).reshape(B, 4, 4)
        any8 = split8 and bool(s16.any())

        def unw(raw):
            w = raw.reshape(-1, 2).astype(np.int32)
            return w[:, 0] * 256 + (w[:, 1] & 0xFF)

        o1 = o0 + 2 * B
        counts = unw(meta[o0:o1])
        o2 = o1 + 2 * (cap + 1)
        pos = unw(meta[o1:o2])
        o3 = o2 + 2 * (cap + 1)
        val = unw(meta[o2:o3]).astype(np.int16)
        nr, nc = (bh + 1) // 2, (bw + 1) // 2
        cdef_map = (meta[o3:].astype(np.uint8).reshape(nr, nc)
                    if use_cdef_rdo else None)
        from rav1e_tpu.pipeline.tpu_inter import unpack_stream
        lv_y, lv_u, lv_v, over = unpack_stream(
            counts, pos, val, sp.reshape(B), cap=cap,
            split16=s16 if any8 else None)
        didx = np.nonzero(over)[0]
        if len(didx):
            g = np.asarray(_gather_dense_kf(lvy_d, lvu_d, lvv_d,
                                            jnp.asarray(didx)))
            lv_y[didx] = g[:, :1024].reshape(-1, 32, 32)
            lv_u[didx] = g[:, 1024:1280].reshape(-1, 16, 16)
            lv_v[didx] = g[:, 1280:].reshape(-1, 16, 16)
        ly = lv_y.reshape(bh, bw, 32, 32)
        lu = lv_u.reshape(bh, bw, 16, 16)
        lvv = lv_v.reshape(bh, bw, 16, 16)
        if _timing:
            print(f"# kf fetch+unpack {_time.time()-_t0:.3f}s")
            _t0 = _time.time()

        # ---- pack (host, serial; C++ packer when available) -------------------
        seq = Sequence(width=w, height=h, enable_cdef=cdef is not None)
        for k, v_ in (seq_extra or {}).items():
            setattr(seq, k, v_)
        fp = FrameParams(frame_type=FrameType.KEY, base_q_idx=qindex,
                         loop_filter_levels=(lf, lf, lf, lf),
                         render_size=render_size)
        from rav1e_tpu.ops.ref.quant import chroma_dq as _chroma_dq
        fp.delta_q_u_dc = fp.delta_q_u_ac = _chroma_dq(qindex)
        seg_alt_q = None
        if seg_map is not None:
            seg_alt_q = seg_alt_eff + [None] * 4
            fp.seg_alt_q = seg_alt_q
        cdef_bits = 0
        if cdef_map is not None:
            from rav1e_tpu.ops.tpu.cdef import compact_ladder
            fp.cdef_damping = cdef[4]
            (fp.cdef_strengths, cdef_bits,
             cdef_map) = compact_ladder(cdef_map)
        elif cdef is not None:
            (fp.cdef_y_pri, fp.cdef_y_sec, fp.cdef_uv_pri,
             fp.cdef_uv_sec, fp.cdef_damping) = cdef
        ti = TileInfo(seq)
        mi_rows, mi_cols = h >> 2, w >> 2
        tile = None
        if lr:
            # LR unit params ride the tile at SB starts — only the python
            # writer codes them, so skip the C++ packer for LR keyframes
            seq.enable_restoration = True
        try:
            if lr or seg_map is not None:
                raise ImportError("python writer required for LR/seg")
            # one-call C++ intra packer (0.86 s -> ms at 1080p; the
            # per-block python dict build below is the fallback)
            from rav1e_tpu.entropy.native import NativeTileWriter
            tw = NativeTileWriter(mi_rows, mi_cols, qindex)
            tile = tw.write_intra_tile_fast(
                sp.reshape(-1), my.reshape(-1, 5), mu.reshape(-1, 5),
                cfm.reshape(-1, 2), ly.reshape(-1, 32, 32),
                lu.reshape(-1, 16, 16), lvv.reshape(-1, 16, 16),
                cdef_idx=cdef_map, cdef_bits=cdef_bits,
                ytx=ytx.reshape(-1, 4),
                split16=s16 if any8 else None,
                ym8=ym8 if any8 else None,
                uvm8=uvm8 if any8 else None)
        except Exception:
            tile = None
        if tile is not None:
            pkt = keyframe_packet(seq, fp, ti, [tile])
            if _timing:
                print(f"# kf hostpack {_time.time()-_t0:.3f}s")
            rp = np.asarray(rec_packed_d)
            rec = [rp[:h].astype(np.int32),
                   rp[h:, :w // 2].astype(np.int32),
                   rp[h:, w // 2:].astype(np.int32)]
            return pkt, rec
        tw = TileWriter(mi_rows, mi_cols, qindex, seg_alt_q=seg_alt_q)
        if cdef_bits:
            tw.cdef_bits = cdef_bits
            tw.cdef_idx_map = cdef_map
        rec = None
        if lr:
            # fetch the post-deblock/CDEF recon now: LR searches on it and
            # mutates it in place, and its unit params must be attached to
            # the writer BEFORE write_tile (spec decode_lr interleaving)
            from rav1e_tpu.pipeline.lr import apply_lr_frame
            rp = np.asarray(rec_packed_d)
            rec = [rp[:h].astype(np.int32),
                   rp[h:, :w // 2].astype(np.int32),
                   rp[h:, w // 2:].astype(np.int32)]
            fp.lr_types = apply_lr_frame(rec, [np.asarray(y), np.asarray(u),
                                               np.asarray(v)], tw, 8, 1, 1)
        partitions: dict = {}
        blocks: dict = {}
        for bi in range(bh):
            for bj in range(bw):
                r, c = bi * 8, bj * 8
                yl = ly[bi, bj]
                ul = lu[bi, bj]
                vl = lvv[bi, bj]
                seg = int(seg_map[bi, bj]) if seg_map is not None else 0
                if sp[bi, bj]:
                    from rav1e_tpu.entropy.tile import INTRA_TX_SET2
                    partitions[(r, c, int(BlockSize.B32X32))] = \
                        PartitionType.SPLIT
                    b_flat = bi * bw + bj
                    for q, (dr, dc) in enumerate(
                            ((0, 0), (0, 4), (4, 0), (4, 4))):
                        py, px = dr * 4, dc * 4       # luma pixel offsets
                        cy, cx = dr * 2, dc * 2       # chroma pixel offsets
                        if any8 and s16[b_flat, q]:
                            # 16 -> 8 split: four B8X8 children, TX_8X8
                            # luma + TX_4X4 chroma, DCT_DCT
                            partitions[(r + dr, c + dc,
                                        int(BlockSize.B16X16))] = \
                                PartitionType.SPLIT
                            for si, (sr, sc) in enumerate(
                                    ((0, 0), (0, 2), (2, 0), (2, 2))):
                                sy8, sx8 = py + sr * 4, px + sc * 4
                                sc4y, sc4x = cy + sr * 2, cx + sc * 2
                                syl = yl[sy8: sy8 + 8, sx8: sx8 + 8]
                                sul = ul[sc4y: sc4y + 4, sc4x: sc4x + 4]
                                svl = vl[sc4y: sc4y + 4, sc4x: sc4x + 4]
                                d = BlockDecision(
                                    y_mode=PredictionMode(
                                        int(ym8[b_flat, q, si])),
                                    uv_mode=PredictionMode(
                                        int(uvm8[b_flat, q, si])),
                                    skip=False, seg_id=seg)
                                if (not syl.any() and not sul.any()
                                        and not svl.any()):
                                    d.skip = True
                                else:
                                    d.coeffs = {0: syl, 1: sul, 2: svl,
                                                "y_tx_type":
                                                    TxType.DCT_DCT}
                                blocks[(r + dr + sr, c + dc + sc)] = d
                                partitions[(r + dr + sr, c + dc + sc,
                                            int(BlockSize.B8X8))] = \
                                    PartitionType.NONE
                            continue
                        syl = yl[py: py + 16, px: px + 16]
                        sul = ul[cy: cy + 8, cx: cx + 8]
                        svl = vl[cy: cy + 8, cx: cx + 8]
                        d = BlockDecision(
                            y_mode=PredictionMode(int(my[bi, bj, 1 + q])),
                            uv_mode=PredictionMode(int(mu[bi, bj, 1 + q])),
                            skip=False, seg_id=seg)
                        if not syl.any() and not sul.any() and not svl.any():
                            d.skip = True
                        else:
                            d.coeffs = {0: syl, 1: sul, 2: svl,
                                        "y_tx_type": INTRA_TX_SET2[
                                            int(ytx[bi, bj, q])]}
                        blocks[(r + dr, c + dc)] = d
                        partitions[(r + dr, c + dc,
                                    int(BlockSize.B16X16))] = PartitionType.NONE
                    continue
                d = BlockDecision(y_mode=PredictionMode(int(my[bi, bj, 0])),
                                  uv_mode=PredictionMode(int(mu[bi, bj, 0])),
                                  skip=False, seg_id=seg)
                if d.uv_mode == PredictionMode.UV_CFL_PRED:
                    d.cfl_alpha_idx = (int(cfm[bi, bj, 0]),
                                       int(cfm[bi, bj, 1]))
                if not yl.any() and not ul.any() and not vl.any():
                    d.skip = True
                else:
                    d.coeffs = {0: yl, 1: ul, 2: vl,
                                "y_tx_type": TxType.DCT_DCT}
                blocks[(r, c)] = d
                partitions[(r, c, int(BlockSize.B32X32))] = PartitionType.NONE
        for r in range(0, mi_rows, 16):
            for c in range(0, mi_cols, 16):
                partitions[(r, c, int(BlockSize.B64X64))] = PartitionType.SPLIT
        tile = tw.write_tile(partitions, blocks)
        pkt = keyframe_packet(seq, fp, ti, [tile])
        if _timing:
            print(f"# kf hostpack {_time.time()-_t0:.3f}s")
            _t0 = _time.time()
        # final reconstruction (deblock+CDEF already applied on device,
        # LR on host above when enabled): one packed uint8 fetch
        if rec is None:
            rp = np.asarray(rec_packed_d)
            rec = [rp[:h].astype(np.int32),
                   rp[h:, :w // 2].astype(np.int32),
                   rp[h:, w // 2:].astype(np.int32)]
        return pkt, rec

    if deferred:
        # GOP pipelining: hand back the DEVICE recon immediately
        # so P frames dispatch against it while the host packs
        # the keyframe (host LR would mutate the fetched recon,
        # so deferred requires lr=False)
        assert not lr, "deferred incompatible with lr"
        rec_dev = (rec_packed_d[:h], rec_packed_d[h:, :w // 2],
                   rec_packed_d[h:, w // 2:])
        return _finish, rec_dev
    return _finish()
