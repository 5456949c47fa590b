"""TPU wavefront intra encoder (single chip).

The TPU inversion of rav1e's serial SB loop (SURVEY §7.0): blocks on
the same anti-diagonal have no prediction dependency (intra needs only
above/left recon), so each wavefront step batches every block of one
diagonal through shared jitted kernels: DC predict -> forward DCT
(MXU) -> quantize -> dequantize -> bit-exact integer inverse ->
reconstruct. Luma 32x32 and chroma 16x16 grids share the same block
graph, so one step handles all three planes.

The per-diagonal step is compiled ONCE (indices padded to the longest
diagonal, masked); the Python loop over diagonals does no tracing.
Entropy packing consumes the level grids afterwards (two-plane IR).
"""

from __future__ import annotations

from functools import partial

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
from rav1e_tpu.ops.ref.quant import ac_q, dc_q
from rav1e_tpu.ops.tpu import transforms as T

LB = 32  # luma block
CB = 16  # chroma block


def _plane_step(rec, src, lv_store, ii, jj, mask, tx_size, dqs, base):
    """One wavefront step for one plane's block grid."""
    n = ii.shape[0]
    blkh, blkw = tx_size.height, tx_size.width
    srcb = src[ii, jj]  # [N, h, w]
    has_a = ii > 0
    has_l = jj > 0
    above = rec[jnp.maximum(ii - 1, 0), jj][:, blkh - 1, :]  # [N, w]
    left = rec[ii, jnp.maximum(jj - 1, 0)][:, :, blkw - 1]   # [N, h]
    sum_a = above.sum(axis=-1)
    sum_l = left.sum(axis=-1)
    wlog, hlog = blkw.bit_length() - 1, blkh.bit_length() - 1
    dc_both = (sum_a + sum_l + ((blkw + blkh) >> 1)) // (blkw + blkh)
    dc_a = (sum_a + (blkw >> 1)) >> wlog
    dc_l = (sum_l + (blkh >> 1)) >> hlog
    dc = jnp.where(has_a & has_l, dc_both,
                   jnp.where(has_a, dc_a,
                             jnp.where(has_l, dc_l, base)))
    pred = dc[:, None, None].astype(jnp.int32)
    resid = srcb - pred
    cf = T.forward_transform(resid, tx_size, TxType.DCT_DCT)
    lv = T.quantize(cf, tx_size, dqs[0], dqs[1])
    dq = T.dequantize(lv, tx_size, dqs[0], dqs[1])
    r2 = T.inverse_transform(dq, tx_size, TxType.DCT_DCT)
    recb = jnp.clip(pred + r2, 0, 255).astype(jnp.int32)
    m = mask[:, None, None]
    rec = rec.at[ii, jj].set(jnp.where(m, recb, rec[ii, jj]))
    lv_store = lv_store.at[ii, jj].set(
        jnp.where(m, lv.astype(jnp.int32), lv_store[ii, jj]))
    del n
    return rec, lv_store


@partial(jax.jit, static_argnames=("qdc", "qac", "qdc_c", "qac_c"))
def wavefront_step(state, srcs, ii, jj, mask, qdc, qac, qdc_c, qac_c):
    (ry, ru, rv, ly, lu, lvv) = state
    (sy, su, sv) = srcs
    ry, ly = _plane_step(ry, sy, ly, ii, jj, mask,
                         TxSize.TX_32X32, (qdc, qac), 128)
    ru, lu = _plane_step(ru, su, lu, ii, jj, mask,
                         TxSize.TX_16X16, (qdc_c, qac_c), 128)
    rv, lvv = _plane_step(rv, sv, lvv, ii, jj, mask,
                          TxSize.TX_16X16, (qdc_c, qac_c), 128)
    return (ry, ru, rv, ly, lu, lvv)


def _to_blocks(p: np.ndarray, b: int) -> np.ndarray:
    h, w = p.shape
    return (p.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3)
            .astype(np.int32))


def _from_blocks(a: np.ndarray) -> np.ndarray:
    bh, bw, b, _ = a.shape
    return a.transpose(0, 2, 1, 3).reshape(bh * b, bw * b)


def encode_keyframe_tpu(planes: list[np.ndarray], qindex: int = 100):
    """TPU-batched KEY frame encode; dims must be multiples of 32.

    Returns (packet, recon planes) — recon is bit-exact decoder output.
    """
    y, u, v = planes
    h, w = y.shape
    assert h % LB == 0 and w % LB == 0, "pad to 32 for the TPU path"
    bh, bw = h // LB, w // LB
    sy = jnp.asarray(_to_blocks(y, LB))
    su = jnp.asarray(_to_blocks(u, CB))
    sv = jnp.asarray(_to_blocks(v, CB))
    state = (
        jnp.zeros((bh, bw, LB, LB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
        jnp.zeros((bh, bw, LB, LB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
        jnp.zeros((bh, bw, CB, CB), jnp.int32),
    )
    maxlen = min(bh, bw)
    qdc, qac = dc_q(qindex), ac_q(qindex)
    for d in range(bh + bw - 1):
        cells = [(i, d - i) for i in range(max(0, d - bw + 1),
                                           min(d, bh - 1) + 1)]
        n = len(cells)
        # padded lanes scatter out of bounds (dropped by XLA) so they
        # can never clobber real blocks via duplicate indices
        ii = np.full(maxlen, bh, np.int32)
        jj = np.full(maxlen, bw, np.int32)
        mask = np.zeros(maxlen, bool)
        for k, (i, j) in enumerate(cells):
            ii[k], jj[k], mask[k] = i, j, True
        state = wavefront_step(state, (sy, su, sv),
                               jnp.asarray(ii), jnp.asarray(jj),
                               jnp.asarray(mask), qdc, qac, qdc, qac)
        del n
    ry, ru, rv, ly, lu, lvv = [np.asarray(s) for s in state]

    # ---- pack (host, serial) ---------------------------------------------
    seq = Sequence(width=w, height=h)
    fp = FrameParams(frame_type=FrameType.KEY, base_q_idx=qindex)
    ti = TileInfo(seq)
    mi_rows, mi_cols = h >> 2, w >> 2
    tw = TileWriter(mi_rows, mi_cols, qindex)
    partitions: dict = {}
    blocks: dict = {}
    for bi in range(bh):
        for bj in range(bw):
            r, c = bi * 8, bj * 8
            yl = ly[bi, bj]
            ul = lu[bi, bj]
            vl = lvv[bi, bj]
            d = BlockDecision(y_mode=PredictionMode.DC_PRED,
                              uv_mode=PredictionMode.DC_PRED, skip=False)
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
    rec = [_from_blocks(ry), _from_blocks(ru), _from_blocks(rv)]
    return pkt, rec
