"""Reference intra (KEY) frame encoder — numpy, serial, conformant.

Reference parity: rav1e src/encoder.rs encode_frame for keyframes with
a fixed partition plan (this first slice: 32x32 blocks, DC prediction,
DCT only, TX_MODE_LARGEST). The encoder reconstructs exactly as the
decoder will (predict from recon edges -> quantize -> dequant ->
inverse transform -> clip), which the dav1d oracle verifies bit-exact.

This serial version defines behavior for the batched TPU pipeline.
"""

from __future__ import annotations

import numpy as np

from rav1e_tpu.core.constants import (
    MAX_TX_SIZE_RECT,
    BlockSize,
    FrameType,
    PartitionType,
    PredictionMode,
    TxType,
    subsize,
)
from rav1e_tpu.entropy.obu import FrameParams, Sequence, TileInfo, keyframe_packet
from rav1e_tpu.entropy.tile import (
    BlockDecision,
    TileWriter,
    chroma_tx_size,
    chroma_tx_type,
)
from rav1e_tpu.ops.ref.intra import predict
from rav1e_tpu.ops.ref.quant import dequantize, quantize
from rav1e_tpu.ops.ref.transforms import forward_transform, inverse_transform


class PlaneState:
    def __init__(self, src: np.ndarray):
        self.src = src.astype(np.int32)
        self.rec = np.zeros_like(self.src)


def _encode_block_plane(ps: PlaneState, x: int, y: int, tx, tx_type,
                        mode: PredictionMode, qindex: int, bd: int = 8):
    h, w = tx.height, tx.width
    above = ps.rec[y - 1, x: x + w] if y > 0 else None
    left = ps.rec[y: y + h, x - 1] if x > 0 else None
    top_left = int(ps.rec[y - 1, x - 1]) if (y > 0 and x > 0) else None
    pred = predict(mode, w, h, above, left, top_left, bd)
    resid = ps.src[y: y + h, x: x + w] - pred
    cf = forward_transform(resid, tx, tx_type)
    levels = quantize(cf, qindex, tx)
    dq = dequantize(levels, qindex, tx)
    r2 = inverse_transform(dq, tx, tx_type)
    rec = np.clip(pred + r2, 0, (1 << bd) - 1)
    ps.rec[y: y + h, x: x + w] = rec
    return levels, pred


def encode_keyframe(planes: list[np.ndarray], qindex: int = 100,
                    block: BlockSize = BlockSize.B32X32):
    """Encode one 8-bit 4:2:0 KEY frame. Returns (packet, recon planes).

    planes: [y (h,w), u, v] uint8, dims multiples of 8.
    """
    y, u, v = planes
    h, w = y.shape
    assert h % 8 == 0 and w % 8 == 0
    seq = Sequence(width=w, height=h)
    fp = FrameParams(frame_type=FrameType.KEY, base_q_idx=qindex)
    ti = TileInfo(seq)
    assert ti.n_tiles == 1
    mi_rows, mi_cols = h >> 2, w >> 2
    tw = TileWriter(mi_rows, mi_cols, qindex)
    states = [PlaneState(y), PlaneState(u), PlaneState(v)]

    partitions: dict = {}
    blocks: dict = {}

    bw_mi = block.width_mi

    def plan(r: int, c: int, bsize: BlockSize):
        """Build the partition tree + encode blocks in writer order."""
        if r >= mi_rows or c >= mi_cols:
            return
        half = bsize.width_mi // 2
        fully_inside = (r + bsize.height_mi <= mi_rows
                        and c + bsize.width_mi <= mi_cols)
        if fully_inside and bsize.width_mi <= bw_mi:
            partitions[(r, c, int(bsize))] = PartitionType.NONE
            encode_block(r, c, bsize)
            return
        partitions[(r, c, int(bsize))] = PartitionType.SPLIT
        sub = subsize(PartitionType.SPLIT, bsize)
        for (dr, dc) in ((0, 0), (0, half), (half, 0), (half, half)):
            plan(r + dr, c + dc, sub)

    def encode_block(r: int, c: int, bsize: BlockSize):
        d = BlockDecision(y_mode=PredictionMode.DC_PRED,
                          uv_mode=PredictionMode.DC_PRED, skip=False)
        ytx = MAX_TX_SIZE_RECT[bsize]
        uvtx = chroma_tx_size(bsize)
        ytt = TxType.DCT_DCT
        uvtt = chroma_tx_type(d.uv_mode, uvtx, True)
        ylv, _ = _encode_block_plane(
            states[0], c * 4, r * 4, ytx, ytt, d.y_mode, qindex)
        ulv, _ = _encode_block_plane(
            states[1], c * 2, r * 2, uvtx, uvtt, d.uv_mode, qindex)
        vlv, _ = _encode_block_plane(
            states[2], c * 2, r * 2, uvtx, uvtt, d.uv_mode, qindex)
        if not ylv.any() and not ulv.any() and not vlv.any():
            d.skip = True
        else:
            d.coeffs = {0: ylv, 1: ulv, 2: vlv, "y_tx_type": ytt}
        blocks[(r, c)] = d

    for r in range(0, mi_rows, 16):
        for c in range(0, mi_cols, 16):
            plan(r, c, BlockSize.B64X64)

    tile = tw.write_tile(partitions, blocks)
    pkt = keyframe_packet(seq, fp, ti, [tile])
    return pkt, [s.rec for s in states]
