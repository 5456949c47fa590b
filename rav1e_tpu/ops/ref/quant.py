"""Quantization / dequantization (AV1 spec §7.12.2-7.12.3).

Reference parity: rav1e src/quantize.rs (dc_q/ac_q tables, deadzone
rounding, log_tx_scale). Dequant is normative; quant is an encoder
choice (here: deadzone rounding like the reference).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from rav1e_tpu.core.constants import TxSize
from rav1e_tpu.entropy.cdf import tables


@lru_cache(maxsize=1)
def _q_tables():
    t = tables()
    return {
        8: (t["dc_q_8"], t["ac_q_8"]),
        10: (t["dc_q_10"], t["ac_q_10"]),
        12: (t["dc_q_12"], t["ac_q_12"]),
    }


def dc_q(qindex: int, delta: int = 0, bd: int = 8) -> int:
    return int(_q_tables()[bd][0][int(np.clip(qindex + delta, 0, 255))])


def ac_q(qindex: int, delta: int = 0, bd: int = 8) -> int:
    return int(_q_tables()[bd][1][int(np.clip(qindex + delta, 0, 255))])


CHROMA_DELTA_Q = 0


def chroma_dq(qindex: int) -> int:
    """Frame-header delta_q_u_dc/ac for the TPU paths (rav1e
    QuantizerParameters, src/quantize/mod.rs: chroma runs at a finer
    quantizer than luma). Clamped so the chroma qindex stays in
    [1, 255] — qindex 0 would flip the plane to lossless semantics."""
    return max(1, min(255, qindex + CHROMA_DELTA_Q)) - qindex


def tx_scale(tx_size: TxSize) -> int:
    """log2 downscale applied by the dequantizer for big transforms."""
    pels = tx_size.width * tx_size.height
    return (1 if pels > 256 else 0) + (1 if pels > 1024 else 0)


def quantize(coeffs: np.ndarray, qindex: int, tx_size: TxSize,
             dc_delta_q: int = 0, bd: int = 8) -> np.ndarray:
    """Deadzone quantizer: coeffs [h][w] -> levels [h][w] (signed).

    Mirrors the reference behavior: bias ~ (q * b) / 64 with b around
    21/64 DC, 17/64 AC (rav1e quantize.rs deadzone offsets).
    """
    dq_dc = dc_q(qindex, dc_delta_q, bd)
    dq_ac = ac_q(qindex, 0, bd)
    shift = tx_scale(tx_size)
    q = np.full(coeffs.shape, dq_ac, np.int64)
    q.flat[0] = dq_dc
    bias = np.full(coeffs.shape, 17, np.int64)
    bias.flat[0] = 21
    a = np.abs(coeffs.astype(np.int64)) << shift
    lvl = (a + (q * bias) // 64) // q
    lvl = np.minimum(lvl, (1 << 15) - 1)
    return (np.sign(coeffs) * lvl).astype(np.int32)


def dequantize(levels: np.ndarray, qindex: int, tx_size: TxSize,
               dc_delta_q: int = 0, bd: int = 8) -> np.ndarray:
    """Normative dequant: levels -> coeffs for the inverse transform."""
    dq_dc = dc_q(qindex, dc_delta_q, bd)
    dq_ac = ac_q(qindex, 0, bd)
    shift = tx_scale(tx_size)
    q = np.full(levels.shape, dq_ac, np.int64)
    q.flat[0] = dq_dc
    a = np.abs(levels.astype(np.int64)) * q
    a = a & 0xFFFFFF  # spec: dequant clamps to 24 bits
    a = a >> shift
    # spec clamps dqcoeff to the inverse-txfm input range
    hi = (1 << (7 + 8)) * 64 - 1  # generous; real clamp applied by itx
    del hi
    return (np.sign(levels) * a).astype(np.int64)
