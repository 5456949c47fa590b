"""Transforms on TPU: bit-exact integer inverse + batched forward.

The inverse transforms REUSE the spec butterfly networks from
ops.ref.transforms by passing lists of jnp int32 arrays as the
"scalars": every op there (+, -, int multiply, arithmetic >>) maps to
vectorized XLA ops, so the network is traced once and fused. Shapes:
each 1-D lane element is a [..., lanes] array, giving full batching
across blocks and across the orthogonal dimension.

Forward transforms are float32 matrix multiplies (MXU) with the exact
inverse-derived matrices, rounded to int — any forward is conformant;
this one matches ops.ref.forward_transform up to float precision.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.core.constants import TxSize, TxType
from rav1e_tpu.ops.ref import transforms as R


def _inv1d_list(kind: str, n: int, vec_list):
    return R._inv1d(kind, n, vec_list)


@partial(jax.jit, static_argnames=("tx_size", "tx_type", "bd"))
def inverse_transform(coeffs: jnp.ndarray, tx_size: TxSize,
                      tx_type: TxType, bd: int = 8) -> jnp.ndarray:
    """coeffs [..., h, w] int32 -> residual [..., h, w] int32.

    Bit-exact vs ops.ref.transforms.inverse_transform.
    """
    h, w = tx_size.height, tx_size.width
    vkind, hkind = R.TX_KINDS[tx_type]
    x = coeffs.astype(jnp.int32)
    rect = (w == 2 * h) or (h == 2 * w)
    row_shift = R._ROW_SHIFT[tx_size]
    clamp_lo, clamp_hi = -(1 << 15), (1 << 15) - 1
    if bd > 8:
        clamp_lo, clamp_hi = -(1 << (bd + 7)), (1 << (bd + 7)) - 1
    # row pass: lane elements indexed by column; arrays [..., h]
    cols = [x[..., :, i] for i in range(w)]
    if rect:
        cols = [R.round2(v * R.INV_SQRT2, 12) for v in cols]
    cols = _inv1d_list(hkind, w, cols)
    cols = [jnp.clip(R.round2(v, row_shift), clamp_lo, clamp_hi)
            for v in cols]
    arr = jnp.stack(cols, axis=-1)  # [..., h, w], row-transformed
    # column pass: lane elements indexed by row; arrays [..., w]
    rows = [arr[..., r, :] for r in range(h)]
    rows = _inv1d_list(vkind, h, rows)
    rows = [R.round2(v, 4) for v in rows]
    return jnp.stack(rows, axis=-2)


@lru_cache(maxsize=None)
def _fwd_mats(tx_size: TxSize, tx_type: TxType):
    h, w = tx_size.height, tx_size.width
    vkind, hkind = R.TX_KINDS[tx_type]
    fv = R._fwd_matrix(h, vkind) * (1 << 4)
    fw = R._fwd_matrix(w, hkind).T
    scale = 1 << R._ROW_SHIFT[tx_size]
    if (w == 2 * h) or (h == 2 * w):
        scale = scale * (4096.0 / R.INV_SQRT2)
    return (np.asarray(fv, np.float32), np.asarray(fw, np.float32),
            float(scale))


@lru_cache(maxsize=None)
def _inv_mats(tx_size: TxSize, tx_type: TxType):
    fv, fw, scale = _fwd_mats(tx_size, tx_type)
    return (np.asarray(np.linalg.inv(fv.astype(np.float64)),
                       np.float32),
            np.asarray(np.linalg.inv(fw.astype(np.float64)),
                       np.float32),
            float(scale))


@partial(jax.jit, static_argnames=("tx_size", "tx_type"))
def inverse_approx(coeffs: jnp.ndarray, tx_size: TxSize,
                   tx_type: TxType) -> jnp.ndarray:
    """Float inverse on the MXU — NOT bit-exact (the integer
    butterfly network costs ~10x more). For mode-RDO ranking only;
    final reconstruction must use inverse_transform."""
    iv, iw, scale = _inv_mats(tx_size, tx_type)
    x = coeffs.astype(jnp.float32) * (1.0 / scale)
    with jax.default_matmul_precision("float32"):
        t = jnp.einsum("ij,...jk->...ik", jnp.asarray(iv), x)
        t = jnp.einsum("...ij,jk->...ik", t, jnp.asarray(iw))
    return jnp.round(t).astype(jnp.int32)


@partial(jax.jit, static_argnames=("tx_size", "tx_type"))
def forward_transform(residual: jnp.ndarray, tx_size: TxSize,
                      tx_type: TxType) -> jnp.ndarray:
    """residual [..., h, w] -> coeffs [..., h, w] int32 (MXU matmuls)."""
    fv, fw, scale = _fwd_mats(tx_size, tx_type)
    x = residual.astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        t = jnp.einsum("ij,...jk->...ik", fv, x)
        t = jnp.einsum("...ij,jk->...ik", t, fw)
    c = jnp.round(t * scale).astype(jnp.int32)
    h, w = tx_size.height, tx_size.width
    if w == 64 or h == 64:
        mask = np.ones((h, w), bool)
        if w == 64:
            mask[:, 32:] = False
        if h == 64:
            mask[32:, :] = False
        c = jnp.where(jnp.asarray(mask), c, 0)
    return c


@partial(jax.jit, static_argnames=("tx_size", "dc_q", "ac_q"))
def quantize(coeffs: jnp.ndarray, tx_size: TxSize, dc_q: int,
             ac_q: int) -> jnp.ndarray:
    """Deadzone quantizer, same behavior as ops.ref.quant.quantize."""
    from rav1e_tpu.ops.ref.quant import tx_scale
    shift = tx_scale(tx_size)
    h, w = tx_size.height, tx_size.width
    q = np.full((h, w), ac_q, np.int32)
    q[0, 0] = dc_q
    bias = np.full((h, w), 17, np.int32)
    bias[0, 0] = 21
    qj = jnp.asarray(q)
    bj = jnp.asarray(bias)
    a = jnp.abs(coeffs) << shift
    lvl = (a + (qj * bj) // 64) // qj
    lvl = jnp.minimum(lvl, (1 << 15) - 1)
    return jnp.sign(coeffs) * lvl


@partial(jax.jit, static_argnames=("tx_size", "dc_q", "ac_q"))
def dequantize(levels: jnp.ndarray, tx_size: TxSize, dc_q: int,
               ac_q: int) -> jnp.ndarray:
    from rav1e_tpu.ops.ref.quant import tx_scale
    shift = tx_scale(tx_size)
    h, w = tx_size.height, tx_size.width
    q = np.full((h, w), ac_q, np.int32)
    q[0, 0] = dc_q
    a = jnp.abs(levels) * jnp.asarray(q)
    a = (a & 0xFFFFFF) >> shift
    return jnp.sign(levels) * a
