"""Tile/GOP-sharded encode step over a jax Mesh.

Reference parity: rav1e encodes tiles on rayon threads
(encode_tile_group, SURVEY §2.1 parallelism table); here tiles shard
across chips on the 'tile' mesh axis and frames across the 'gop' axis.
AV1 tiles have independent CDF/context state by spec, so the compute
pass is embarrassingly parallel; cross-tile work (loop-filter halos)
arrives with the filter milestone as ppermute exchanges.

The step below is the transform half of the intra encoder (predictless
DC-from-mean variant for shape simplicity): blockify, forward DCT on
the MXU, quantize, dequantize, bit-exact inverse, reconstruct, and
psum distortion stats across the mesh — the collective pattern the
full pipeline uses for rate control.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rav1e_tpu.core.constants import TxSize, TxType
from rav1e_tpu.ops.tpu import transforms as T

LB = 32


def make_mesh(devices=None, gop: int = 2, tile: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tile is None:
        tile = n // gop
    assert gop * tile == n, (gop, tile, n)
    arr = np.asarray(devices).reshape(gop, tile)
    return Mesh(arr, ("gop", "tile"))


def _tile_encode_step(frames, qdc, qac):
    """Per-shard body: frames [f_local, H, W_local] int32."""
    f, hh, ww = frames.shape
    bh, bw = hh // LB, ww // LB
    blocks = frames.reshape(f, bh, LB, bw, LB).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(f * bh * bw, LB, LB)
    pred = jnp.full_like(blocks, 128)
    resid = blocks - pred
    cf = T.forward_transform(resid, TxSize.TX_32X32, TxType.DCT_DCT)
    lv = T.quantize(cf, TxSize.TX_32X32, qdc, qac)
    dq = T.dequantize(lv, TxSize.TX_32X32, qdc, qac)
    r2 = T.inverse_transform(dq, TxSize.TX_32X32, TxType.DCT_DCT)
    rec = jnp.clip(pred + r2, 0, 255)
    sse_local = jnp.sum((rec - blocks).astype(jnp.int64) ** 2)
    nz_local = jnp.sum(lv != 0)
    # rate-control statistics ride the mesh collectives
    sse = jax.lax.psum(sse_local, axis_name=("gop", "tile"))
    nz = jax.lax.psum(nz_local, axis_name=("gop", "tile"))
    rec_frames = rec.reshape(f, bh, bw, LB, LB).transpose(0, 1, 3, 2, 4)
    rec_frames = rec_frames.reshape(f, hh, ww)
    lv_frames = lv.reshape(f, bh, bw, LB, LB).transpose(0, 1, 3, 2, 4)
    lv_frames = lv_frames.reshape(f, hh, ww)
    return rec_frames, lv_frames, sse, nz


def sharded_encode_step(mesh: Mesh, qdc: int = 66, qac: int = 66):
    """Build the jitted tile/GOP-sharded step for this mesh."""
    spec_in = P("gop", None, "tile")
    body = partial(_tile_encode_step, qdc=qdc, qac=qac)
    step = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec_in,),
            out_specs=(spec_in, spec_in, P(), P()),
        )
    )
    return step, NamedSharding(mesh, spec_in)


def dryrun(n_devices: int):
    """Compile + run one sharded step on tiny shapes (driver hook)."""
    mesh = make_mesh(jax.devices()[:n_devices],
                     gop=2 if n_devices % 2 == 0 else 1)
    step, sh_in = sharded_encode_step(mesh)
    gop, tile = mesh.devices.shape
    frames = jnp.zeros((2 * gop, LB, LB * tile), jnp.int32)
    frames = jax.device_put(frames, sh_in)
    rec, lv, sse, nz = step(frames)
    jax.block_until_ready(rec)
    assert rec.shape == frames.shape
    return int(sse), int(nz)
