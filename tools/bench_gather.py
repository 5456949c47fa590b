"""Microbenchmark: batched patch extraction + full-pel SSD search
formulations on the real TPU.

The P-step trace (round 3) shows vmap(dynamic_slice) patch gathers
lowering to a serial while+DUS (~36 ms/frame) and the grouped-conv
full-pel search costing ~38 ms/frame — together most of the step.
Candidates:
  gather:  (a) vmap(lax.dynamic_slice)   [current]
           (b) flat jnp.take gather
           (c) Pallas per-block DMA kernel
  search:  (d) grouped conv corr         [current]
           (e) scan-over-dy direct SSD
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


H, W = 1088 + 64, 1920 + 64   # padded 1080p plane
B = (1088 // 32) * (1920 // 32)
P = 41
S = 16


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n * 1e3, out


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.int32)
    r0 = jnp.asarray(rng.integers(0, H - P, B), jnp.int32)
    c0 = jnp.asarray(rng.integers(0, W - P, B), jnp.int32)

    @jax.jit
    def g_vmap(plane, r0, c0):
        def one(r, c):
            return jax.lax.dynamic_slice(plane, (r, c), (P, P))
        return jax.vmap(one)(r0, c0)

    @jax.jit
    def g_take(plane, r0, c0):
        rr = r0[:, None, None] + jnp.arange(P)[None, :, None]
        cc = c0[:, None, None] + jnp.arange(P)[None, None, :]
        return plane.reshape(-1)[(rr * W + cc).reshape(-1)].reshape(
            B, P, P)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 8

    def kern(offs_ref, plane_ref, out_ref, sems):
        i = pl.program_id(0)
        for k in range(G):
            b = i * G + k
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(offs_ref[b, 0], P),
                             pl.ds(offs_ref[b, 1], P)],
                out_ref.at[k], sems.at[k]).start()
        for k in range(G):
            b = i * G + k
            pltpu.make_async_copy(
                plane_ref.at[pl.ds(offs_ref[b, 0], P),
                             pl.ds(offs_ref[b, 1], P)],
                out_ref.at[k], sems.at[k]).wait()

    @jax.jit
    def g_pallas(plane, r0, c0):
        offs = jnp.stack([r0, c0], 1)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (G, P, P), lambda i, offs: (i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((G,))],
            ),
            out_shape=jax.ShapeDtypeStruct((B, P, P), jnp.int32),
        )(offs, plane)

    t, ref = timeit(g_vmap, plane, r0, c0)
    print(f"gather vmap-dynslice: {t:7.2f} ms")
    t, o = timeit(g_take, plane, r0, c0)
    print(f"gather flat-take:     {t:7.2f} ms  match={bool(jnp.all(o == ref))}")
    try:
        t, o = timeit(g_pallas, plane, r0, c0)
        print(f"gather pallas-dma:    {t:7.2f} ms  match={bool(jnp.all(o == ref))}")
    except Exception as e:
        print("gather pallas-dma FAILED:", repr(e))

    # ---- full-pel SSD search formulations --------------------------
    h, w = 1088, 1920
    nby, nbx = h // 32, w // 32
    src = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.int32)
    refp = jnp.asarray(rng.integers(0, 255, (h + 2 * S, w + 2 * S)),
                       jnp.int32)

    @jax.jit
    def s_conv(src, refp):
        # current: static tiled windows + grouped bf16 conv + wsq
        blks = (src.reshape(nby, 32, nbx, 32).transpose(0, 2, 1, 3)
                .reshape(B, 32, 32))
        win = 2 * S + 32
        g = jnp.pad(refp, ((0, 31), (0, 31)))
        g = (g[:32 * (nby + 1), :32 * (nbx + 1)]
             .reshape(nby + 1, 32, nbx + 1, 32).transpose(0, 2, 1, 3))
        rows = [jnp.concatenate([g[i:nby + i, j:nbx + j]
                                 for j in range(2)], axis=-1)
                for i in range(2)]
        wins = (jnp.concatenate(rows, axis=-2)
                .reshape(B, 64, 64)[:, :win, :win])
        corr = jax.lax.conv_general_dilated(
            wins.astype(jnp.bfloat16)[None],
            blks.astype(jnp.bfloat16)[:, None],
            (1, 1), "VALID", feature_group_count=B,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)[0]
        wsq = jax.lax.reduce_window(
            (refp * refp).astype(jnp.float32), 0.0, jax.lax.add,
            (32, 32), (1, 1), "valid")
        wsq_t = jnp.pad(wsq, ((0, 31), (0, 31)))
        wsq_t = (wsq_t[:32 * (nby + 1), :32 * (nbx + 1)]
                 .reshape(nby + 1, 32, nbx + 1, 32)
                 .transpose(0, 2, 1, 3))
        rows = [jnp.concatenate([wsq_t[i:nby + i, j:nbx + j]
                                 for j in range(2)], axis=-1)
                for i in range(2)]
        wsqw = (jnp.concatenate(rows, axis=-2)
                .reshape(B, 64, 64)[:, :2 * S + 1, :2 * S + 1])
        ssd = (wsqw - 2.0 * corr
               + jnp.sum((blks * blks).astype(jnp.float32),
                         (1, 2))[:, None, None])
        return ssd

    @jax.jit
    def s_scan(src, refp):
        # direct SSD: for each shift, whole-frame diff^2 + 32x32
        # box-reduce; scan over dy, unrolled over dx
        span = 2 * S + 1

        def body(carry, dy):
            strip = jax.lax.dynamic_slice(refp, (dy, 0),
                                          (h, w + 2 * S))
            outs = []
            for dx in range(span):
                d = strip[:, dx:dx + w] - src
                p = (d * d).astype(jnp.float32)
                t = (p.reshape(nby, 32, nbx, 32).sum((1, 3)))
                outs.append(t)
            return carry, jnp.stack(outs, 0)   # [span, nby, nbx]

        _, rows = jax.lax.scan(body, 0, jnp.arange(span))
        # rows [span(dy), span(dx), nby, nbx] -> [B, span, span]
        return rows.transpose(2, 3, 0, 1).reshape(B, span, span)

    t, ssd_ref = timeit(s_conv, src, refp, n=10)
    print(f"search grouped-conv:  {t:7.2f} ms")
    t, o = timeit(s_scan, src, refp, n=10)
    err = float(jnp.max(jnp.abs(o - ssd_ref)))
    print(f"search scan-ssd:      {t:7.2f} ms  maxerr={err}")


if __name__ == "__main__":
    main()
