"""Per-stage timing of the 1080p GOP encode (SURVEY §5.1 analog of
rav1e's tracing feature + CLI progress stats).

Splits wall time into: host->device upload, device compute (ME+MC+
transform+CDEF), device->host transfer, and host entropy packing, for
both the wavefront keyframe and the batched P pipeline. Run on the
real TPU (default) or RAV1E_TPU_PLATFORM=cpu.

Usage: python tools/profile_gop.py [--frames N] [--size WxH] [--speed S]
       [--trace DIR]   (--trace writes a jax.profiler trace for
                        TensorBoard/Perfetto)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 100 + 50 * np.sin(xx / 37) + 40 * np.cos(yy / 23)
    noise = rng.normal(0, 5, (h, w))
    out = []
    for t in range(n):
        y = (base + 20 * np.sin((xx + 3 * t) / 29) + noise).clip(0, 255)
        u = (128 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 31)).clip(0, 255)
        v = (128 - 25 * np.cos((yy[::2, ::2] + t) / 27)).clip(0, 255)
        out.append([y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="1920x1088")
    ap.add_argument("--speed", type=int, default=6)
    ap.add_argument("--qindex", type=int, default=100)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    from rav1e_tpu.ops.ref.quant import ac_q, dc_q
    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    frames = synth(w, h, args.frames)
    q = args.qindex

    # ---- keyframe ----
    t0 = time.time()
    pkt, rec = encode_keyframe_tpu(frames[0], qindex=q,
                                   speed=args.speed, deblock=False)
    t_kf_compile = time.time() - t0
    t0 = time.time()
    pkt, rec = encode_keyframe_tpu(frames[0], qindex=q,
                                   speed=args.speed, deblock=False)
    t_kf = time.time() - t0
    print(f"KF: compile+run {t_kf_compile:.1f}s, steady {t_kf:.3f}s")

    # ---- P pipeline, staged ----
    step, _, gather_dense = TI._core(h, w, False, refine16=False)
    rd = TI.build_rd_inter(q)
    dcq = jnp.int32(dc_q(q))
    acq = jnp.int32(ac_q(q))
    cdef_prm = jnp.asarray([0, 0, 0, 0, 3], jnp.int32)
    ref_dev = tuple(jnp.asarray(np.asarray(p, np.uint8)) for p in rec)

    ds = TI._ds16_quads(None, h // 32, w // 32)
    # compile
    o = step(jnp.asarray(TI.pack_src(frames[1])), *ref_dev, dcq, acq,
             cdef_prm, rd, ds)
    jax.block_until_ready(o)

    n = len(frames) - 1
    t_up = t_dev = t_fetch = t_pack = 0.0
    ctx = None
    if args.trace:
        jax.profiler.start_trace(args.trace)
    for i, f in enumerate(frames[1:], start=1):
        t0 = time.time()
        dev_in = jnp.asarray(TI.pack_src(f))
        jax.block_until_ready(dev_in)
        t_up += time.time() - t0
        t0 = time.time()
        o = step(dev_in, *ref_dev, dcq, acq, cdef_prm, rd, ds)
        jax.block_until_ready(o)
        t_dev += time.time() - t0
        ref_dev = o[4:7]
        t0 = time.time()
        (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16, lf_lvl,
         _ci, _ch, _m2, _b64, _s16, _sk8) = TI._fetch_packed(
            o, gather_dense, h // 32, w // 32)
        t_fetch += time.time() - t0
        t0 = time.time()
        TI._pack_pframe(h, w, q, i, mv8, skip, lv_y, lv_u, lv_v,
                        lf_level=lf_lvl, split=split, mv16=mv16,
                        skip16=skip16)
        t_pack += time.time() - t0
    if args.trace:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")

    tot = t_up + t_dev + t_fetch + t_pack
    print(f"P x{n}: upload {t_up/n*1e3:.1f}ms  device {t_dev/n*1e3:.1f}ms"
          f"  fetch {t_fetch/n*1e3:.1f}ms  pack {t_pack/n*1e3:.1f}ms"
          f"  total {tot/n*1e3:.1f}ms/frame ({n/tot:.2f} fps serial)")
    print("NOTE: production path overlaps device compute with host "
          "pack (async dispatch) - serial split above shows where the "
          "time goes, not the pipelined fps.")


if __name__ == "__main__":
    main()
