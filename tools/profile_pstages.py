"""Per-feature device-time attribution for the batched P step.

Compiles `_core` variants with individual speed-6 features toggled and
times steady-state device execution (block_until_ready over N frames),
so regressions name their feature instead of hiding in the lump sum
(SURVEY §5.1 tracing analog; the r2 speed-6 toolset multiplied device
time ~9x and this pinpoints where).

Usage: python tools/profile_pstages.py [--size WxH] [--frames N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1088")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--qindex", type=int, default=100)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.ops.ref.quant import ac_q, dc_q

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import synth_1080p

    frames = synth_1080p(n=args.frames + 1)
    if (h, w) != frames[0][0].shape:
        raise SystemExit("profile expects 1920x1088 synth content")
    q = args.qindex
    rd = TI.build_rd_inter(q)
    dcq = jnp.int32(dc_q(q))
    acq = jnp.int32(ac_q(q))
    cdef_prm = jnp.asarray([0, 0, 0, 0, 3], jnp.int32)
    ds = TI._ds16_quads(None, h // 32, w // 32)
    ref = tuple(jnp.asarray(np.asarray(p, np.uint8)) for p in frames[0])
    srcs = [jnp.asarray(TI.pack_src(f)) for f in frames[1:]]
    jax.block_until_ready(srcs)

    variants = [
        ("base", dict(use_cdef=False, use_deblock=False,
                      use_split=False, use_satd=False)),
        ("+split", dict(use_cdef=False, use_deblock=False,
                        use_split=True, use_satd=False)),
        ("+satd", dict(use_cdef=False, use_deblock=False,
                       use_split=True, use_satd=True)),
        ("+deblock", dict(use_cdef=False, use_deblock=True,
                          use_split=True, use_satd=True)),
        ("+cdef", dict(use_cdef=True, use_deblock=True,
                       use_split=True, use_satd=True)),
    ]
    for name, kw in variants:
        t0 = time.time()
        step, _, _ = TI._core(h, w, refine16=False, **kw)
        o = step(srcs[0], *ref, dcq, acq, cdef_prm, rd, ds)
        jax.block_until_ready(o[0])
        compile_s = time.time() - t0
        t0 = time.time()
        r = ref
        for s in srcs:
            o = step(s, *r, dcq, acq, cdef_prm, rd, ds)
            r = o[4:7]
        jax.block_until_ready(o[0])
        dt = (time.time() - t0) / len(srcs)
        print(f"{name:14s} {dt*1e3:8.1f} ms/frame   "
              f"(compile+first {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
