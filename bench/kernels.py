"""Per-kernel microbenchmarks (criterion-benches analog, SURVEY §4
ring 4: transform / intra predict / MC / distortion / CDEF / deblock).

Times steady-state device execution (post-compile) of each hot kernel
at production shapes. Prints one line per kernel with Mpix/s or
Gops/s. Run on the real TPU by default; RAV1E_TPU_PLATFORM=cpu works.

Usage: python bench/kernels.py [--iters N] [--size WxH]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--size", default="1920x1088")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    mpix = w * h / 1e6

    import jax
    import jax.numpy as jnp

    from rav1e_tpu.core.constants import TxSize, TxType
    from rav1e_tpu.ops.tpu import transforms as T
    from rav1e_tpu.ops.tpu.cdef import cdef_filter_frame_jax
    from rav1e_tpu.ops.tpu.deblock import deblock_frame_jax

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.int32))
    u = jnp.asarray(rng.integers(0, 255, (h // 2, w // 2),
                                 dtype=np.int32))
    v = jnp.asarray(rng.integers(0, 255, (h // 2, w // 2),
                                 dtype=np.int32))
    skip8 = jnp.zeros((h // 8, w // 8), bool)

    nblk = (h // 32) * (w // 32)
    resid = jnp.asarray(rng.integers(-64, 64, (nblk, 32, 32),
                                     dtype=np.int32))

    fwd = jax.jit(lambda r: T.forward_transform(r, TxSize.TX_32X32,
                                                TxType.DCT_DCT))
    t = timeit(fwd, (resid,), args.iters)
    print(f"fwd_dct32 whole-frame: {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")

    cf = fwd(resid)
    inv = jax.jit(lambda c: T.inverse_transform(c, TxSize.TX_32X32,
                                                TxType.DCT_DCT))
    t = timeit(inv, (cf,), args.iters)
    print(f"inv_dct32 whole-frame: {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")

    dbf = jax.jit(lambda a, b, c: deblock_frame_jax(
        [a, b, c], jnp.int32(24), jnp.int32(24)))
    t = timeit(dbf, (y, u, v), args.iters)
    print(f"deblock frame:         {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")

    cdf = jax.jit(lambda a, b, c, s: cdef_filter_frame_jax(
        [a, b, c], s, jnp.int32(5), jnp.int32(2), jnp.int32(4),
        jnp.int32(1), jnp.int32(4)))
    t = timeit(cdf, (y, u, v, skip8), args.iters)
    print(f"cdef frame:            {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")

    # full-frame grouped-conv motion search (the MXU workhorse)
    from rav1e_tpu.pipeline.tpu_inter import _core, build_rd_inter
    from rav1e_tpu.ops.ref.quant import ac_q, dc_q
    step, _, _gd = _core(h, w, False, False)
    rd = build_rd_inter(100)
    from rav1e_tpu.pipeline.tpu_inter import pack_src
    src = jnp.asarray(pack_src(
        [rng.integers(0, 255, (h, w), dtype=np.uint8),
         rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8),
         rng.integers(0, 255, (h // 2, w // 2), dtype=np.uint8)]))
    ry = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))
    ru = jnp.asarray(rng.integers(0, 255, (h // 2, w // 2),
                                  dtype=np.uint8))
    prm = jnp.asarray([0, 0, 0, 0, 3], jnp.int32)
    dq, aq = jnp.int32(dc_q(100)), jnp.int32(ac_q(100))
    from rav1e_tpu.pipeline.tpu_inter import _ds16_quads
    ds = _ds16_quads(None, h // 32, w // 32)
    t = timeit(lambda *a: step(*a)[0],
               (src, ry, ru, ru, dq, aq, prm, rd, ds), args.iters)
    print(f"P-step (ME+MC+TX+RD):  {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")

    # ---- CDEF: Pallas kernel vs the XLA twin -------------------
    from rav1e_tpu.ops.tpu.cdef import (
        CDEF_LADDER, _dirs_var, _filter_from_prep, _prep_plane,
        _upsample)
    from rav1e_tpu.ops.tpu.cdef_pallas import cdef_candidates_pallas
    yq = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.int32))
    skip8 = jnp.zeros((h // 8, w // 8), bool)
    dg, vg = _dirs_var(yq)
    dirs = _upsample(dg, 8)
    var = _upsample(vg, 8)
    skip = _upsample(skip8, 8)
    interp = jax.devices()[0].platform == "cpu"

    @jax.jit
    def cdef_xla(yq, dirs, var, skip):
        pp = _prep_plane(yq, dirs, 8, True)
        return jnp.stack(
            [_filter_from_prep(pp, skip, jnp.int32(c[0]),
                               jnp.int32(c[1]), jnp.int32(3), var)
             for c in CDEF_LADDER], 0)

    t = timeit(lambda *a: cdef_xla(*a), (yq, dirs, var, skip),
               args.iters)
    print(f"CDEF 8-cand (XLA):     {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")
    t = timeit(lambda *a: cdef_candidates_pallas(
        *a, jnp.int32(3), is_luma=True, interpret=interp),
        (yq, dirs, var, skip), args.iters)
    print(f"CDEF 8-cand (Pallas):  {t*1e3:7.2f} ms  {mpix/t:8.1f} Mpix/s")


if __name__ == "__main__":
    main()
