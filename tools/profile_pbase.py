"""Sub-kernel timing of the P-step decision core (SURVEY §5.1).

Times the pieces of p_frame_body in isolation (full-pel conv search,
subpel descent, final MC, transform+quant+skip RD, coefficient-rate
model) so 'base' regressions name their kernel.

Usage: python tools/profile_pbase.py [--size WxH]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(f, *a, n=5):
    import jax
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = f(*a)
        jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1088")
    ap.add_argument("--qindex", type=int, default=100)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from rav1e_tpu.core.constants import TxSize, TxType
    from rav1e_tpu.ops.ref.quant import ac_q, dc_q
    from rav1e_tpu.ops.tpu import transforms as T
    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.tpu_intra import block_bits

    q = args.qindex
    rd = TI.build_rd_inter(q)
    nby, nbx = h // 32, w // 32
    B = nby * nbx
    by = jnp.asarray((np.repeat(np.arange(nby), nbx) * 32)
                     .astype(np.int32))
    bx = jnp.asarray((np.tile(np.arange(nbx), nby) * 32)
                     .astype(np.int32))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.int32))
    refp = jnp.asarray(rng.integers(0, 255,
                                    (h + 2 * TI.PAD, w + 2 * TI.PAD))
                       .astype(np.int32))
    blks = TI.to_blocks(src, 32)
    mv8 = jnp.asarray(rng.integers(-64, 64, (B, 2)).astype(np.int32))

    f_search = jax.jit(lambda r, b: TI._search_one_ref(r, b, by, bx,
                                                       rd, B, True)[0])
    print(f"fullpel+subpel search {bench(f_search, refp, blks):8.1f} ms")

    f_mc = jax.jit(lambda r, m: TI._mc_batch(r, by, bx, m, 32, 0))
    print(f"mc_batch 32 (1 gather) {bench(f_mc, refp, mv8):7.1f} ms")

    dcq = jnp.int32(dc_q(q))
    acq = jnp.int32(ac_q(q))

    @jax.jit
    def code32(resid):
        cf = T.forward_transform(resid, TxSize.TX_32X32, TxType.DCT_DCT)
        lv = jnp.sign(cf) * jnp.minimum(
            (jnp.abs(cf) * 2 + (acq * 17) // 64) // acq, 32767)
        dq = jnp.sign(lv) * (((jnp.abs(lv) * acq) & 0xFFFFFF) >> 1)
        return T.inverse_transform(dq, TxSize.TX_32X32, TxType.DCT_DCT)

    resid = blks - 128
    print(f"fwd+q+exact inv TX32   {bench(code32, resid):7.1f} ms")

    lv = jnp.asarray(rng.integers(-9, 9, (B, 32, 32)).astype(np.int32))
    f_bits = jax.jit(lambda x: block_bits(x, rd["y32"]))
    print(f"block_bits TX32        {bench(f_bits, lv):7.1f} ms")

    f_satd = jax.jit(lambda d: TI.satd(d))
    d = (blks - 100).astype(jnp.float32)
    print(f"satd 32                {bench(f_satd, d):7.1f} ms")


if __name__ == "__main__":
    main()
