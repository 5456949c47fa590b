"""Ablate the P-step device time on the real TPU: time the jitted
step with stages toggled (deblock search, split RDO, SATD) to find
where the device milliseconds go. Compiles each variant once
(persistent cache makes reruns cheap)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from rav1e_tpu.ops.ref.quant import ac_q, dc_q
    from rav1e_tpu.pipeline import tpu_inter as TI

    w, h = 1920, 1088
    rng = np.random.default_rng(3)
    y = rng.integers(0, 255, (h, w)).astype(np.uint8)
    u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    src = jnp.asarray(TI.pack_src([y, u, v]))
    ref = (jnp.asarray(np.roll(y, 3, 1)), jnp.asarray(u),
           jnp.asarray(v))
    q = 100
    dcq, acq = jnp.int32(dc_q(q)), jnp.int32(ac_q(q))
    cdef_prm = jnp.asarray([0, 0, 0, 0, 3], jnp.int32)
    rd = TI.build_rd_inter(q)
    ds = TI._ds16_quads(None, h // 32, w // 32)

    variants = [
        ("full (deblock+split+satd)", dict(use_deblock=True,
                                           use_split=True,
                                           use_satd=True)),
        ("no deblock", dict(use_deblock=False, use_split=True,
                            use_satd=True)),
        ("no split", dict(use_deblock=True, use_split=False,
                          use_satd=True)),
        ("no satd", dict(use_deblock=True, use_split=True,
                         use_satd=False)),
        ("bare (none)", dict(use_deblock=False, use_split=False,
                             use_satd=False)),
    ]
    for name, kw in variants:
        step, _, _ = TI._core(h, w, False, **kw)
        t0 = time.time()
        o = step(src, *ref, dcq, acq, cdef_prm, rd, ds)
        jax.block_until_ready(o)
        comp = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            o = step(src, *ref, dcq, acq, cdef_prm, rd, ds)
            jax.block_until_ready(o)
            times.append(time.time() - t0)
        print(f"{name:28s} compile+run {comp:6.1f}s  "
              f"steady {min(times)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
