"""CDEF candidate generation: Pallas kernel vs XLA formulation (TPU).

Produces the Pallas-vs-XLA decision row (VERDICT r4 #10): time the
8-candidate ladder filter for a 1080p luma plane both ways."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from rav1e_tpu.ops.tpu.cdef import (
        CDEF_LADDER,
        _dirs_var,
        _filter_from_prep,
        _prep_plane,
        _upsample,
    )
    from rav1e_tpu.ops.tpu.cdef_pallas import cdef_candidates_pallas

    rng = np.random.default_rng(7)
    h, w = 1088, 1920
    y = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.int32))
    skip8 = jnp.asarray(rng.random((h // 8, w // 8)) < 0.3)
    damping = jnp.int32(4)

    @jax.jit
    def xla_cands(y, skip8, damping):
        dg, vg = _dirs_var(y)
        dirs = _upsample(dg, 8)
        var = _upsample(vg, 8)
        skip = _upsample(skip8, 8)
        pp = _prep_plane(y, dirs, 8, True)
        outs = []
        for c in CDEF_LADDER:
            outs.append(_filter_from_prep(
                pp, skip, jnp.int32(c[0]), jnp.int32(c[1]), damping,
                var))
        return jnp.stack(outs)

    @jax.jit
    def pallas_cands(y, skip8, damping):
        dg, vg = _dirs_var(y)
        dirs = _upsample(dg, 8)
        var = _upsample(vg, 8)
        skip = _upsample(skip8, 8)
        return cdef_candidates_pallas(y, dirs, var, skip, damping,
                                      is_luma=True)

    for name, fn in (("xla", xla_cands), ("pallas", pallas_cands)):
        try:
            out = jax.block_until_ready(fn(y, skip8, damping))
        except Exception as e:
            print(f"{name}: FAILED to compile/run: {type(e).__name__}")
            continue
        t0 = time.time()
        for _ in range(5):
            out = jax.block_until_ready(fn(y, skip8, damping))
        dt = (time.time() - t0) / 5
        print(f"{name:6s}: {dt*1e3:7.2f} ms for 8-candidate 1080p "
              f"luma ladder ({out.shape})")


if __name__ == "__main__":
    main()
