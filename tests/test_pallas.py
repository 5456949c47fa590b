"""Pallas TPU kernels vs their XLA twins (bit-exact).

On CPU the kernels run in interpreter mode; on the real chip they
compile through Mosaic. Arithmetic must match the XLA formulation
exactly (which is itself oracle-validated against dav1d/libaom)."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("is_luma", [True, False])
def test_cdef_pallas_matches_xla(is_luma):
    from rav1e_tpu.ops.tpu.cdef import (
        CDEF_LADDER,
        _dirs_var,
        _filter_from_prep,
        _prep_plane,
        _upsample,
    )
    from rav1e_tpu.ops.tpu.cdef_pallas import cdef_candidates_pallas

    rng = np.random.default_rng(7)
    h, w = 64, 192
    y = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.int32))
    skip8 = jnp.asarray(rng.random((h // 8, w // 8)) < 0.3)
    dg, vg = _dirs_var(y)
    import jax

    interp = jax.devices()[0].platform == "cpu"
    if is_luma:
        plane, n = y, 8
        var = _upsample(vg, 8)
    else:
        plane = jnp.asarray(
            rng.integers(0, 255, (h // 2, w // 2)).astype(np.int32))
        n = 4
        var = jnp.zeros_like(plane)
    dirs = _upsample(dg, n)
    skip = _upsample(skip8, n)
    outs = cdef_candidates_pallas(plane, dirs, var, skip, jnp.int32(3),
                                  is_luma=is_luma, interpret=interp)
    pp = _prep_plane(plane, dirs, n, is_luma)
    for k, c in enumerate(CDEF_LADDER):
        pri, sec = (c[0], c[1]) if is_luma else (c[2], c[3])
        ref = _filter_from_prep(pp, skip, jnp.int32(pri),
                                jnp.int32(sec), jnp.int32(3),
                                var if is_luma else None)
        assert np.array_equal(np.asarray(outs[k]), np.asarray(ref)), k
