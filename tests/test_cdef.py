"""CDEF conformance: spec 7.15 filter must match both decode oracles,
and the batched JAX port must match the numpy reference bit-exactly."""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.pipeline.intra import encode_keyframe


def _mk(w, h, seed=3):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin((xx + yy) / 9)
         + r.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (120 + 40 * np.sin((xx[::2, ::2] - yy[::2, ::2]) / 13)
         ).clip(0, 255).astype(np.uint8)
    v = (135 + 30 * np.cos((xx[::2, ::2] + 2 * yy[::2, ::2]) / 11)
         ).clip(0, 255).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("cdef", [
    (2, 0, 0, 0, 3),    # luma primary only
    (0, 1, 0, 0, 3),    # luma secondary only (dir forced 0)
    (0, 0, 0, 1, 4),    # chroma secondary only
    (3, 2, 2, 1, 5),    # all filters
    (15, 4, 15, 4, 6),  # max strengths
])
def test_cdef_bit_exact(cdef):
    f = _mk(96, 72)
    pkt, rec = encode_keyframe(f, qindex=150, cdef=cdef)
    d = dav1d.decode_all([pkt])
    for j in range(3):
        assert np.array_equal(d[0].planes[j], rec[j]), j
    a = aom.decode_all([pkt])
    for j in range(3):
        assert np.array_equal(a[0][j], rec[j]), j


def test_cdef_inter_chain():
    from rav1e_tpu.pipeline.inter import encode_pframe
    f0 = _mk(128, 128, 5)
    kp, kr = encode_keyframe(f0, qindex=150, cdef=(3, 1, 2, 1, 4))
    f1 = [np.roll(f0[0], 3, axis=1), f0[1], f0[2]]
    pp, pr = encode_pframe(f1, kr, qindex=150, order_hint=1,
                           cdef=(3, 1, 2, 1, 4))
    d = dav1d.decode_all([kp, pp])
    for i, rec in enumerate([kr, pr]):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], rec[j]), (i, j)


def test_jax_cdef_matches_reference():
    import jax.numpy as jnp

    from rav1e_tpu.ops.ref.cdef import cdef_filter_frame
    from rav1e_tpu.ops.tpu.cdef import cdef_filter_frame_jax
    rng = np.random.default_rng(0)
    h, w = 96, 160
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    skip8 = rng.random((h // 8, w // 8)) < 0.3
    prm = (3, 2, 2, 1, 4)
    ref = cdef_filter_frame([y.copy(), u.copy(), v.copy()], skip8, *prm)
    out = cdef_filter_frame_jax(
        [jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)],
        jnp.asarray(skip8), *[jnp.int32(x) for x in prm])
    for j in range(3):
        assert np.array_equal(np.asarray(out[j]), ref[j]), j
