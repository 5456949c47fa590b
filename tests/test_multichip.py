"""Tile-parallel (multi-chip) encoding over a virtual device mesh.

Mirrors the reference's strategy of testing real codepaths at small
sizes (SURVEY §4): the production shard_map tile encoder runs on the
8-device CPU mesh from conftest; correctness is arbitrated by the
decode oracles (cross-tile deblock halos included).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.parallel.tile_encode import encode_pframe_tiled
from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu


@pytest.mark.parametrize("n_dev", [2, 4])
def test_tiled_pframe_conformance(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    rng = np.random.default_rng(5)
    from scipy.ndimage import gaussian_filter, rotate
    h, w = 128, 64 * n_dev * 2 if n_dev == 2 else 64 * n_dev
    w = 64 * n_dev
    base = gaussian_filter(rng.normal(0, 60, (h * 2, w * 2)), 1.0)

    def fr(ang):
        r = rotate(base, ang, reshape=False, order=1)
        y = (128 + r[h // 2:h // 2 + h, w // 2:w // 2 + w]
             ).clip(0, 255).astype(np.uint8)
        return [y, np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 135, np.uint8)]

    f0, f1 = fr(0), fr(2)
    pk, rk = encode_keyframe_tpu(f0, qindex=100, speed=7,
                                 cdef=(2, 1, 1, 0, 4))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("tile",))
    pp, rp = encode_pframe_tiled(f1, rk, 100, mesh)
    d = dav1d.decode_all([pk, pp])
    a = aom.decode_all([pk, pp])
    for j in range(3):
        assert np.array_equal(d[1].planes[j], rp[j]), j
        assert np.array_equal(a[1][j], rp[j]), j
