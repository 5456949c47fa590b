"""Deblocking conformance: our filtered recon == decoder output.

Reference parity: rav1e src/deblock.rs; normative spec §7.14 filters
(4/8/14-tap luma, 4/6-tap chroma, masks, thresholds).
"""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d


def synth(w, h, seed=7, noise=12):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 17) + 40 * np.cos(yy / 11)
         + rng.normal(0, noise, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 23)
         + rng.normal(0, 8, (h // 2, w // 2))).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 19)
         + rng.normal(0, 8, (h // 2, w // 2))).clip(0, 255).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("q", [60, 150, 230])
def test_deblocked_keyframe_conformance(q):
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    planes = synth(128, 96)
    pkt, rec = encode_keyframe_tpu(planes, qindex=q, speed=10,
                                   deblock=True)
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i]), f"dav1d plane {i}"
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i]), f"aom plane {i}"
