"""Keyframe 16->8 partition RDO (kf_split8): conformance on both
oracles, C++/python packer byte-identity, and the decision actually
firing on fine-detail content.

Reference parity: rav1e src/rdo.rs encode_partition_bottomup reaches
8x8 partitions at speed <= 6 (SpeedSettings partition_range); the TPU
path adds a per-quad 16-whole vs four-8x8 joint luma+chroma decision
inside the phase-1 batched mode pass (pipeline/tpu_intra.py).
"""

import numpy as np
import pytest

import rav1e_tpu.pipeline.tpu_inter as tiu
import rav1e_tpu.pipeline.tpu_intra as ti
from rav1e_tpu.conform import aom, dav1d


def _fine_detail(h=96, w=128, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((xx // 8 + yy // 8) % 2 == 0, 90, 170).astype(np.uint8)
    y[:, :48] = (128 + (rng.random((h, 48)) > 0.5) * 80).astype(np.uint8)
    u = (128 + 40 * np.sign(np.sin(xx[::2, ::2] * 0.4))
         ).clip(0, 255).astype(np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return y, u, v


@pytest.fixture
def split_spy(monkeypatch):
    stats = {}
    orig = tiu.unpack_stream

    def spy(counts, pos, val, split, cap=None, split16=None):
        stats["split"] = int(np.asarray(split).sum())
        stats["split16"] = (int(np.asarray(split16).sum())
                            if split16 is not None else 0)
        return orig(counts, pos, val, split, cap=cap, split16=split16)

    monkeypatch.setattr(tiu, "unpack_stream", spy)
    return stats


def test_kf_split8_conformance(split_spy):
    y, u, v = _fine_detail()
    fired = 0
    for q in (40, 80, 130):
        pkt, rec = ti.encode_keyframe_tpu([y, u, v], qindex=q, speed=6,
                                          cdef=(2, 1, 1, 0, 3))
        d = dav1d.decode_all([pkt])[0]
        a = aom.decode_all([pkt])[0]
        for j in range(3):
            assert np.array_equal(d.planes[j], rec[j]), (q, j)
            assert np.array_equal(a[j], rec[j]), (q, j)
        fired += split_spy["split16"]
    assert fired > 0, "no 16->8 split ever chosen on fine detail"


def test_kf_split8_packer_identity(monkeypatch):
    """C++ intra packer with split16 children is byte-identical to the
    python TileWriter fallback."""
    y, u, v = _fine_detail(seed=5)
    pkt_nat, _ = ti.encode_keyframe_tpu([y, u, v], qindex=80, speed=6,
                                        cdef=(2, 1, 1, 0, 3))
    import rav1e_tpu.entropy.native as nat

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("forced python writer")

    monkeypatch.setattr(nat, "NativeTileWriter", Boom)
    pkt_py, _ = ti.encode_keyframe_tpu([y, u, v], qindex=80, speed=6,
                                       cdef=(2, 1, 1, 0, 3))
    assert pkt_nat == pkt_py


def test_kf_split8_off_at_high_speed(split_spy):
    """speed 7 disables kf_split8 (rav1e partition floor rises)."""
    y, u, v = _fine_detail()
    pkt, rec = ti.encode_keyframe_tpu([y, u, v], qindex=80, speed=7)
    assert split_spy["split16"] == 0
    d = dav1d.decode_all([pkt])[0]
    for j in range(3):
        assert np.array_equal(d.planes[j], rec[j]), j
