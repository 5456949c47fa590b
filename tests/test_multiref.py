"""Low-latency multi-ref P-frame conformance (encode_pframe2_tpu).

This path (speed <=5, low_latency, 8-bit 4:2:0, 2nd P frame onward)
shipped broken in round 4 — `_pack_pframe_mref` referenced an
undefined `bit_depth` (VERDICT r4 Weak #1) and no test reached it.
Reference parity: rav1e multiref (src/api/config/speedsettings.rs
multiref, SURVEY §2.1 ME row: up to 7 refs; ours: LAST + GOLDEN).
"""

import numpy as np
import pytest

from rav1e_tpu.api.context import Config
from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.pipeline.tpu_inter import encode_pframe2_tpu
from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu


def _moving(w, h, n, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 64)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = base[8:8 + h, 2 * t:2 * t + w].copy()
        # a static region: multiref should skip it against GOLDEN
        y[: h // 4] = 90
        u = np.full((h // 2, w // 2), 110 + t, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append([y, u, v])
    return frames


def test_pframe2_direct_conformance():
    """Direct call: KF -> P1 -> P2(multi-ref), decode == recon on
    BOTH oracles."""
    w, h = 128, 96
    frames = _moving(w, h, 3)
    q = 110
    kf_pkt, kf_rec = encode_keyframe_tpu(frames[0], qindex=q, speed=6)
    from rav1e_tpu.pipeline.tpu_inter import encode_pframe_tpu
    p1_pkt, p1_rec = encode_pframe_tpu(frames[1], kf_rec, qindex=q,
                                       order_hint=1)
    p2_pkt, p2_rec = encode_pframe2_tpu(
        frames[2], p1_rec, kf_rec, qindex=q, order_hint=2,
        slot_last=0, slot_golden=1, golden_hint=0)
    pkts = [kf_pkt, p1_pkt, p2_pkt]
    recs = [kf_rec, p1_rec, p2_rec]
    dec = dav1d.decode_all(pkts)
    for i, rec in enumerate(recs):
        for j in range(3):
            assert np.array_equal(dec[i].planes[j], rec[j]), (i, j)
    deca = aom.decode_all(pkts)
    for i, rec in enumerate(recs):
        for j in range(3):
            assert np.array_equal(deca[i][j], rec[j]), (i, j)


@pytest.mark.parametrize("speed", [4, 5])
def test_context_low_latency_multiref(speed):
    """Context at speed<=5 low-latency reaches encode_pframe2_tpu from
    the 2nd P frame; 8 frames must all decode."""
    w, h = 96, 64
    frames = _moving(w, h, 8, seed=5)
    ctx = Config(width=w, height=h, quantizer=120, speed=speed,
                 low_latency=True, key_frame_interval=100).new_context()
    for f in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts.append(p)
    assert [p.frame_type for p in pkts].count("KEY") == 1
    assert len(pkts) == len(frames)
    dec = dav1d.decode_all([p.data for p in pkts])
    assert len(dec) == len(frames)
