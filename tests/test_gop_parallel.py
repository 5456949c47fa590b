"""GOP-parallel scheduling (parallel/gop_encode.py): device scatter,
multi-host mock cluster, ordering, and bit-exactness on dav1d.

SURVEY §5.7/§5.8: GOPs are the outer parallel axis; the schedule must
never change bytes — N-device output == 1-device output, and the
concatenated stream decodes to the encoder recons on dav1d.
"""

import numpy as np
import pytest

from rav1e_tpu.parallel.gop_encode import (
    DistributedGopScheduler,
    GopScheduler,
    MockCluster,
    split_gops,
)


def synth(n, w=64, h=64, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (90 + 60 * np.sin((xx + 4 * t) / 13) + 30 * np.cos(yy / 7)
             + rng.normal(0, 4, (h, w))).clip(0, 255)
        u = (128 + 30 * np.sin((xx[::2, ::2] + t) / 11)).clip(0, 255)
        v = (128 - 25 * np.cos((yy[::2, ::2] + t) / 9)).clip(0, 255)
        out.append([y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)])
    return out


def test_split_gops_cadence():
    frames = synth(10)
    gops = split_gops(frames, key_interval=4)
    assert [len(g) for g in gops] == [4, 4, 2]
    assert sum(len(g) for g in gops) == 10


def test_gop_scheduler_matches_serial_and_decodes():
    import jax
    from rav1e_tpu.conform import dav1d
    from rav1e_tpu.pipeline.tpu_inter import encode_gop_tpu

    frames = synth(9)
    sched = GopScheduler(jax.devices()[:4])
    pkts, recs = sched.encode(frames, key_interval=3, qindex=120,
                              speed=6, want_recs=True)
    assert len(pkts) == len(frames) == len(recs)

    # byte-identical to the serial per-GOP encode
    serial = []
    for g in split_gops(frames, 3):
        p, _ = encode_gop_tpu(g, qindex=120, speed=6)
        serial.extend(p)
    assert [bytes(a) for a in pkts] == [bytes(b) for b in serial]

    # decoder oracle over the concatenated stream (seq headers repeat
    # at every GOP keyframe — legal AV1)
    dec = dav1d.decode_all(pkts)
    assert len(dec) == len(frames)
    for i in range(len(frames)):
        for j in range(3):
            assert np.array_equal(dec[i].planes[j],
                                  np.asarray(recs[i][j])), (i, j)


def test_distributed_scheduler_mock_cluster():
    import jax
    frames = synth(8)
    ref = GopScheduler(jax.devices()[:1]).encode(
        frames, key_interval=4, qindex=120, speed=6)

    cluster = MockCluster(2)

    def proc(group):
        return DistributedGopScheduler(group).encode(
            frames, key_interval=4, qindex=120, speed=6)

    outs = cluster.run(proc)
    # every "host" assembles the identical full ordered stream
    for out in outs:
        assert [bytes(a) for a in out] == [bytes(b) for b in ref]


def test_distributed_uneven_gops():
    import jax
    frames = synth(7)   # 3 GOPs of 3/3/1 over 2 "hosts"
    ref = GopScheduler(jax.devices()[:1]).encode(
        frames, key_interval=3, qindex=140, speed=8)
    cluster = MockCluster(2)
    outs = cluster.run(lambda g: DistributedGopScheduler(g).encode(
        frames, key_interval=3, qindex=140, speed=8))
    for out in outs:
        assert [bytes(a) for a in out] == [bytes(b) for b in ref]
