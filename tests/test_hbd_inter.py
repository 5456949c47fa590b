"""10-bit 4:2:0 through the TPU inter path (VERDICT r2 missing #7 /
BASELINE config 5): keyframe from the numpy reference pipeline, P/B
frames through the batched TPU pipelines, bit-exact on both oracles."""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d


def _frames10(n, h=64, w=96, seed=21):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    base = gaussian_filter(rng.normal(0, 220, (h + 32, w + 32)), 1.1)

    def fr(t):
        y = (512 + base[t:t + h, 2 * t:2 * t + w]).clip(0, 1023)
        u = (480 + base[::2, ::2][:h // 2, :w // 2] / 2).clip(0, 1023)
        return [y.astype(np.uint16), u.astype(np.uint16),
                np.full((h // 2, w // 2), 530, np.uint16)]

    return [fr(t) for t in range(n)]


def test_tpu_pframe_10bit():
    """10-bit P frames on the TPU path (full s6 toolset incl. split8,
    b64, intra-in-inter, deblock + CDEF searches at CoeffShift=2),
    decoder output == recon on dav1d AND libaom."""
    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.intra import encode_keyframe

    frames = _frames10(3)
    q = 120
    pk, rk = encode_keyframe(frames[0], qindex=q, bit_depth=10,
                             cdef=(2, 1, 1, 0, 4))
    pkts, recs = [pk], [rk]
    for t in range(1, 3):
        pp, rp = TI.encode_pframe_tpu(
            frames[t], recs[-1], qindex=q, order_hint=t,
            cdef=(2, 1, 1, 0, 4), bit_depth=10,
            use_satd=True, intra_rdo=True, b64_rdo=True,
            use_split8=True)
        pkts.append(pp)
        recs.append(rp)
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i in range(len(pkts)):
        for j in range(3):
            assert np.array_equal(
                np.asarray(d[i].planes[j], np.int32), recs[i][j]), \
                (i, j, "dav1d")
            assert np.array_equal(
                np.asarray(a[i][j], np.int32), recs[i][j]), \
                (i, j, "aom")


def test_tpu_pframe_10bit_no_filters():
    """Filter-free 10-bit P (isolates MC + transform + quant from the
    in-loop filter twins)."""
    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.intra import encode_keyframe

    frames = _frames10(2, seed=5)
    q = 150
    pk, rk = encode_keyframe(frames[0], qindex=q, bit_depth=10)
    pp, rp = TI.encode_pframe_tpu(frames[1], rk, qindex=q,
                                  order_hint=1, bit_depth=10)
    d = dav1d.decode_all([pk, pp])
    for j in range(3):
        assert np.array_equal(np.asarray(d[1].planes[j], np.int32),
                              rp[j]), j


def test_context_10bit_gop():
    """Context-level 10-bit 4:2:0: reference keyframe + TPU-batched
    anchor/B frames (reordered default), decoded cleanly on both
    oracles with the right display count."""
    from rav1e_tpu.api import Config

    frames = _frames10(6, seed=33)
    cfg = Config(width=96, height=64, speed=6, quantizer=130,
                 bit_depth=10)
    ctx = cfg.new_context()
    for f in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts.append(p.data if hasattr(p, "data") else p)
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    assert len(d) == len(frames) and len(a) == len(frames)
    for i in range(len(frames)):
        for j in range(3):
            assert np.array_equal(np.asarray(d[i].planes[j], np.int32),
                                  np.asarray(a[i][j], np.int32)), (i, j)
    # 10-bit payload sanity: decoded values exceed 8-bit range
    assert max(int(np.asarray(d[i].planes[0]).max())
               for i in range(len(d))) > 255
