"""4:2:2 / 4:4:4 INTER coding (VERDICT r4 #8: non-420 input must not
silently encode all-intra).

Reference parity: rav1e encodes all chroma samplings natively
(SURVEY §1 capabilities). Here the reference (numpy) pipelines carry
422/444 inter: chroma MC with per-axis subsampling, rect chroma TX
(TX_16X32 at 422), TileWriter ss-aware contexts. Conformance grade:
decoder output == encoder recon on BOTH oracles.
"""

import numpy as np
import pytest

from rav1e_tpu.api.context import Config
from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.pipeline.inter import encode_bframe, encode_pframe
from rav1e_tpu.pipeline.intra import encode_keyframe


def _planes(cs, W=128, H=96, t=0, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 200, (H, W)).astype(np.uint8)
    cw = W // (2 if cs in ("420", "422") else 1)
    ch = H // (2 if cs == "420" else 1)
    cb = rng.integers(90, 160, (ch, cw)).astype(np.uint8)
    return [np.roll(base, t * 3, axis=1),
            np.roll(cb, t * 2, axis=1),
            np.roll(cb[::-1], t * 2, axis=1).copy()]


@pytest.mark.parametrize("cs", ["422", "444"])
def test_pframe_conformance(cs):
    f0 = _planes(cs, t=0)
    f1 = _planes(cs, t=1)
    kpkt, krec = encode_keyframe(f0, qindex=110, chroma_sampling=cs)
    ppkt, prec = encode_pframe(f1, krec, qindex=110,
                               chroma_sampling=cs)
    d = dav1d.decode_all([kpkt, ppkt])
    a = aom.decode_all([kpkt, ppkt])
    for j in range(3):
        assert np.array_equal(d[1].planes[j], prec[j]), (cs, j)
        assert np.array_equal(a[1][j], prec[j]), (cs, j)
    # the P frame must actually predict (smaller than the key)
    assert len(ppkt) < len(kpkt) * 0.8


@pytest.mark.parametrize("cs", ["422", "444"])
def test_bframe_conformance(cs):
    f0 = _planes(cs, t=0)
    f1 = _planes(cs, t=1)
    f2 = _planes(cs, t=2)
    kpkt, krec = encode_keyframe(f0, qindex=110, chroma_sampling=cs)
    apkt, arec = encode_pframe(f2, krec, qindex=110, order_hint=2,
                               chroma_sampling=cs,
                               refresh_flags=0x02, ref_slot=0,
                               show_frame=False)
    bpkt, brec = encode_bframe(f1, krec, arec, qindex=110,
                               order_hint=1, chroma_sampling=cs,
                               slot_fwd=0, slot_bwd=1,
                               ref_hints=(0, 2))
    from rav1e_tpu.entropy.obu import show_existing_packet
    pkts = [kpkt, apkt, bpkt, show_existing_packet(1)]
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    assert len(d) == 3
    for j in range(3):
        assert np.array_equal(d[1].planes[j], brec[j]), (cs, j)
        assert np.array_equal(a[1][j], brec[j]), (cs, j)


def test_context_non420_codes_inter():
    """Context with 422 input produces INTER frames (not all-intra)
    that decode identically on both oracles."""
    frames = [_planes("422", t=t) for t in range(5)]
    ctx = Config(width=128, height=96, quantizer=110,
                 chroma_sampling="422", low_latency=True).new_context()
    for f in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts.append(p)
    assert [p.frame_type for p in pkts].count("INTER") >= 3
    d = dav1d.decode_all([p.data for p in pkts])
    a = aom.decode_all([p.data for p in pkts])
    for i in range(len(frames)):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], a[i][j]), (i, j)
