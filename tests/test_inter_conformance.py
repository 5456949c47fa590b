"""Inter (P-frame) conformance: every bitstream must decode bit-exactly
to the encoder's reconstruction on BOTH oracles (dav1d + libaom).

Reference parity: rav1e src/api/internal.rs low-latency IPPP GOPs;
the M3a slice codes every block as GLOBALMV (zero MV) or skip.
"""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.pipeline.inter import encode_gop, encode_pframe
from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

def _mk(w, h, t, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = ((xx + yy + 5 * t) % 256).astype(np.float64)
    y[: h // 2] = 128
    y = (y + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
    u = ((xx[::2, ::2] + 3 * t) % 200 + 20).astype(np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    return [y, u, v]


def _check_gop(pkts, recs):
    dec = dav1d.decode_all(pkts)
    for i, rec in enumerate(recs):
        for j in range(3):
            assert np.array_equal(dec[i].planes[j], rec[j]), (i, j)
    deca = aom.decode_all(pkts)
    for i, rec in enumerate(recs):
        for j in range(3):
            assert np.array_equal(deca[i][j], rec[j]), (i, j)


@pytest.mark.parametrize("w,h,q,n", [
    (128, 128, 100, 3),
    (352, 288, 80, 3),
    (96, 96, 160, 3),
    (64, 192, 120, 3),
])
def test_gop_conformance(w, h, q, n):
    rng = np.random.default_rng(3)
    frames = [_mk(w, h, t, rng) for t in range(n)]
    pkts, recs = encode_gop(frames, qindex=q)
    _check_gop(pkts, recs)


def test_all_skip_pframe():
    """P frame identical to reference -> every block coded skip."""
    rng = np.random.default_rng(7)
    w, h = 96, 64
    y0 = (128 + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    u0 = np.full((h // 2, w // 2), 120, np.uint8)
    v0 = np.full((h // 2, w // 2), 135, np.uint8)
    kf_pkt, kf_rec = encode_keyframe_tpu([y0, u0, v0], qindex=100,
                                         speed=10, deblock=False)
    pf = [p.astype(np.uint8) for p in kf_rec]
    pkt, rec = encode_pframe(pf, kf_rec, qindex=100, order_hint=1)
    assert len(pkt) < 100  # all-skip stream is tiny
    _check_gop([kf_pkt, pkt], [kf_rec, rec])


def test_motion_gop_conformance():
    """Translating texture -> NEWMV with sub-pel MVs everywhere."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(11)
    w, h, n = 192, 128, 4
    tex = gaussian_filter(rng.normal(0, 40, (h + 100, w + 100)), 2.5)
    frames = []
    for t in range(n):
        oy, ox = int(30 + 2.5 * t), int(30 - 1.5 * t)
        y = (128 + tex[oy:oy + h, ox:ox + w]).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append([y, u, v])
    pkts, recs = encode_gop(frames, qindex=100)
    _check_gop(pkts, recs)
    # motion compensation should beat 35 dB easily on this content
    mse = np.mean((recs[-1][0].astype(float) - frames[-1][0]) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 35


def test_tpu_inter_pipeline_conformance():
    """Batched TPU P-frame pipeline (grouped-conv ME + batched MC)."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.tpu_inter import encode_gop_tpu
    rng = np.random.default_rng(11)
    w, h, n = 192, 128, 3
    tex = gaussian_filter(rng.normal(0, 40, (h + 100, w + 100)), 2.5)
    frames = []
    for t in range(n):
        oy, ox = int(30 + 2.5 * t), int(30 - 1.5 * t)
        y = (128 + tex[oy:oy + h, ox:ox + w]).clip(0, 255).astype(np.uint8)
        frames.append([y, np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 135, np.uint8)])
    pkts, recs = encode_gop_tpu(frames, qindex=100)
    _check_gop(pkts, recs)


def test_native_matches_python_packer():
    rng = np.random.default_rng(5)
    frames = [_mk(64, 64, t, rng) for t in range(2)]
    _, kf_rec = encode_keyframe_tpu(frames[0], qindex=100, speed=10,
                                    deblock=False)
    p_py, _ = encode_pframe(frames[1], kf_rec, qindex=100, order_hint=1,
                            use_native=False)
    p_nat, _ = encode_pframe(frames[1], kf_rec, qindex=100, order_hint=1,
                             use_native=True)
    assert p_py == p_nat


def test_bframe_gop_conformance():
    """Reordered GOP: KEY + non-shown backward ALT + B frames choosing
    LAST or ALTREF per block (single ref), displayed via
    show_existing_frame. Includes the spec extra-candidate search
    (different-ref neighbors with sign-bias MV flips)."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.inter import encode_gop_bframes
    rng = np.random.default_rng(11)
    w, h, n = 128, 96, 5
    tex = gaussian_filter(rng.normal(0, 40, (h + 100, w + 100)), 2.5)
    frames = []
    for t in range(n):
        oy, ox = int(30 + 2.2 * t), int(30 - 1.4 * t)
        y = (128 + tex[oy:oy + h, ox:ox + w]).clip(0, 255).astype(np.uint8)
        frames.append([y, np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 135, np.uint8)])
    pkts, recs = encode_gop_bframes(frames, qindex=120)
    d = dav1d.decode_all(pkts)
    assert len(d) == n
    for i in range(n):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], recs[i][j]), (i, j)
    a = aom.decode_all(pkts)
    assert len(a) == n
    for i in range(n):
        for j in range(3):
            assert np.array_equal(a[i][j], recs[i][j]), (i, j)


def test_compound_prediction():
    """Compound (two-reference) prediction: BIDIR (LAST, ALTREF) pairs
    with COMPOUND_AVERAGE MC, NEW_NEWMV (+NEAREST/NEAR aliasing) and
    GLOBAL_GLOBALMV, the compound ref-MV stack (pair matching, the
    per-list extra-candidate search), and the compound mode context
    (close/total/newmv cells brute-forced against both oracles). Mixed
    single/compound neighborhoods exercise the comp_inter bit,
    comp_ref_type and comp_ref/comp_bwdref count contexts."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.inter import encode_gop_bframes

    def mkframes(W, H, N=5, seed=5):
        base = gaussian_filter(
            np.random.default_rng(seed).normal(128, 60, (H + 64, W + 64)),
            2).clip(0, 255)
        frames = []
        for t in range(N):
            y = base[16 + t:16 + t + H,
                     8 + 2 * t:8 + 2 * t + W].astype(np.uint8)
            yn = np.clip(y.astype(int)
                         + np.random.default_rng(t).normal(0, 3, (H, W)),
                         0, 255).astype(np.uint8)
            frames.append([yn, np.full((H // 2, W // 2), 120, np.uint8),
                           np.full((H // 2, W // 2), 135, np.uint8)])
        return frames

    for (W, H, seed) in [(192, 128, 5), (96, 96, 17), (160, 96, 11)]:
        frames = mkframes(W, H, seed=seed)
        pkts, recs = encode_gop_bframes(frames, qindex=100)
        d = dav1d.decode_all(pkts)
        a = aom.decode_all(pkts)
        for i in range(len(recs)):
            for j in range(3):
                assert np.array_equal(d[i].planes[j], recs[i][j]), \
                    (W, H, i, j)
                assert np.array_equal(a[i][j], recs[i][j]), (W, H, i, j)


def test_split_blocks_with_deblock():
    """PARTITION_SPLIT blocks carry TX16/TX8 edges at 16-px offsets
    that the decoder deblocks; the encoder's in-loop deblock must use
    the same split-gated edge grid (regression: a fixed 32-px grid
    passed only when the level search picked 0)."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter, rotate
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu
    from rav1e_tpu.pipeline import tpu_inter as TI
    rng = np.random.default_rng(4)
    h, w = 96, 128
    base = gaussian_filter(rng.normal(0, 60, (h * 2, w * 2)), 1.0)

    def fr(ang):
        r = rotate(base, ang, reshape=False, order=1)
        y = (128 + r[h // 2:h // 2 + h, w // 2:w // 2 + w]
             ).clip(0, 255).astype(np.uint8)
        return [y, np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 135, np.uint8)]

    f0, f1 = fr(0), fr(3)
    q = 80
    pk, rk = encode_keyframe_tpu(f0, qindex=q, speed=7,
                                 cdef=(0, 0, 0, 0, 4))
    pp, rp = TI.encode_pframe_tpu(f1, rk, qindex=q, cdef=(0, 0, 0, 0, 4))
    d = dav1d.decode_all([pk, pp])
    a = aom.decode_all([pk, pp])
    for j in range(3):
        assert np.array_equal(d[1].planes[j], rp[j]), j
        assert np.array_equal(a[1][j], rp[j]), j


def test_tpu_bframe_compound():
    """TPU B-frame path: both references searched on-device, each block
    picking single-fwd / single-bwd / COMPOUND_AVERAGE by RD. A fade
    (frame = average of the two anchors + noise) forces compound to
    win on most blocks; the chain (KEY, non-shown anchor P, B,
    show_existing) must decode bit-exactly on both oracles.

    Reference parity: rav1e rdo_mode_decision inter loop over ref sets
    (src/rdo.rs) + reordered InterConfig (src/api/internal.rs)."""
    from rav1e_tpu.entropy.obu import show_existing_packet
    from rav1e_tpu.pipeline import tpu_inter as TI
    rng = np.random.default_rng(3)
    H, W = 96, 128
    tex = rng.integers(40, 220, (H, W)).astype(np.float64)

    def frame(y):
        return [y.clip(0, 255).astype(np.uint8),
                np.full((H // 2, W // 2), 120, np.uint8),
                np.full((H // 2, W // 2), 136, np.uint8)]

    f0 = frame(tex)
    f2 = frame(255 - tex)
    fmid = frame((tex + (255 - tex)) / 2 + rng.normal(0, 2, (H, W)))
    kdata, krec = encode_keyframe_tpu(f0, qindex=110)
    krec = [np.asarray(p, np.int32) for p in krec]
    adata, arec = TI.encode_pframe_tpu(
        f2, krec, qindex=110, order_hint=2, refresh_flags=0x02,
        ref_slot=0, show_frame=False)
    arec = [np.asarray(p, np.int32) for p in arec]
    bdata, brec = TI.encode_bframe_tpu(
        f1 := fmid, krec, arec, qindex=114, order_hint=1,
        slot_fwd=0, slot_bwd=1, ref_hints=(0, 2))
    brec = [np.asarray(p, np.int32) for p in brec]
    pkts = [kdata, adata, bdata, show_existing_packet(1)]
    order = [krec, brec, arec]
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    assert len(d) == 3 and len(a) == 3
    for i in range(3):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], order[i][j]), (i, j)
            assert np.array_equal(a[i][j], order[i][j]), (i, j)
    # the fade B frame must actually use compound averaging: its recon
    # should be far closer to the source than either single reference
    err_b = np.abs(brec[0] - f1[0].astype(np.int32)).mean()
    err_f = np.abs(krec[0] - f1[0].astype(np.int32)).mean()
    assert err_b < err_f / 4, (err_b, err_f)


def test_inter_frame_loop_restoration():
    """P frames restore too (rav1e enables LRF on all frame types):
    KF with enable_restoration=1, then a P frame whose luma AND
    chroma planes carry Wiener/SGR units — both oracles must decode
    bit-exactly to the LR-filtered recon."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.intra import encode_keyframe

    rng = np.random.default_rng(31)
    H, W = 96, 128
    base = gaussian_filter(rng.normal(0, 60, (H + 8, W + 8)), 1.2)
    cb = gaussian_filter(rng.normal(0, 40, (H // 2 + 8, W // 2 + 8)), 1.0)

    def frame(t):
        y = (128 + base[t:t + H, 2 * t:2 * t + W]).clip(0, 255)
        u = (128 + cb[t:t + H // 2, t:t + W // 2]).clip(0, 255)
        v = (128 - cb[t:t + H // 2, t:t + W // 2]).clip(0, 255)
        return [y.astype(np.uint8), u.astype(np.uint8),
                v.astype(np.uint8)]

    f0, f1 = frame(0), frame(3)
    # coarse q so restoration has distortion to repair
    kpkt, krec = encode_keyframe(f0, qindex=160, lr=True)
    ppkt, prec = encode_pframe(f1, krec, qindex=160, order_hint=1,
                               lr=True)
    d = dav1d.decode_all([kpkt, ppkt])
    a = aom.decode_all([kpkt, ppkt])
    for i, rec in enumerate([krec, prec]):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], rec[j]), (i, j)
            assert np.array_equal(a[i][j], rec[j]), (i, j)


def test_per_sb_cdef_index():
    """CDEF with the 8-entry strength set signaled in the frame
    header (cdef_bits=3) and a per-64x64-SB literal index chosen by
    SSE argmin — the native packer and the python writer both code
    read_cdef, and the stream is bit-exact on both oracles."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu
    from rav1e_tpu.pipeline.tpu_inter import encode_pframe_tpu

    rng = np.random.default_rng(44)
    H, W = 96, 160          # not 64-aligned: edge SBs cover 1 or 2
    tex = gaussian_filter(rng.normal(0, 50, (H + 32, W + 32)), 1.5)

    def fr(t):
        y = (128 + tex[t * 2:t * 2 + H, 3 * t:3 * t + W]).clip(0, 255)
        return [y.astype(np.uint8),
                np.full((H // 2, W // 2), 118, np.uint8),
                np.full((H // 2, W // 2), 130, np.uint8)]

    cd = (3, 1, 2, 1, 3)
    pk, rk = encode_keyframe_tpu(fr(0), qindex=140, speed=6, cdef=cd)
    ref = [np.asarray(p).astype(np.int32) for p in rk]
    recs = [ref]
    pkts = [pk]
    for t, us in ((1, True), (2, False)):
        p, r = encode_pframe_tpu(fr(t), recs[-1], qindex=140,
                                 order_hint=t, cdef=cd, use_split=us)
        recs.append([np.asarray(x).astype(np.int32) for x in r])
        pkts.append(p)
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i in range(3):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], recs[i][j]), (i, j)
            assert np.array_equal(a[i][j], recs[i][j]), (i, j)


def test_intra_in_inter_blocks():
    """Intra (DC) blocks inside inter frames (rav1e rdo_mode_decision
    intra set): blocks with no temporal match flip to intra under the
    batched isolation rule, the writer codes is_inter=0 + intra
    syntax, streams stay bit-exact on both oracles and never larger
    than inter-only."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu
    from rav1e_tpu.pipeline.tpu_inter import encode_pframe_tpu

    w, h = 160, 96
    rng = np.random.default_rng(11)
    tex = gaussian_filter(rng.normal(0, 48, (h + 64, w + 64)), 2.0)
    f0 = [(128 + tex[:h, :w]).clip(0, 255).astype(np.uint8),
          np.full((h // 2, w // 2), 118, np.uint8),
          np.full((h // 2, w // 2), 130, np.uint8)]
    y1 = f0[0].astype(np.float64).copy()
    yy, xx = np.mgrid[0:64, 0:96]
    y1[16:80, 32:128] = 40 + xx * 1.5 + yy * 0.8   # brand-new region
    f1 = [y1.clip(0, 255).astype(np.uint8), f0[1], f0[2]]
    cd = (3, 1, 2, 1, 3)
    pk, rk = encode_keyframe_tpu(f0, qindex=140, speed=6, cdef=cd)
    rk = [np.asarray(p).astype(np.int32) for p in rk]
    sizes = {}
    for flag in (False, True):
        p, r = encode_pframe_tpu(f1, rk, qindex=140, order_hint=1,
                                 cdef=cd, intra_rdo=flag)
        r = [np.asarray(x).astype(np.int32) for x in r]
        d = dav1d.decode_all([pk, p])
        a = aom.decode_all([pk, p])
        for j in range(3):
            assert np.array_equal(d[1].planes[j], r[j]), (flag, j)
            assert np.array_equal(a[1][j], r[j]), (flag, j)
        sizes[flag] = len(p)
    assert sizes[True] <= sizes[False], sizes


def test_b64_partition_merge():
    """PARTITION_NONE at 64x64 with TX_64X64 luma + TX_32X32 chroma
    (rav1e rdo_partition_decision top level): merged SBs drop their
    internal 32-edge deblocking, the idct64 recon is spec-exact, and
    streams decode bit-exactly on both oracles."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu
    from rav1e_tpu.pipeline.tpu_inter import encode_pframe_tpu

    w, h = 192, 128
    rng = np.random.default_rng(11)
    tex = gaussian_filter(rng.normal(0, 48, (h + 128, w + 128)), 3.0)

    def fr(t):
        oy, ox = 40 + 2 * t, 40 + 3 * t
        y = (128 + tex[oy:oy + h, ox:ox + w]).clip(0, 255)
        u = (120 + tex[oy // 2:oy // 2 + h // 2,
                       ox // 2:ox // 2 + w // 2] * 0.5).clip(0, 255)
        v = (135 - tex[oy // 2:oy // 2 + h // 2,
                       ox // 2:ox // 2 + w // 2] * 0.5).clip(0, 255)
        return [y.astype(np.uint8), u.astype(np.uint8),
                v.astype(np.uint8)]

    cd = (3, 1, 2, 1, 3)
    pk, rk = encode_keyframe_tpu(fr(0), qindex=150, speed=6, cdef=cd)
    recs = [[np.asarray(p).astype(np.int32) for p in rk]]
    pkts = [pk]
    for t in (1, 2, 3):
        p, r = encode_pframe_tpu(fr(t), recs[-1], qindex=150,
                                 order_hint=t, cdef=cd, b64_rdo=True,
                                 intra_rdo=True)
        recs.append([np.asarray(x).astype(np.int32) for x in r])
        pkts.append(p)
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i in range(len(pkts)):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], recs[i][j]), (i, j)
            assert np.array_equal(a[i][j], recs[i][j]), (i, j)


def test_tpu_path_loop_restoration():
    """LR through the TPU pipelines (rav1e enables LRF on every frame
    type): KF + non-shown anchor P + B chain, each searching Wiener/
    SGR units on the post-CDEF recon and coding them in the tile —
    the LR'd recons must decode bit-exactly on both oracles, and LR
    must actually engage (the KF recon differs from an lr=False run).

    Reference parity: rav1e src/lrf.rs RestorationState::lrf_filter_
    frame driven from encode_tile_group (src/encoder.rs)."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.entropy.obu import show_existing_packet
    from rav1e_tpu.pipeline import tpu_inter as TI

    rng = np.random.default_rng(57)
    H, W = 96, 128
    base = gaussian_filter(rng.normal(0, 60, (H + 16, W + 16)), 1.2)
    cb = gaussian_filter(rng.normal(0, 40, (H // 2 + 16, W // 2 + 16)),
                         1.0)

    def frame(t):
        y = (128 + base[t:t + H, 2 * t:2 * t + W]).clip(0, 255)
        u = (128 + cb[t:t + H // 2, t:t + W // 2]).clip(0, 255)
        v = (128 - cb[t:t + H // 2, t:t + W // 2]).clip(0, 255)
        return [y.astype(np.uint8), u.astype(np.uint8),
                v.astype(np.uint8)]

    q = 160                 # coarse q so restoration has work to do
    f0, f1, f2 = frame(0), frame(2), frame(4)
    kpkt, krec = encode_keyframe_tpu(f0, qindex=q, speed=6, lr=True)
    _, krec_nolr = encode_keyframe_tpu(f0, qindex=q, speed=6)
    assert any(not np.array_equal(a, b)
               for a, b in zip(krec, krec_nolr)), "LR never engaged"
    krec = [np.asarray(p, np.int32) for p in krec]
    apkt, arec = TI.encode_pframe_tpu(
        f2, krec, qindex=q, order_hint=2, refresh_flags=0x02,
        ref_slot=0, show_frame=False, lr=True)
    arec = [np.asarray(p, np.int32) for p in arec]
    bpkt, brec = TI.encode_bframe_tpu(
        f1, krec, arec, qindex=q, order_hint=1,
        slot_fwd=0, slot_bwd=1, ref_hints=(0, 2), lr=True)
    brec = [np.asarray(p, np.int32) for p in brec]
    pkts = [kpkt, apkt, bpkt, show_existing_packet(1)]
    order = [krec, brec, arec]
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    assert len(d) == 3 and len(a) == 3
    for i in range(3):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], order[i][j]), (i, j)
            assert np.array_equal(a[i][j], order[i][j]), (i, j)


def test_context_lr_sequence_reordered():
    """End-to-end LR sequence through Context at an LR speed (<=3)
    with reordering ON: every frame of the GOP (KEY, anchors, B
    levels) signals lr_params against the keyframe's
    enable_restoration=1 sequence header, all through the TPU-batched
    pipelines. The stream must decode cleanly on both oracles with
    the right display count."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.api import Config

    rng = np.random.default_rng(58)
    H, W = 64, 96
    base = gaussian_filter(rng.normal(0, 55, (H + 32, W + 32)), 1.1)

    def frame(t):
        y = (128 + base[t:t + H, 2 * t:2 * t + W]).clip(0, 255)
        return [y.astype(np.uint8),
                np.full((H // 2, W // 2), 120, np.uint8),
                np.full((H // 2, W // 2), 133, np.uint8)]

    cfg = Config(width=W, height=H, speed=3, quantizer=150)
    ctx = cfg.new_context()
    N = 6
    for t in range(N):
        ctx.send_frame(frame(t))
    ctx.flush()
    pkts = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts.append(p.data if hasattr(p, "data") else p)
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    assert len(d) == N and len(a) == N
    for i in range(N):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], a[i][j]), (i, j)


def test_split8_partition_conformance():
    """16->8 PARTITION_SPLIT on the TPU P path (speed <= 6 toolset):
    busy local detail at moderate q forces sub-splits whose TX_8X8 /
    TX_4X4 edges the decoder deblocks at 8-px spacing and whose CDEF
    skip gate is per-8x8 — the encoder's in-loop twins must match
    both oracles bit-exactly (spec 7.14.5 MIN-adjacent-TX filter
    lengths; rav1e partition_range min 8x8)."""
    from scipy.ndimage import gaussian_filter, rotate

    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    rng = np.random.default_rng(11)
    h, w = 96, 128
    base = gaussian_filter(rng.normal(0, 70, (h * 2, w * 2)), 0.8)
    # sparse bright blobs: one busy 8x8 inside an otherwise cheap 16
    blobs = np.zeros((h * 2, w * 2))
    for _ in range(40):
        r, c = rng.integers(8, h * 2 - 8), rng.integers(8, w * 2 - 8)
        blobs[r:r + 4, c:c + 4] = rng.normal(0, 120, (4, 4))

    def fr(ang):
        r = rotate(base + blobs, ang, reshape=False, order=1)
        y = (128 + r[h // 2:h // 2 + h, w // 2:w // 2 + w]
             ).clip(0, 255).astype(np.uint8)
        u = (120 + r[::2, ::2][:h // 2, :w // 2] / 3).clip(0, 255)
        return [y, u.astype(np.uint8),
                np.full((h // 2, w // 2), 135, np.uint8)]

    f0 = fr(0)
    q = 90
    pk, rk = encode_keyframe_tpu(f0, qindex=q, speed=7,
                                 cdef=(2, 1, 1, 0, 4))
    pkts, recs = [pk], [rk]
    seen = []
    orig_pack = TI._pack_pframe

    def spy(*args, **kw):
        s16 = kw.get("split16")
        seen.append(0 if s16 is None else int(np.sum(s16)))
        return orig_pack(*args, **kw)

    TI._pack_pframe = spy
    try:
        for t, ang in enumerate((2, 5), start=1):
            f1 = fr(ang)
            pp, rp = TI.encode_pframe_tpu(
                f1, recs[-1], qindex=q, order_hint=t,
                cdef=(2, 1, 1, 0, 4), use_split8=True)
            pkts.append(pp)
            recs.append(rp)
    finally:
        TI._pack_pframe = orig_pack
    assert sum(seen) > 0, f"no 16->8 splits chosen ({seen})"
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i in range(len(pkts)):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], recs[i][j]), (i, j)
            assert np.array_equal(a[i][j], recs[i][j]), (i, j)


def test_bframe_split_conformance():
    """Two-ref (B) frames with the cheap 32->16 split: children are
    the parent's ref/MV or single-LAST GLOBALMV-zero. Busy content
    with an occluding mover forces splits at object boundaries; both
    oracles must match the recon bit-exactly."""
    from scipy.ndimage import gaussian_filter

    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    rng = np.random.default_rng(31)
    h, w = 96, 128
    base = gaussian_filter(rng.normal(0, 60, (h, w)), 1.1)
    obj = gaussian_filter(rng.normal(0, 80, (24, 24)), 1.5)

    def fr(t):
        y = (128 + base).copy()
        oy, ox = 16 + 6 * t, 20 + 11 * t
        y[oy:oy + 24, ox:ox + 24] = 128 + obj
        return [y.clip(0, 255).astype(np.uint8),
                np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 133, np.uint8)]

    q = 100
    pk, rk = encode_keyframe_tpu(fr(0), qindex=q, speed=7,
                                 cdef=(2, 1, 1, 0, 4))
    # anchor (shown, refreshes slot 1) then a B frame between KF and
    # anchor (decode_all returns shown frames in coding order)
    pa, ra = TI.encode_pframe_tpu(fr(2), rk, qindex=q, order_hint=2,
                                  cdef=(2, 1, 1, 0, 4),
                                  refresh_flags=0x02)
    seen = []
    orig = TI._pack_bframe

    def spy(*a, **k):
        s = k.get("split")
        seen.append(0 if s is None else int(np.sum(s)))
        return orig(*a, **k)

    TI._pack_bframe = spy
    try:
        pb, rb = TI.encode_bframe_tpu(
            fr(1), rk, ra, qindex=q, order_hint=1,
            cdef=(2, 1, 1, 0, 4), slot_fwd=0, slot_bwd=1,
            ref_hints=(0, 2), use_split=True)
    finally:
        TI._pack_bframe = orig
    assert sum(seen) > 0, f"no B-frame splits chosen ({seen})"
    pkts = [pk, pa, pb]
    recs = [rk, ra, rb]
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i in range(3):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], recs[i][j]), (i, j)
            assert np.array_equal(a[i][j], recs[i][j]), (i, j)
