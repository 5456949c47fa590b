"""M1 conformance: intra keyframes decode bit-exact on dav1d + libaom.

This is the reference's core test discipline (rav1e
src/test_encode_decode/): the decoder's output planes must equal the
encoder's own reconstruction exactly.
"""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d
from rav1e_tpu.core.constants import BlockSize
from rav1e_tpu.pipeline.intra import encode_keyframe


def synth_frame(w, h, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 17) + 40 * np.cos(yy / 11)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 23)).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 19)).clip(0, 255).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("w,h,q", [
    (64, 64, 80),      # single SB
    (96, 64, 80),      # partial SB column (derived partition bools)
    (64, 96, 80),      # partial SB row
    (352, 288, 100),   # BASELINE config 1 dims
    (352, 288, 20),    # high quality (q-ctx 0 coefficient CDFs)
    (352, 288, 220),   # low quality
])
def test_intra_bit_exact(w, h, q):
    planes = synth_frame(w, h)
    pkt, rec = encode_keyframe(planes, qindex=q)
    fr = dav1d.decode_all([pkt])
    assert len(fr) == 1
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i]), f"dav1d plane {i}"
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i]), f"aom plane {i}"


def test_psnr_reasonable():
    planes = synth_frame(352, 288)
    pkt, rec = encode_keyframe(planes, qindex=80)
    mse = np.mean((rec[0].astype(float) - planes[0]) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 33, psnr


def test_directional_modes_bit_exact():
    """Diagonal content drives the 6 directional modes + angle deltas
    through the 13-mode RDO; streams must stay bit-exact on both
    decoders (spec 7.11.2.4 zones, no edge filter)."""
    rng = np.random.default_rng(5)
    w, h = 160, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin((xx + yy) / 9) + 40 * np.cos((2 * xx - yy) / 17)
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    u = (120 + 40 * np.sin((xx[::2, ::2] - yy[::2, ::2]) / 13)
         ).clip(0, 255).astype(np.uint8)
    v = (135 + 30 * np.cos((xx[::2, ::2] + 2 * yy[::2, ::2]) / 11)
         ).clip(0, 255).astype(np.uint8)
    from rav1e_tpu.core.constants import PredictionMode
    from rav1e_tpu.entropy import tile as tilemod
    seen = set()
    orig = tilemod.TileWriter.write_intra_block

    def spy(self, r, c, bsize, d):
        seen.add(d.y_mode)
        return orig(self, r, c, bsize, d)

    tilemod.TileWriter.write_intra_block = spy
    try:
        pkt, rec = encode_keyframe([y, u, v], qindex=100)
    finally:
        tilemod.TileWriter.write_intra_block = orig
    assert any(m in seen for m in (
        PredictionMode.D45_PRED, PredictionMode.D67_PRED,
        PredictionMode.D135_PRED, PredictionMode.D113_PRED,
        PredictionMode.D157_PRED, PredictionMode.D203_PRED)), seen
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i]), f"dav1d plane {i}"
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i]), f"aom plane {i}"


@pytest.mark.parametrize("tc,tr", [(1, 0), (1, 1), (2, 1)])
def test_multi_tile_bit_exact(tc, tr):
    """Uniform multi-tile frames (spec 5.9.15): each tile's entropy and
    prediction state is independent; both oracles must match."""
    planes = synth_frame(352, 288)
    pkt, rec = encode_keyframe(planes, qindex=100,
                               tile_cols_log2=tc, tile_rows_log2=tr)
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i])
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i])


def test_multi_tile_inter_bit_exact():
    from rav1e_tpu.pipeline.inter import encode_pframe
    planes = synth_frame(352, 288)
    kp, kr = encode_keyframe(planes, qindex=100,
                             tile_cols_log2=1, tile_rows_log2=1)
    y1 = (kr[0] + 25).clip(0, 255).astype(np.uint8)
    pf = [y1, kr[1].astype(np.uint8), kr[2].astype(np.uint8)]
    pkt, rec = encode_pframe(pf, kr, qindex=100, order_hint=1,
                             tile_cols_log2=1, tile_rows_log2=1)
    d = dav1d.decode_all([kp, pkt])
    for i in range(3):
        assert np.array_equal(d[1].planes[i], rec[i])
    out = aom.decode_all([kp, pkt])
    for i in range(3):
        assert np.array_equal(out[1][i], rec[i])


def test_cfl_bit_exact():
    """Chroma-from-luma: correlated chroma drives CFL through RDO; the
    alpha search + joint-sign/index coding must stay bit-exact."""
    from rav1e_tpu.core.constants import PredictionMode
    from rav1e_tpu.entropy import tile as tilemod
    rng = np.random.default_rng(7)
    w, h = 128, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = 60 * np.sin((xx + yy) / 9) + 30 * np.cos(xx / 7)
    y = (128 + base + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
    u = (120 + 0.6 * base[::2, ::2]).clip(0, 255).astype(np.uint8)
    v = (130 - 0.4 * base[::2, ::2]).clip(0, 255).astype(np.uint8)
    seen = set()
    orig = tilemod.TileWriter.write_intra_block

    def spy(self, r, c, bsize, d):
        seen.add(d.uv_mode)
        return orig(self, r, c, bsize, d)

    tilemod.TileWriter.write_intra_block = spy
    try:
        pkt, rec = encode_keyframe([y, u, v], qindex=100)
    finally:
        tilemod.TileWriter.write_intra_block = orig
    assert PredictionMode.UV_CFL_PRED in seen
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i])
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i])


@pytest.mark.parametrize("bd,maxv", [(10, 1023), (12, 4095)])
def test_high_bitdepth_bit_exact(bd, maxv):
    """10/12-bit 4:2:0 KEY + P chain (profile 2 for 12-bit)."""
    from rav1e_tpu.pipeline.inter import encode_pframe
    rng = np.random.default_rng(7)
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    mid = (maxv + 1) // 2
    y = (mid + mid * 0.45 * np.sin((xx + yy) / 9)
         + rng.normal(0, maxv / 100, (h, w))).clip(0, maxv).astype(np.uint16)
    u = np.full((h // 2, w // 2), int(mid * 0.94), np.uint16)
    v = np.full((h // 2, w // 2), int(mid * 1.05), np.uint16)
    kp, kr = encode_keyframe([y, u, v], qindex=100, bit_depth=bd)
    pp, pr = encode_pframe([np.roll(y, 2, axis=1), u, v], kr, qindex=100,
                           order_hint=1, bit_depth=bd)
    d = dav1d.decode_all([kp, pp])
    for i, rec in enumerate([kr, pr]):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], rec[j]), (bd, i, j)
    a = aom.decode_all([kp, pp])
    for i, rec in enumerate([kr, pr]):
        for j in range(3):
            assert np.array_equal(a[i][j], rec[j]), (bd, i, j)


@pytest.mark.parametrize("cs", ["422", "444"])
def test_chroma_sampling_bit_exact(cs):
    """4:2:2 (profile 2, rect chroma TX w/ tall scan + ctx offsets) and
    4:4:4 (profile 1) keyframes, both oracles."""
    rng = np.random.default_rng(7)
    w, h = 128, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = 60 * np.sin((xx + yy) / 9) + 30 * np.cos(xx / 7)
    y = (128 + base + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    sx, sy = {"422": (1, 0), "444": (0, 0)}[cs]
    u = (120 + 0.5 * base[::1 << sy, ::1 << sx]
         + rng.normal(0, 3, (h >> sy, w >> sx))).clip(0, 255).astype(np.uint8)
    v = (130 - 0.4 * base[::1 << sy, ::1 << sx]).clip(0, 255).astype(np.uint8)
    for q in (80, 160):
        pkt, rec = encode_keyframe([y, u, v], qindex=q, chroma_sampling=cs)
        d = dav1d.decode_all([pkt])
        for j in range(3):
            assert np.array_equal(d[0].planes[j], rec[j]), (cs, q, j)
        a = aom.decode_all([pkt])
        for j in range(3):
            assert np.array_equal(a[0][j], rec[j]), (cs, q, j)


def test_film_grain_signaling():
    """Photon-noise film grain table in the headers: recon stays
    bit-exact pre-grain (dav1d apply_grain=0); libaom accepts and
    applies the grain."""
    from rav1e_tpu.entropy.obu import photon_noise_params
    rng = np.random.default_rng(7)
    w, h = 96, 64
    y = (128 + 40 * np.sin(np.arange(h * w).reshape(h, w) / 31)
         + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
    f = [y, np.full((h // 2, w // 2), 120, np.uint8),
         np.full((h // 2, w // 2), 135, np.uint8)]
    pkt, rec = encode_keyframe(f, qindex=100,
                               film_grain=photon_noise_params(1600))
    d = dav1d.decode_all([pkt])
    for j in range(3):
        assert np.array_equal(d[0].planes[j], rec[j]), j
    a = aom.decode_all([pkt])
    assert len(a) == 1
    # grain must actually perturb the libaom output
    assert not np.array_equal(a[0][0], rec[0])


def test_loop_restoration_wiener():
    """Wiener loop restoration: per-LRU taps (subexp-ref coded inside
    the tile), stripe-aligned unit extents ((y+8)//64), h-then-v
    filter with bias offsets. Both oracles bit-exact."""
    rng = np.random.default_rng(7)
    w, h = 160, 200
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin((xx + yy) / 9)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    f = [y, np.full((h // 2, w // 2), 120, np.uint8),
         np.full((h // 2, w // 2), 135, np.uint8)]
    pkt, rec = encode_keyframe(f, qindex=140, lr=True)
    d = dav1d.decode_all([pkt])
    for j in range(3):
        assert np.array_equal(d[0].planes[j], rec[j]), j
    a = aom.decode_all([pkt])
    for j in range(3):
        assert np.array_equal(a[0][j], rec[j]), j


def test_loop_restoration_sgrproj_forced(monkeypatch):
    """SGRPROJ bit-exactness across param sets (spec 7.17.3): the
    coded (xqd0, xqd1) weight pass 0 (r=2) and the SOURCE, with the
    r=1 pass taking the 128-complement; per-stripe processing with
    reads clamped to stripe +-2 rows; A/B grids extended one
    row/column beyond the unit. Both oracles."""
    for force, w, h in [("S,9,31,32", 64, 64),      # both passes, stripes
                        ("S,3,-5,70", 160, 200),    # multi-unit
                        ("S,12,0,-20", 64, 64),     # r=1 only, negative w1
                        ("S,14,-40,0", 96, 64)]:    # r=2 only
        monkeypatch.setenv("RAV1E_TPU_LR_FORCE", force)
        rng = np.random.default_rng(7)
        yy, xx = np.mgrid[0:h, 0:w]
        y = (120 + 60 * np.sin((xx + yy) / 9)
             + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
        f = [y, np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 135, np.uint8)]
        pkt, rec = encode_keyframe(f, qindex=140, lr=True)
        d = dav1d.decode_all([pkt])
        a = aom.decode_all([pkt])
        for j in range(3):
            assert np.array_equal(d[0].planes[j], rec[j]), (force, j)
            assert np.array_equal(a[0][j], rec[j]), (force, j)


def test_loop_restoration_selection():
    """Natural per-LRU RDO over Wiener + SGRPROJ candidate sets
    (SWITCHABLE signaling) stays conformant at several sizes/q."""
    for (w, h, q, seed) in [(64, 64, 140, 3), (128, 96, 180, 11)]:
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        y = (120 + 60 * np.sin((xx + yy) / 9)
             + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
        f = [y, np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 135, np.uint8)]
        pkt, rec = encode_keyframe(f, qindex=q, lr=True)
        d = dav1d.decode_all([pkt])
        a = aom.decode_all([pkt])
        for j in range(3):
            assert np.array_equal(d[0].planes[j], rec[j]), (w, h, q, j)
            assert np.array_equal(a[0][j], rec[j]), (w, h, q, j)


def test_segmentation_aq():
    """Variance AQ via segmentation: 4 active segments with
    SEG_LVL_ALT_Q deltas, per-block segment_id (spatial prediction +
    neg-interleaved seg-tree symbol, skip blocks take the prediction),
    per-segment quantizers. KEY + P, both oracles."""
    from rav1e_tpu.pipeline.inter import encode_pframe

    rng = np.random.default_rng(3)
    w, h, q = 128, 96, 110
    xx = np.mgrid[0:h, 0:w][1]
    y0 = (100 + xx * 40 // w).astype(np.uint8)
    band = slice(h // 3, 2 * (h // 3))
    y0[band] = rng.integers(30, 220, (y0[band].shape[0], w)).astype(np.uint8)
    f0 = [y0, np.full((h // 2, w // 2), 120, np.uint8),
          np.full((h // 2, w // 2), 135, np.uint8)]
    kp, kr = encode_keyframe(f0, qindex=q, aq=True)
    y1 = np.roll(y0, 3, axis=1)
    pp, pr = encode_pframe([y1, f0[1], f0[2]], kr, qindex=q,
                           order_hint=1, aq=True)
    pkts = [kp, pp]
    d = dav1d.decode_all(pkts)
    a = aom.decode_all(pkts)
    for i, rec in enumerate([kr, pr]):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], rec[j]), (i, j)
            assert np.array_equal(a[i][j], rec[j]), (i, j)


def test_intra_edge_filter_upsampling():
    """Intra edge filter + 2x edge upsampling (seq bit on): smooth-
    neighbor filter type, strength tables, corner filter and the
    half-pel edge (orig at even offsets, (-1,9,9,-1)/16 between).
    Small blocks with angle deltas maximize upsampled predictions."""
    rng = np.random.default_rng(11)
    w, h = 96, 104  # partial bottom row -> 8x8 blocks (blkWh 16)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 70 * np.sin((2 * xx + yy) / 5)
         + rng.normal(0, 9, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 40 * np.sin((xx[::2, ::2] + 2 * yy[::2, ::2]) / 7)) \
        .clip(0, 255).astype(np.uint8)
    v = (128 - 35 * np.cos(xx[::2, ::2] / 5)).clip(0, 255).astype(np.uint8)
    for q in (60, 120):
        pkt, rec = encode_keyframe([y, u, v], qindex=q,
                                   block=BlockSize.B16X16)
        d = dav1d.decode_all([pkt])
        a = aom.decode_all([pkt])
        for j in range(3):
            assert np.array_equal(d[0].planes[j], rec[j]), (q, j)
            assert np.array_equal(a[0][j], rec[j]), (q, j)


def test_rect_partition_rdo_bit_exact():
    """HORZ/VERT partition RDO (rav1e src/rdo.rs rdo_partition_decision
    with non_square_partition): 32x32 SB quadrants choose NONE / HORZ
    (two 32x16) / VERT (two 16x32) / SPLIT by sse + lambda*bits with
    real cost tables. Banded content must elicit rect shapes, and the
    streams (rect mode info, TX_32X16/TX_16X32 TUs, partition ctx
    updates) must decode bit-exact on both decoders."""
    rng = np.random.default_rng(7)
    w, h = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 60 * np.sin(yy / 4) * (yy < 64)
         + 60 * np.sin(xx / 4) * (yy >= 64)
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 9)).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 7)).clip(0, 255).astype(np.uint8)
    from rav1e_tpu.core.constants import PartitionType
    from rav1e_tpu.pipeline import intra as I
    shapes = set()
    orig = I._encode_keyframe_tile

    def spy(*a, **k):
        out = orig(*a, **k)
        for (r, c, bs), p in out[1].items():
            if bs == int(BlockSize.B32X32):
                shapes.add(PartitionType(p))
        return out

    I._encode_keyframe_tile = spy
    try:
        for q in (80, 140):
            pkt, rec = encode_keyframe([y, u, v], qindex=q,
                                       part_rdo=True)
            d = dav1d.decode_all([pkt])
            a = aom.decode_all([pkt])
            for j in range(3):
                assert np.array_equal(d[0].planes[j], rec[j]), (q, j)
                assert np.array_equal(a[0][j], rec[j]), (q, j)
    finally:
        I._encode_keyframe_tile = orig
    assert PartitionType.HORZ in shapes or PartitionType.VERT in shapes, \
        shapes
