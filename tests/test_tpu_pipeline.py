"""TPU wavefront pipeline + native packer tests (virtual CPU devices).

- wavefront encode must be bit-exact vs both decoder oracles
- NativeTileWriter must be byte-identical to the Python TileWriter
- CLI y4m -> IVF round trip decodes
"""

import numpy as np
import pytest

from rav1e_tpu.conform import aom, dav1d


def synth(w, h, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 17) + 40 * np.cos(yy / 11)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 23)).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 19)).clip(0, 255).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("speed", [6, 10])
def test_tpu_wavefront_conformance(speed):
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    planes = synth(128, 96)
    pkt, rec = encode_keyframe_tpu(planes, qindex=100, speed=speed)
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i]), f"dav1d plane {i}"
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i]), f"aom plane {i}"


@pytest.mark.parametrize("speed", [6, 10])
def test_tpu_wavefront_aq_conformance(speed):
    """Variance AQ on the TPU keyframe path: per-32-block segment q,
    segmentation signaled (spec 5.9.14) — bit-exact on both oracles."""
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    rng = np.random.default_rng(11)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    # strongly mixed activity: flat left half, noisy right half
    y = (90 + 60 * np.sin(xx / 29)).astype(np.float64)
    y[:, w // 2:] += rng.normal(0, 40, (h, w // 2))
    planes = [y.clip(0, 255).astype(np.uint8),
              np.full((h // 2, w // 2), 120, np.uint8),
              (128 + 20 * np.cos(yy[::2, ::2] / 13)).clip(
                  0, 255).astype(np.uint8)]
    pkt, rec = encode_keyframe_tpu(planes, qindex=100, speed=speed,
                                   aq=True)
    fr = dav1d.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(fr[0].planes[i], rec[i]), f"dav1d plane {i}"
    out = aom.decode_all([pkt])
    for i in range(3):
        assert np.array_equal(out[0][i], rec[i]), f"aom plane {i}"


def test_native_packer_byte_identical():
    from rav1e_tpu.core.constants import (
        BlockSize, PartitionType, TxType, subsize)
    from rav1e_tpu.entropy.native import NativeTileWriter
    from rav1e_tpu.entropy.tile import BlockDecision, TileWriter

    mi_rows, mi_cols = 40, 56

    def build(cls):
        tw = cls(mi_rows, mi_cols, 100)
        partitions, blocks = {}, {}

        def plan(r, c, b):
            if r >= mi_rows or c >= mi_cols:
                return
            half = b.width_mi // 2
            inside = (r + b.height_mi <= mi_rows
                      and c + b.width_mi <= mi_cols)
            if inside and b.width_mi <= 8:
                partitions[(r, c, int(b))] = PartitionType.NONE
                rng = np.random.default_rng(r * 997 + c)
                yl = (rng.integers(-20, 21, (32, 32))
                      * (rng.random((32, 32)) < 0.2)).astype(np.int32)
                ul = (rng.integers(-4, 5, (16, 16))
                      * (rng.random((16, 16)) < 0.2)).astype(np.int32)
                vl = np.zeros((16, 16), np.int32)
                d = BlockDecision(skip=False)
                if not yl.any() and not ul.any() and not vl.any():
                    d.skip = True
                else:
                    d.coeffs = {0: yl, 1: ul, 2: vl,
                                "y_tx_type": TxType.DCT_DCT}
                blocks[(r, c)] = d
                return
            partitions[(r, c, int(b))] = PartitionType.SPLIT
            sub = subsize(PartitionType.SPLIT, b)
            for dr, dc in ((0, 0), (0, half), (half, 0), (half, half)):
                plan(r + dr, c + dc, sub)

        for r in range(0, mi_rows, 16):
            for c in range(0, mi_cols, 16):
                plan(r, c, BlockSize.B64X64)
        return tw.write_tile(partitions, blocks)

    assert build(TileWriter) == build(NativeTileWriter)


def test_cli_roundtrip(tmp_path):
    from rav1e_tpu.cli.ivf import read_ivf
    from rav1e_tpu.cli.main import main
    from rav1e_tpu.cli.y4m import write_y4m

    frames = [synth(96, 64, seed=i) for i in range(2)]
    src = tmp_path / "in.y4m"
    out = tmp_path / "out.ivf"
    write_y4m(src, frames)
    main([str(src), "-o", str(out), "--quantizer", "90"])
    pkts = [p for _, p in read_ivf(out)]
    dec = dav1d.decode_all(pkts)
    assert len(dec) == 2
    for d, f in zip(dec, frames):
        assert d.planes[0].shape == f[0].shape
        mse = np.mean((d.planes[0].astype(float) - f[0]) ** 2)
        assert 10 * np.log10(255 ** 2 / mse) > 30


def test_kf_tx_type_search():
    """Luma TX16 intra tx-type search (rav1e rdo_tx_size_type's type
    loop over INTRA_TX_SET2): ADST combos selected by RD on split
    quads, signaled via intra_ext_tx2, bit-exact on both oracles, and
    never costlier than DCT-only."""
    import numpy as np

    import rav1e_tpu.pipeline.tpu_intra as TI
    from rav1e_tpu.conform import aom, dav1d

    rng = np.random.default_rng(3)
    H, W = 96, 128
    y = np.zeros((H, W), np.float64)
    for r in range(0, H, 16):
        for c in range(0, W, 16):
            k = rng.integers(0, 4)
            yy, xx = np.mgrid[0:16, 0:16]
            pat = [xx * 8, yy * 8, (xx + yy) * 5,
                   np.abs(xx - yy) * 6][k]
            y[r:r + 16, c:c + 16] = 40 + pat + rng.normal(0, 4,
                                                          (16, 16))
    y = y.clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    v = np.full((H // 2, W // 2), 130, np.uint8)

    def run(tx_on):
        orig = TI.build_rd

        def patched(q, my_, muv, **kw):
            if not tx_on:
                kw["tx_search"] = False
            return orig(q, my_, muv, **kw)

        TI.build_rd = patched
        try:
            return TI.encode_keyframe_tpu([y, u, v], qindex=80,
                                          speed=6, deblock=False)
        finally:
            TI.build_rd = orig

    pk0, _ = run(False)
    pk1, rk1 = run(True)
    assert len(pk1) <= len(pk0), (len(pk1), len(pk0))
    d = dav1d.decode_all([pk1])
    a = aom.decode_all([pk1])
    for j in range(3):
        assert np.array_equal(d[0].planes[j], rk1[j]), ("dav1d", j)
        assert np.array_equal(a[0][j], rk1[j]), ("aom", j)
