"""Native C++ packer vs python TileWriter byte-identity.

Mirrors rav1e's check_asm discipline (SURVEY §5.2): the fast native
path must produce byte-identical bitstreams to the reference writer
over randomized decision grids, including mixed 32/16 partitions.
"""

import numpy as np
import pytest

from rav1e_tpu.core.constants import BlockSize, PartitionType, PredictionMode


def _random_grid(rng, nby, nbx, q):
    B = nby * nbx
    split = rng.random(B) < 0.5
    mv8 = (rng.integers(-16, 17, (B, 2)) * 8).astype(np.int32)
    mv8[rng.random(B) < 0.3] = 0
    mv16 = (rng.integers(-16, 17, (B, 4, 2)) * 8).astype(np.int32)
    mv16[rng.random((B, 4)) < 0.3] = 0
    skip32 = (rng.random(B) < 0.4).astype(np.uint8)
    skip16 = (rng.random((B, 4)) < 0.4).astype(np.uint8)

    def lv_plane(n, density=0.1):
        lv = np.zeros((B, n, n), np.int16)
        m = rng.random((B, n, n)) < density
        lv[m] = rng.integers(-40, 41, m.sum())
        return lv

    lv_y, lv_u, lv_v = lv_plane(32), lv_plane(16), lv_plane(16)
    for b in range(B):
        if split[b]:
            for qd, (dr, dc) in enumerate(
                    ((0, 0), (0, 16), (16, 0), (16, 16))):
                if skip16[b, qd]:
                    lv_y[b, dr:dr + 16, dc:dc + 16] = 0
                    lv_u[b, dr // 2:dr // 2 + 8, dc // 2:dc // 2 + 8] = 0
                    lv_v[b, dr // 2:dr // 2 + 8, dc // 2:dc // 2 + 8] = 0
        elif skip32[b]:
            lv_y[b] = 0
            lv_u[b] = 0
            lv_v[b] = 0
    return split, mv8, skip32, mv16, skip16, lv_y, lv_u, lv_v


def _python_pack(mi_rows, mi_cols, q, grid):
    from rav1e_tpu.entropy.tile import BlockDecision, TileWriter
    split, mv8, skip32, mv16, skip16, lv_y, lv_u, lv_v = grid
    nbx = mi_cols // 8
    tw = TileWriter(mi_rows, mi_cols, q, inter_frame=True)
    partitions, blocks = {}, {}

    def mk(mv, sk, yl, ul, vl):
        mv = (int(mv[0]), int(mv[1]))
        mode = (PredictionMode.GLOBALMV if mv == (0, 0)
                else PredictionMode.NEWMV)
        d = BlockDecision(y_mode=mode, uv_mode=PredictionMode.DC_PRED,
                          skip=bool(sk), mv=mv)
        if not d.skip:
            d.coeffs = {0: yl, 1: ul, 2: vl}
        return d

    for b in range(mv8.shape[0]):
        by, bx = (b // nbx) * 32, (b % nbx) * 32
        r, c = by >> 2, bx >> 2
        partitions[(r, c, int(BlockSize.B64X64))] = PartitionType.SPLIT
        if split[b]:
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.SPLIT
            for qd, (dr, dc) in enumerate(
                    ((0, 0), (0, 4), (4, 0), (4, 4))):
                py, px = dr * 4, dc * 4
                cy, cx = dr * 2, dc * 2
                partitions[(r + dr, c + dc, int(BlockSize.B16X16))] = \
                    PartitionType.NONE
                blocks[(r + dr, c + dc)] = mk(
                    mv16[b, qd], skip16[b, qd],
                    lv_y[b][py:py + 16, px:px + 16],
                    lv_u[b][cy:cy + 8, cx:cx + 8],
                    lv_v[b][cy:cy + 8, cx:cx + 8])
        else:
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.NONE
            blocks[(r, c)] = mk(mv8[b], skip32[b], lv_y[b], lv_u[b],
                                lv_v[b])
    return tw.write_tile(partitions, blocks)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_inter_tile2_byte_identity(seed):
    from rav1e_tpu.entropy.native import NativeTileWriter
    rng = np.random.default_rng(seed)
    nby, nbx = int(rng.integers(2, 5)), int(rng.integers(2, 5))
    mi_rows, mi_cols = nby * 8, nbx * 8
    q = int(rng.choice([60, 100, 160]))
    grid = _random_grid(rng, nby, nbx, q)
    tw = NativeTileWriter(mi_rows, mi_cols, q, inter_frame=True)
    native = tw.write_inter_tile_fast2(*grid)
    ref = _python_pack(mi_rows, mi_cols, q, grid)
    assert native == ref
