"""Native C++ packer vs python TileWriter byte-identity.

Mirrors rav1e's check_asm discipline (SURVEY §5.2): the fast native
path must produce byte-identical bitstreams to the reference writer
over randomized decision grids, including mixed 32/16 partitions.
"""

import numpy as np
import pytest

from rav1e_tpu.core.constants import BlockSize, PartitionType, PredictionMode


def _random_grid(rng, nby, nbx, q, depth8=False):
    B = nby * nbx
    split = rng.random(B) < 0.5
    mv8 = (rng.integers(-16, 17, (B, 2)) * 8).astype(np.int32)
    mv8[rng.random(B) < 0.3] = 0
    mv16 = (rng.integers(-16, 17, (B, 4, 2)) * 8).astype(np.int32)
    mv16[rng.random((B, 4)) < 0.3] = 0
    skip32 = (rng.random(B) < 0.4).astype(np.uint8)
    skip16 = (rng.random((B, 4)) < 0.4).astype(np.uint8)
    split16 = (split[:, None] & (rng.random((B, 4)) < 0.5)
               if depth8 else np.zeros((B, 4), bool))
    mvq8 = (rng.integers(-16, 17, (B, 4, 4, 2)) * 8).astype(np.int32)
    mvq8[rng.random((B, 4, 4)) < 0.3] = 0
    skip8 = (rng.random((B, 4, 4)) < 0.4).astype(np.uint8)

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
                if split16[b, qd]:
                    for s, (sr, sc) in enumerate(
                            ((0, 0), (0, 8), (8, 0), (8, 8))):
                        if skip8[b, qd, s]:
                            py, px = dr + sr, dc + sc
                            cy, cx = (dr + sr) // 2, (dc + sc) // 2
                            lv_y[b, py:py + 8, px:px + 8] = 0
                            lv_u[b, cy:cy + 4, cx:cx + 4] = 0
                            lv_v[b, cy:cy + 4, cx:cx + 4] = 0
                elif skip16[b, qd]:
                    lv_y[b, dr:dr + 16, dc:dc + 16] = 0
                    lv_u[b, dr // 2:dr // 2 + 8, dc // 2:dc // 2 + 8] = 0
                    lv_v[b, dr // 2:dr // 2 + 8, dc // 2:dc // 2 + 8] = 0
        elif skip32[b]:
            lv_y[b] = 0
            lv_u[b] = 0
            lv_v[b] = 0
    if depth8:
        return (split, mv8, skip32, mv16, skip16, lv_y, lv_u, lv_v,
                split16, mvq8, skip8)
    return split, mv8, skip32, mv16, skip16, lv_y, lv_u, lv_v


def _python_pack(mi_rows, mi_cols, q, grid):
    from rav1e_tpu.entropy.tile import BlockDecision, TileWriter
    split, mv8, skip32, mv16, skip16, lv_y, lv_u, lv_v = grid[:8]
    split16 = mvq8 = skip8 = None
    if len(grid) > 8:
        split16, mvq8, skip8 = grid[8:]
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
                if split16 is not None and split16[b, qd]:
                    partitions[(r + dr, c + dc,
                                int(BlockSize.B16X16))] = \
                        PartitionType.SPLIT
                    for s, (sr, sc) in enumerate(
                            ((0, 0), (0, 2), (2, 0), (2, 2))):
                        sy, sx = py + sr * 4, px + sc * 4
                        scy, scx = cy + sr * 2, cx + sc * 2
                        partitions[(r + dr + sr, c + dc + sc,
                                    int(BlockSize.B8X8))] = \
                            PartitionType.NONE
                        blocks[(r + dr + sr, c + dc + sc)] = mk(
                            mvq8[b, qd, s], skip8[b, qd, s],
                            lv_y[b][sy:sy + 8, sx:sx + 8],
                            lv_u[b][scy:scy + 4, scx:scx + 4],
                            lv_v[b][scy:scy + 4, scx:scx + 4])
                    continue
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


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_inter_tile2_depth8_byte_identity(seed):
    """Mixed 32/16/8 partitions (split16 + 8x8 blocks with TX_8X8
    luma / TX_4X4 chroma) pack byte-identically to the python
    writer's recursive write_sb_tree."""
    from rav1e_tpu.entropy.native import NativeTileWriter
    rng = np.random.default_rng(seed)
    nby, nbx = int(rng.integers(2, 5)), int(rng.integers(2, 5))
    mi_rows, mi_cols = nby * 8, nbx * 8
    q = int(rng.choice([60, 100, 160]))
    grid = _random_grid(rng, nby, nbx, q, depth8=True)
    tw = NativeTileWriter(mi_rows, mi_cols, q, inter_frame=True)
    native = tw.write_inter_tile_fast2(
        *grid[:8], split16=grid[8], mvq8=grid[9], skip8=grid[10])
    ref = _python_pack(mi_rows, mi_cols, q, grid)
    assert native == ref


def test_native_intra_tile_byte_identity():
    """packer_intra_tile (one-call C++ KF packer) must emit byte-
    identical tiles to the python TileWriter over the same
    decisions, including splits, CfL, directional modes and the
    per-SB CDEF index literal."""
    from rav1e_tpu.core.constants import (BlockSize, PartitionType,
                                          PredictionMode, TxType)
    from rav1e_tpu.entropy.native import NativeTileWriter
    from rav1e_tpu.entropy.tile import BlockDecision, TileWriter

    rng = np.random.default_rng(9)
    bh, bw = 3, 5                   # 96x160: partial bottom/right SBs
    mi_rows, mi_cols = bh * 8, bw * 8
    B = bh * bw
    split = rng.random(B) < 0.4
    ymodes = rng.integers(0, 13, (B, 5)).astype(np.uint8)
    uvmodes = rng.integers(0, 13, (B, 5)).astype(np.uint8)
    cfl = np.zeros((B, 2), np.int8)
    for b in range(B):
        if not split[b] and rng.random() < 0.4:
            uvmodes[b, 0] = int(PredictionMode.UV_CFL_PRED)
            cfl[b] = rng.integers(-16, 17, 2)
            if cfl[b, 0] == 0 and cfl[b, 1] == 0:
                cfl[b, 0] = 3
    lv_y = rng.integers(-6, 7, (B, 32, 32)).astype(np.int16)
    lv_u = rng.integers(-4, 5, (B, 16, 16)).astype(np.int16)
    lv_v = rng.integers(-4, 5, (B, 16, 16)).astype(np.int16)
    # sparsify + some all-skip blocks
    lv_y[np.abs(lv_y) < 5] = 0
    lv_u[np.abs(lv_u) < 3] = 0
    lv_v[np.abs(lv_v) < 3] = 0
    for b in range(0, B, 4):
        lv_y[b] = 0
        lv_u[b] = 0
        lv_v[b] = 0
    nsb = ((mi_rows + 15) // 16) * ((mi_cols + 15) // 16)
    cdef_map = rng.integers(0, 8, nsb).astype(np.uint8)

    ntw = NativeTileWriter(mi_rows, mi_cols, 120)
    fast = ntw.write_intra_tile_fast(split, ymodes, uvmodes, cfl,
                                     lv_y, lv_u, lv_v,
                                     cdef_idx=cdef_map, cdef_bits=3)

    tw = TileWriter(mi_rows, mi_cols, 120)
    tw.cdef_bits = 3
    tw.cdef_idx_map = cdef_map.reshape(-1, (mi_cols + 15) // 16)
    partitions, blocks = {}, {}
    for b in range(B):
        r, c = (b // bw) * 8, (b % bw) * 8
        if split[b]:
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.SPLIT
            for q, (dr, dc) in enumerate(
                    ((0, 0), (0, 4), (4, 0), (4, 4))):
                py, px, cy, cx = dr * 4, dc * 4, dr * 2, dc * 2
                yl = lv_y[b][py:py + 16, px:px + 16]
                ul = lv_u[b][cy:cy + 8, cx:cx + 8]
                vl = lv_v[b][cy:cy + 8, cx:cx + 8]
                d = BlockDecision(
                    y_mode=PredictionMode(int(ymodes[b, 1 + q])),
                    uv_mode=PredictionMode(int(uvmodes[b, 1 + q])),
                    skip=not (yl.any() or ul.any() or vl.any()))
                if not d.skip:
                    d.coeffs = {0: yl, 1: ul, 2: vl,
                                "y_tx_type": TxType.DCT_DCT}
                blocks[(r + dr, c + dc)] = d
                partitions[(r + dr, c + dc, int(BlockSize.B16X16))] = \
                    PartitionType.NONE
        else:
            d = BlockDecision(
                y_mode=PredictionMode(int(ymodes[b, 0])),
                uv_mode=PredictionMode(int(uvmodes[b, 0])),
                skip=not (lv_y[b].any() or lv_u[b].any()
                          or lv_v[b].any()))
            if d.uv_mode == PredictionMode.UV_CFL_PRED:
                d.cfl_alpha_idx = (int(cfl[b, 0]), int(cfl[b, 1]))
            if not d.skip:
                d.coeffs = {0: lv_y[b], 1: lv_u[b], 2: lv_v[b],
                            "y_tx_type": TxType.DCT_DCT}
            blocks[(r, c)] = d
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.NONE
    for r in range(0, mi_rows, 16):
        for c in range(0, mi_cols, 16):
            partitions[(r, c, int(BlockSize.B64X64))] = \
                PartitionType.SPLIT
    ref = tw.write_tile(partitions, blocks)
    assert fast == ref, (len(fast), len(ref))
