"""AV1 constants: block sizes, transform sizes/types, prediction modes.

Reference parity: rav1e src/partition.rs (BlockSize, PartitionType,
RefType), src/transform/mod.rs (TxSize, TxType), src/predict.rs
(PredictionMode). Values follow the AV1 spec enumerations so they can be
written directly as syntax elements.
"""

from __future__ import annotations

from enum import IntEnum

MI_SIZE_LOG2 = 2  # 4x4 mode-info units
MI_SIZE = 4
SB_SIZE_LOG2 = 6  # rav1e uses 64x64 superblocks only (SURVEY §1)
SB_SIZE = 64


class FrameType(IntEnum):
    KEY = 0
    INTER = 1
    INTRA_ONLY = 2
    SWITCH = 3


class ObuType(IntEnum):
    SEQUENCE_HEADER = 1
    TEMPORAL_DELIMITER = 2
    FRAME_HEADER = 3
    TILE_GROUP = 4
    METADATA = 5
    FRAME = 6
    REDUNDANT_FRAME_HEADER = 7
    PADDING = 15


class PartitionType(IntEnum):
    NONE = 0
    HORZ = 1
    VERT = 2
    SPLIT = 3
    HORZ_A = 4
    HORZ_B = 5
    VERT_A = 6
    VERT_B = 7
    HORZ_4 = 8
    VERT_4 = 9


class BlockSize(IntEnum):
    """AV1 spec BLOCK_* enum order."""

    B4X4 = 0
    B4X8 = 1
    B8X4 = 2
    B8X8 = 3
    B8X16 = 4
    B16X8 = 5
    B16X16 = 6
    B16X32 = 7
    B32X16 = 8
    B32X32 = 9
    B32X64 = 10
    B64X32 = 11
    B64X64 = 12
    B64X128 = 13
    B128X64 = 14
    B128X128 = 15
    B4X16 = 16
    B16X4 = 17
    B8X32 = 18
    B32X8 = 19
    B16X64 = 20
    B64X16 = 21

    @property
    def width(self) -> int:
        return _BLOCK_WH[self][0]

    @property
    def height(self) -> int:
        return _BLOCK_WH[self][1]

    @property
    def width_mi(self) -> int:
        return self.width >> MI_SIZE_LOG2

    @property
    def height_mi(self) -> int:
        return self.height >> MI_SIZE_LOG2

    @property
    def width_log2(self) -> int:
        return self.width.bit_length() - 1

    @property
    def height_log2(self) -> int:
        return self.height.bit_length() - 1


_BLOCK_WH = {
    BlockSize.B4X4: (4, 4), BlockSize.B4X8: (4, 8), BlockSize.B8X4: (8, 4),
    BlockSize.B8X8: (8, 8), BlockSize.B8X16: (8, 16), BlockSize.B16X8: (16, 8),
    BlockSize.B16X16: (16, 16), BlockSize.B16X32: (16, 32),
    BlockSize.B32X16: (32, 16), BlockSize.B32X32: (32, 32),
    BlockSize.B32X64: (32, 64), BlockSize.B64X32: (64, 32),
    BlockSize.B64X64: (64, 64), BlockSize.B64X128: (64, 128),
    BlockSize.B128X64: (128, 64), BlockSize.B128X128: (128, 128),
    BlockSize.B4X16: (4, 16), BlockSize.B16X4: (16, 4),
    BlockSize.B8X32: (8, 32), BlockSize.B32X8: (32, 8),
    BlockSize.B16X64: (16, 64), BlockSize.B64X16: (64, 16),
}

# Partition subsize table: SUBSIZE[partition][bsize_of_square] (spec
# Partition_Subsize). Only square sizes can be partitioned.
SQUARE_SIZES = [BlockSize.B4X4, BlockSize.B8X8, BlockSize.B16X16,
                BlockSize.B32X32, BlockSize.B64X64, BlockSize.B128X128]


def subsize(part: PartitionType, bsize: BlockSize) -> BlockSize | None:
    """Spec Partition_Subsize for the partitions rav1e emits."""
    idx = SQUARE_SIZES.index(bsize)
    if part == PartitionType.NONE:
        return bsize
    if part == PartitionType.SPLIT:
        return SQUARE_SIZES[idx - 1]
    if part == PartitionType.HORZ:
        return {BlockSize.B8X8: BlockSize.B8X4,
                BlockSize.B16X16: BlockSize.B16X8,
                BlockSize.B32X32: BlockSize.B32X16,
                BlockSize.B64X64: BlockSize.B64X32,
                BlockSize.B128X128: BlockSize.B128X64}[bsize]
    if part == PartitionType.VERT:
        return {BlockSize.B8X8: BlockSize.B4X8,
                BlockSize.B16X16: BlockSize.B8X16,
                BlockSize.B32X32: BlockSize.B16X32,
                BlockSize.B64X64: BlockSize.B32X64,
                BlockSize.B128X128: BlockSize.B64X128}[bsize]
    raise ValueError(part)


class TxSize(IntEnum):
    """AV1 spec TX_* enum order."""

    TX_4X4 = 0
    TX_8X8 = 1
    TX_16X16 = 2
    TX_32X32 = 3
    TX_64X64 = 4
    TX_4X8 = 5
    TX_8X4 = 6
    TX_8X16 = 7
    TX_16X8 = 8
    TX_16X32 = 9
    TX_32X16 = 10
    TX_32X64 = 11
    TX_64X32 = 12
    TX_4X16 = 13
    TX_16X4 = 14
    TX_8X32 = 15
    TX_32X8 = 16
    TX_16X64 = 17
    TX_64X16 = 18

    @property
    def width(self) -> int:
        return _TX_WH[self][0]

    @property
    def height(self) -> int:
        return _TX_WH[self][1]

    @property
    def width_log2(self) -> int:
        return self.width.bit_length() - 1

    @property
    def height_log2(self) -> int:
        return self.height.bit_length() - 1

    @property
    def sqr_up(self) -> "TxSize":
        """Smallest square TX size >= this (spec Tx_Size_Sqr_Up)."""
        return _TX_SQR_UP[self]

    @property
    def sqr(self) -> "TxSize":
        """Largest square TX size <= this (spec Tx_Size_Sqr)."""
        return _TX_SQR[self]


_TX_WH = {
    TxSize.TX_4X4: (4, 4), TxSize.TX_8X8: (8, 8), TxSize.TX_16X16: (16, 16),
    TxSize.TX_32X32: (32, 32), TxSize.TX_64X64: (64, 64),
    TxSize.TX_4X8: (4, 8), TxSize.TX_8X4: (8, 4), TxSize.TX_8X16: (8, 16),
    TxSize.TX_16X8: (16, 8), TxSize.TX_16X32: (16, 32),
    TxSize.TX_32X16: (32, 16), TxSize.TX_32X64: (32, 64),
    TxSize.TX_64X32: (64, 32), TxSize.TX_4X16: (4, 16),
    TxSize.TX_16X4: (16, 4), TxSize.TX_8X32: (8, 32),
    TxSize.TX_32X8: (32, 8), TxSize.TX_16X64: (16, 64),
    TxSize.TX_64X16: (64, 16),
}

_SQ = [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32,
       TxSize.TX_64X64]
_TX_SQR_UP = {t: _SQ[max(t.width, t.height).bit_length() - 3] for t in TxSize}
_TX_SQR = {t: _SQ[min(t.width, t.height).bit_length() - 3] for t in TxSize}

# Largest tx size for a block (spec Max_Tx_Size_Rect), for the sizes we
# emit (square and 2:1 blocks up to 64).
MAX_TX_SIZE_RECT = {
    BlockSize.B4X4: TxSize.TX_4X4, BlockSize.B4X8: TxSize.TX_4X8,
    BlockSize.B8X4: TxSize.TX_8X4, BlockSize.B8X8: TxSize.TX_8X8,
    BlockSize.B8X16: TxSize.TX_8X16, BlockSize.B16X8: TxSize.TX_16X8,
    BlockSize.B16X16: TxSize.TX_16X16, BlockSize.B16X32: TxSize.TX_16X32,
    BlockSize.B32X16: TxSize.TX_32X16, BlockSize.B32X32: TxSize.TX_32X32,
    BlockSize.B32X64: TxSize.TX_32X64, BlockSize.B64X32: TxSize.TX_64X32,
    BlockSize.B64X64: TxSize.TX_64X64,
    BlockSize.B4X16: TxSize.TX_4X16, BlockSize.B16X4: TxSize.TX_16X4,
    BlockSize.B8X32: TxSize.TX_8X32, BlockSize.B32X8: TxSize.TX_32X8,
    BlockSize.B16X64: TxSize.TX_16X64, BlockSize.B64X16: TxSize.TX_64X16,
}


class TxType(IntEnum):
    DCT_DCT = 0
    ADST_DCT = 1
    DCT_ADST = 2
    ADST_ADST = 3
    FLIPADST_DCT = 4
    DCT_FLIPADST = 5
    FLIPADST_FLIPADST = 6
    ADST_FLIPADST = 7
    FLIPADST_ADST = 8
    IDTX = 9
    V_DCT = 10
    H_DCT = 11
    V_ADST = 12
    H_ADST = 13
    V_FLIPADST = 14
    H_FLIPADST = 15


class PredictionMode(IntEnum):
    """Intra modes (spec order); inter modes appended (spec values)."""

    DC_PRED = 0
    V_PRED = 1
    H_PRED = 2
    D45_PRED = 3
    D135_PRED = 4
    D113_PRED = 5
    D157_PRED = 6
    D203_PRED = 7
    D67_PRED = 8
    SMOOTH_PRED = 9
    SMOOTH_V_PRED = 10
    SMOOTH_H_PRED = 11
    PAETH_PRED = 12
    UV_CFL_PRED = 13
    # inter
    NEARESTMV = 14
    NEARMV = 15
    GLOBALMV = 16
    NEWMV = 17
    NEAREST_NEARESTMV = 18
    NEAR_NEARMV = 19
    NEAREST_NEWMV = 20
    NEW_NEARESTMV = 21
    NEAR_NEWMV = 22
    NEW_NEARMV = 23
    GLOBAL_GLOBALMV = 24
    NEW_NEWMV = 25


INTRA_MODES = 13  # DC..PAETH
UV_INTRA_MODES_CFL = 14

# spec Intra_Mode_Context: mode -> context class (for kf_y_mode ctx)
INTRA_MODE_CONTEXT = [0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0]

# Directional modes' base angles (spec): mode -> angle in degrees
ANGLE_BASE = {
    PredictionMode.V_PRED: 90, PredictionMode.H_PRED: 180,
    PredictionMode.D45_PRED: 45, PredictionMode.D135_PRED: 135,
    PredictionMode.D113_PRED: 113, PredictionMode.D157_PRED: 157,
    PredictionMode.D203_PRED: 203, PredictionMode.D67_PRED: 67,
}
MAX_ANGLE_DELTA = 3
ANGLE_STEP = 3


def mi_size_wide(bsize: BlockSize) -> int:
    return bsize.width_mi


def mi_size_high(bsize: BlockSize) -> int:
    return bsize.height_mi
