"""Per-tile syntax writer: partition tree + mode info + (later) coeffs.

Reference parity: rav1e src/context/partition_unit.rs + block_unit.rs
(context derivation) and src/encoder.rs encode_partition/encode_block.
This is the serial "packing" half of the two-plane IR split (SURVEY
§7.0): the TPU search emits decision grids; this writer runs the exact
bitstream pass.

Context model:
- mode/skip tracked as per-MI numpy grids (tile-local; neighbors off
  the tile edge are unavailable).
- partition contexts as spec above/left bitmask arrays (above: per MI
  col for the tile; left: 16 entries, reset each SB row).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rav1e_tpu.core.constants import (
    INTRA_MODE_CONTEXT,
    MAX_TX_SIZE_RECT,
    BlockSize,
    PartitionType,
    PredictionMode,
    TxSize,
    TxType,
    subsize,
)
from rav1e_tpu.entropy import coeffs as coeffmod
from rav1e_tpu.entropy.cdf import TileCDFs
from rav1e_tpu.entropy.ec import ECEncoder

PROB_TOP = 1 << 15

# Wiener filter tap bounds (spec Wiener_Taps_*)
WIENER_TAPS_MID = (3, -7, 15)
WIENER_TAPS_MIN = (-5, -23, -17)
WIENER_TAPS_MAX = (10, 8, 46)
WIENER_TAPS_K = (1, 2, 3)


def _write_ns(ec, v: int, n: int):
    """ns(n) inside a tile: near-uniform code via equiprobable bools."""
    w = n.bit_length()
    m = (1 << w) - n
    if v < m:
        if w > 1:
            ec.encode_literal(v, w - 1)
    else:
        x = v + m
        ec.encode_literal(x >> 1, w - 1)
        ec.encode_literal(x & 1, 1)


def _write_subexp(ec, v: int, num_syms: int, k: int):
    """Inverse of spec decode_subexp (finite subexponential, base k)."""
    i = 0
    mk = 0
    while True:
        b2 = k + i - 1 if i else k
        a = 1 << b2
        if num_syms <= mk + 3 * a:
            _write_ns(ec, v - mk, num_syms - mk)
            return
        if v >= mk + a:
            ec.encode_literal(1, 1)
            i += 1
            mk += a
        else:
            ec.encode_literal(0, 1)
            ec.encode_literal(v - mk, b2)
            return


def _recenter(r: int, v: int) -> int:
    """libaom recenter_nonneg: even codes at/above the ref, odd below."""
    if v > (r << 1):
        return v
    if v >= r:
        return (v - r) << 1
    return ((r - v) << 1) - 1


def _write_unsigned_subexp_ref(ec, v: int, mx: int, k: int, r: int):
    if (r << 1) <= mx:
        _write_subexp(ec, _recenter(r, v), mx, k)
    else:
        _write_subexp(ec, _recenter(mx - 1 - r, mx - 1 - v), mx, k)


def _write_signed_subexp_ref(ec, v: int, low: int, high: int, k: int,
                             r: int):
    _write_unsigned_subexp_ref(ec, v - low, high - low, k, r - low)

# chroma (4:2:0) tx size for a luma block size (dims >> 1, capped 32)
_TX_BY_DIMS = {(t.width, t.height): t for t in TxSize}


def chroma_tx_size(bsize: BlockSize, ss_x: int = 1,
                   ss_y: int = 1) -> TxSize:
    cw = min(max(bsize.width >> ss_x, 4), 32)
    ch = min(max(bsize.height >> ss_y, 4), 32)
    # AV1 TX sizes reach 1:4 aspect (TX_4X16/TX_8X32/...), and the
    # spec's get_max_uv_txsize is Max_Tx_Size_Rect of the chroma-plane
    # bsize — e.g. a 4:2:2 B16X32 has an 8x32 chroma block coded with
    # one TX_8X32 (a 2:1 clamp here desynced dav1d on 422 rect
    # partitions)
    while cw > 4 * ch:
        cw >>= 1
    while ch > 4 * cw:
        ch >>= 1
    return _TX_BY_DIMS[(cw, ch)]


# tx set selection for intra (spec get_tx_set)
def intra_tx_set(tx: TxSize, reduced: bool) -> int:
    if _sqr_up_idx(tx) > 3:  # sqr_up > 32 -> DCT only
        return 0
    if _sqr_up_idx(tx) == 3:  # 32x32ish -> DCT only
        return 0
    if reduced:
        return 2
    return 2 if _sqr_up_idx(tx) == 2 else 1


def _sqr_up_idx(tx: TxSize) -> int:
    return [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16,
            TxSize.TX_32X32, TxSize.TX_64X64].index(tx.sqr_up)


# symbol index of tx_type within each intra set (spec Tx_Type_Intra_Inv)
INTRA_TX_SET1 = [TxType.IDTX, TxType.DCT_DCT, TxType.V_DCT, TxType.H_DCT,
                 TxType.ADST_ADST, TxType.ADST_DCT, TxType.DCT_ADST]
INTRA_TX_SET2 = [TxType.IDTX, TxType.DCT_DCT, TxType.ADST_ADST,
                 TxType.ADST_DCT, TxType.DCT_ADST]

# inter set symbol orders (spec Tx_Type_In_Set_Inter). Set 3 is oracle-
# verified ({IDTX, DCT}); sets 1/2 orders are provisional until non-DCT
# inter tx types land (only DCT is coded today).
INTER_TX_SET3 = [TxType.IDTX, TxType.DCT_DCT]
INTER_TX_SET2 = [TxType.IDTX, TxType.V_DCT, TxType.H_DCT, TxType.DCT_DCT,
                 TxType.ADST_ADST, TxType.ADST_DCT, TxType.DCT_ADST,
                 TxType.FLIPADST_FLIPADST, TxType.FLIPADST_DCT,
                 TxType.DCT_FLIPADST, TxType.ADST_FLIPADST,
                 TxType.FLIPADST_ADST]
INTER_TX_SET1 = [TxType.IDTX, TxType.V_DCT, TxType.H_DCT, TxType.V_ADST,
                 TxType.H_ADST, TxType.V_FLIPADST, TxType.H_FLIPADST,
                 TxType.DCT_DCT, TxType.ADST_ADST, TxType.ADST_DCT,
                 TxType.DCT_ADST, TxType.FLIPADST_FLIPADST,
                 TxType.FLIPADST_DCT, TxType.DCT_FLIPADST,
                 TxType.ADST_FLIPADST, TxType.FLIPADST_ADST]


def _sqr_idx(tx: TxSize) -> int:
    """EXT_TX_SIZES index by Tx_Size_Sqr (inter_ext_tx row index)."""
    return [TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16,
            TxSize.TX_32X32].index(tx.sqr)

# chroma tx type from uv prediction mode (spec Mode_To_Txfm)
MODE_TO_TXFM = {
    PredictionMode.DC_PRED: TxType.DCT_DCT,
    PredictionMode.V_PRED: TxType.ADST_DCT,
    PredictionMode.H_PRED: TxType.DCT_ADST,
    PredictionMode.D45_PRED: TxType.DCT_DCT,
    PredictionMode.D135_PRED: TxType.ADST_ADST,
    PredictionMode.D113_PRED: TxType.ADST_DCT,
    PredictionMode.D157_PRED: TxType.DCT_ADST,
    PredictionMode.D203_PRED: TxType.DCT_ADST,
    PredictionMode.D67_PRED: TxType.ADST_DCT,
    PredictionMode.SMOOTH_PRED: TxType.ADST_ADST,
    PredictionMode.SMOOTH_V_PRED: TxType.ADST_DCT,
    PredictionMode.SMOOTH_H_PRED: TxType.DCT_ADST,
    PredictionMode.PAETH_PRED: TxType.ADST_ADST,
    PredictionMode.UV_CFL_PRED: TxType.DCT_DCT,
}


def chroma_tx_type(uv_mode: PredictionMode, tx: TxSize, reduced: bool) -> TxType:
    tt = MODE_TO_TXFM[uv_mode]
    s = intra_tx_set(tx, reduced)
    allowed = (INTRA_TX_SET1, INTRA_TX_SET2)[s - 1] if s else [TxType.DCT_DCT]
    return tt if tt in allowed else TxType.DCT_DCT


@dataclass
class BlockDecision:
    """Everything the packer needs for one coded block."""

    y_mode: PredictionMode = PredictionMode.DC_PRED
    uv_mode: PredictionMode = PredictionMode.DC_PRED
    skip: bool = True
    angle_delta_y: int = 0
    angle_delta_uv: int = 0
    cfl_alpha_idx: int = 0  # joint alpha index when uv_mode == CFL
    cfl_alpha_sign: int = 0
    seg_id: int = 0         # segment id (coded when segmentation on)
    mv: tuple = (0, 0)      # (row, col) 1/8-pel, inter blocks only
    ref: int = 1            # spec ref enum (1 = LAST ... 7 = ALTREF)
    ref2: int = 0           # second ref for compound blocks (0 = NONE)
    mv2: tuple = (0, 0)
    # residual planes are attached by the coefficient milestone
    coeffs: dict = field(default_factory=dict)


class TileWriter:
    def __init__(self, mi_rows: int, mi_cols: int, base_q_idx: int,
                 frame_mi_rows: int | None = None,
                 frame_mi_cols: int | None = None,
                 reduced_tx_set: bool = True,
                 inter_frame: bool = False,
                 ss_x: int = 1, ss_y: int = 1,
                 ref_sign_bias: dict | None = None,
                 lr_data: dict | None = None,
                 reference_select: bool = False,
                 seg_alt_q: list | None = None,
                 force_integer_mv: bool = False):
        # tile == frame until the tiling milestone
        self.mi_rows = mi_rows
        self.mi_cols = mi_cols
        self.frame_mi_rows = frame_mi_rows or mi_rows
        self.frame_mi_cols = frame_mi_cols or mi_cols
        self.base_q_idx = base_q_idx
        self.reduced_tx_set = reduced_tx_set
        self.cdfs = TileCDFs(base_q_idx)
        self.ec = ECEncoder()
        self.above_part = np.zeros(mi_cols, np.uint8)
        self.left_part = np.zeros(16, np.uint8)
        self.skip_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        self.mode_grid = np.zeros((mi_rows, mi_cols), np.uint8)
        self.inter_frame = inter_frame
        self.reference_select = reference_select
        # force_integer_mv (S-frames / error-resilient splice points):
        # the fr symbols are implied 3 and hp 1 (spec read_mv_component)
        self.force_integer_mv = force_integer_mv
        # segmentation (SEG_LVL_ALT_Q only): SegIdPreSkip == 0
        self.seg_alt_q = seg_alt_q
        self.seg_enabled = bool(seg_alt_q) and any(
            v is not None for v in seg_alt_q)
        if self.seg_enabled:
            self.last_active_seg = max(
                i for i, v in enumerate(seg_alt_q) if v is not None)
            self.seg_grid = np.zeros((mi_rows, mi_cols), np.int8)
        if inter_frame:
            from rav1e_tpu.entropy.inter import InterCtx
            self.inter_ctx = InterCtx(mi_rows, mi_cols,
                                      ref_sign_bias=ref_sign_bias)
        # per-plane coefficient entropy contexts, one byte per 4-px unit
        self.ss_x, self.ss_y = ss_x, ss_y
        ccols = (mi_cols + ss_x) >> ss_x if ss_x else mi_cols
        crows = (mi_rows + ss_y) >> ss_y if ss_y else mi_rows
        self.above_coef = [np.zeros(mi_cols, np.uint8),
                           np.zeros(ccols, np.uint8),
                           np.zeros(ccols, np.uint8)]
        self.left_coef = [np.zeros(mi_rows, np.uint8),
                          np.zeros(crows, np.uint8),
                          np.zeros(crows, np.uint8)]
        # loop restoration: lr_data = {"types": [3], "units": {plane:
        # 2D list of None | ("W", vtaps3, htaps3)}}; per-plane running
        # reference taps for the subexp deltas
        self.lr_data = lr_data
        self.lr_ref = [[list(WIENER_TAPS_MID), list(WIENER_TAPS_MID)]
                       for _ in range(3)]
        self.lr_sgr_ref = [[-32, 31] for _ in range(3)]
        # per-SB CDEF index (spec read_cdef, 5.11.56): when the frame
        # header signals cdef_bits > 0, the first non-skip block of
        # each 64x64 unit codes a literal index into the strength set
        self.cdef_bits = 0
        self.cdef_idx_map = None        # [sb_r][sb_c] tile-local
        self._cdef_done = np.zeros(((mi_rows + 15) // 16,
                                    (mi_cols + 15) // 16), bool)

    def _write_cdef_idx(self, r: int, c: int, skip: bool):
        """read_cdef inverse (called after the post-skip segment id)."""
        if self.cdef_bits == 0 or skip:
            return
        sr, sc = r // 16, c // 16
        if self._cdef_done[sr, sc]:
            return
        self._cdef_done[sr, sc] = True
        self.ec.encode_literal(int(self.cdef_idx_map[sr][sc]),
                               self.cdef_bits)

    # ---- partition coding --------------------------------------------------

    def _partition_cdf(self, ctx: int, bsize: BlockSize):
        if bsize == BlockSize.B8X8:
            return self.cdfs.partition_8[ctx], 4
        if bsize == BlockSize.B16X16:
            return self.cdfs.partition_mid[0][ctx], 10
        if bsize == BlockSize.B32X32:
            return self.cdfs.partition_mid[1][ctx], 10
        if bsize == BlockSize.B64X64:
            return self.cdfs.partition_mid[2][ctx], 10
        raise ValueError(bsize)

    def _part_ctx(self, r: int, c: int, bsize: BlockSize) -> int:
        # context bit index = mi_width_log2 - 1 (dav1d: 4 - bl): the bit
        # is set only when the neighbor was partitioned SMALLER than
        # this block size (verified empirically vs dav1d + libaom).
        bit = bsize.width_mi.bit_length() - 2
        above = (int(self.above_part[c]) >> bit) & 1
        left = (int(self.left_part[r & 15]) >> bit) & 1
        return left * 2 + above

    def _update_part_ctx(self, r: int, c: int, sub: BlockSize,
                         bsize: BlockSize):
        bw, bh = bsize.width_mi, bsize.height_mi
        aval = 31 & ~((1 << (sub.width_mi.bit_length() - 1)) - 1)
        lval = 31 & ~((1 << (sub.height_mi.bit_length() - 1)) - 1)
        self.above_part[c: c + bw] = aval
        lo = r & 15
        self.left_part[lo: lo + bh] = lval

    @staticmethod
    def _elem_prob(icdf, k: int) -> int:
        prev = PROB_TOP if k == 0 else icdf[k - 1]
        return prev - icdf[k]

    def write_partition(self, r: int, c: int, bsize: BlockSize,
                        part: PartitionType):
        """Code the partition symbol for square block at MI (r, c)."""
        has_rows = r + bsize.height_mi // 2 < self.mi_rows
        has_cols = c + bsize.width_mi // 2 < self.mi_cols
        ctx = self._part_ctx(r, c, bsize)
        icdf, nsym = self._partition_cdf(ctx, bsize)
        if has_rows and has_cols:
            assert int(part) < nsym
            self.ec.encode_symbol(int(part), icdf)
        elif has_cols:
            # bottom half out of frame: HORZ or SPLIT. The split bool's
            # probability gathers the partitions with a VERTICAL split
            # edge (verified vs libaom partition_gather_vert_alike).
            assert part in (PartitionType.HORZ, PartitionType.SPLIT)
            p0 = PROB_TOP
            for k in (PartitionType.VERT, PartitionType.SPLIT,
                      PartitionType.HORZ_A, PartitionType.VERT_A,
                      PartitionType.VERT_B, PartitionType.VERT_4):
                if int(k) < nsym:
                    p0 -= self._elem_prob(icdf, int(k))
            derived = [PROB_TOP - p0, 0, 0]
            self.ec.encode_symbol(
                1 if part == PartitionType.SPLIT else 0, derived, adapt=False)
        elif has_rows:
            # right half out of frame: VERT or SPLIT (HORZ-alike gather)
            assert part in (PartitionType.VERT, PartitionType.SPLIT)
            p0 = PROB_TOP
            for k in (PartitionType.HORZ, PartitionType.SPLIT,
                      PartitionType.HORZ_A, PartitionType.HORZ_B,
                      PartitionType.VERT_A, PartitionType.HORZ_4):
                if int(k) < nsym:
                    p0 -= self._elem_prob(icdf, int(k))
            derived = [PROB_TOP - p0, 0, 0]
            self.ec.encode_symbol(
                1 if part == PartitionType.SPLIT else 0, derived, adapt=False)
        else:
            assert part == PartitionType.SPLIT

    # ---- segmentation ------------------------------------------------------

    @staticmethod
    def _neg_interleave(x: int, ref: int, mx: int) -> int:
        """Inverse of spec neg_deinterleave (libaom parity)."""
        if ref == 0:
            return x
        if ref >= mx - 1:
            return mx - x - 1
        diff = x - ref
        if 2 * ref < mx:
            if abs(diff) <= ref:
                return (diff << 1) - 1 if diff > 0 else -(diff << 1)
            return x
        if abs(diff) < (mx - ref):
            return (diff << 1) - 1 if diff > 0 else -(diff << 1)
        return (mx - x) - 1

    def _write_segment_id(self, r: int, c: int, bsize: BlockSize,
                          seg_id: int, skip: bool) -> int:
        """Code segment_id (spec 5.11.14): spatial prediction from
        the above/left/above-left ids, neg-interleaved symbol with the
        3-context seg tree CDF. A skip block takes the prediction
        without coding. Returns the effective segment id."""
        g = self.seg_grid
        prev_ul = int(g[r - 1, c - 1]) if r > 0 and c > 0 else -1
        prev_u = int(g[r - 1, c]) if r > 0 else -1
        prev_l = int(g[r, c - 1]) if c > 0 else -1
        if prev_u == -1:
            pred = 0 if prev_l == -1 else prev_l
        elif prev_l == -1:
            pred = prev_u
        else:
            pred = prev_u if prev_ul == prev_u else prev_l
        if prev_ul < 0 or prev_u < 0 or prev_l < 0:
            ctx = 0
        elif prev_ul == prev_u and prev_ul == prev_l:
            ctx = 2
        elif (prev_ul == prev_u or prev_ul == prev_l
              or prev_u == prev_l):
            ctx = 1
        else:
            ctx = 0
        bw, bh = bsize.width_mi, bsize.height_mi
        if skip:
            seg_id = pred
        else:
            coded = self._neg_interleave(seg_id, pred,
                                         self.last_active_seg + 1)
            self.ec.encode_symbol(coded, self.cdfs.seg_tree[ctx])
        g[r: r + bh, c: c + bw] = seg_id
        return seg_id

    # ---- mode info ---------------------------------------------------------

    def write_intra_block(self, r: int, c: int, bsize: BlockSize,
                          d: BlockDecision):
        """intra_frame_mode_info for a KEY-frame block (spec 5.11.17),
        under: segmentation off, cdef off, deltas off, palette off,
        filter_intra off, TX_MODE_LARGEST."""
        bw, bh = bsize.width_mi, bsize.height_mi
        # skip
        above_sk = int(self.skip_grid[r - 1, c]) if r > 0 else 0
        left_sk = int(self.skip_grid[r, c - 1]) if c > 0 else 0
        sctx = above_sk + left_sk
        self.ec.encode_symbol(int(d.skip), self.cdfs.skip[sctx])
        if self.seg_enabled:   # SegIdPreSkip == 0: after the skip bit
            self._write_segment_id(r, c, bsize, d.seg_id, d.skip)
        self._write_cdef_idx(r, c, d.skip)
        # intra_frame_y_mode
        above_m = int(self.mode_grid[r - 1, c]) if r > 0 else 0
        left_m = int(self.mode_grid[r, c - 1]) if c > 0 else 0
        actx = INTRA_MODE_CONTEXT[above_m]
        lctx = INTRA_MODE_CONTEXT[left_m]
        self.ec.encode_symbol(int(d.y_mode), self.cdfs.kf_y_mode[actx][lctx])
        # angle deltas only for directional modes on >=8x8 blocks
        from rav1e_tpu.core.constants import ANGLE_BASE
        if d.y_mode in ANGLE_BASE and bsize >= BlockSize.B8X8:
            self.ec.encode_symbol(
                d.angle_delta_y + 3,
                self.cdfs.angle_delta[int(d.y_mode) - 1])
        # chroma (always present for >=8x8 in 4:2:0)
        cfl_allowed = bsize.width <= 32 and bsize.height <= 32
        if cfl_allowed:
            self.ec.encode_symbol(
                int(d.uv_mode), self.cdfs.uv_mode_cfl[int(d.y_mode)])
        else:
            self.ec.encode_symbol(
                int(d.uv_mode), self.cdfs.uv_mode[int(d.y_mode)])
        if d.uv_mode == PredictionMode.UV_CFL_PRED:
            # spec read_cfl_alphas: joint sign symbol then per-plane
            # alphabet index with sign-derived contexts
            au, av = d.cfl_alpha_idx  # signed alphas -16..16
            su = 0 if au == 0 else (1 if au < 0 else 2)
            sv = 0 if av == 0 else (1 if av < 0 else 2)
            js = su * 3 + sv - 1
            assert js >= 0, "CFL with both alphas zero is not coded"
            self.ec.encode_symbol(js, self.cdfs.cfl_sign)
            if su:
                self.ec.encode_symbol(abs(au) - 1,
                                      self.cdfs.cfl_alpha[js - 2])
            if sv:
                self.ec.encode_symbol(abs(av) - 1,
                                      self.cdfs.cfl_alpha[sv * 3 + su - 3])
        if d.uv_mode in ANGLE_BASE and bsize >= BlockSize.B8X8:
            self.ec.encode_symbol(
                d.angle_delta_uv + 3,
                self.cdfs.angle_delta[int(d.uv_mode) - 1])
        # residual (spec residual(): per 64-chunk, plane 0 then 1 then 2)
        if not d.skip:
            ytx = MAX_TX_SIZE_RECT[bsize]
            ytt = d.coeffs.get("y_tx_type", TxType.DCT_DCT)
            self._write_tu(0, r, c, ytx, ytt, d.coeffs[0], d.y_mode)
            uvtx = chroma_tx_size(bsize, self.ss_x, self.ss_y)
            uvtt = chroma_tx_type(d.uv_mode, uvtx, self.reduced_tx_set)
            self._write_tu(1, r, c, uvtx, uvtt, d.coeffs[1], d.uv_mode)
            self._write_tu(2, r, c, uvtx, uvtt, d.coeffs[2], d.uv_mode)
        else:
            # skip resets the coefficient contexts over the block extent
            self.above_coef[0][c: c + bw] = 0
            self.left_coef[0][r: r + bh] = 0
            for p in (1, 2):
                sx, sy = self.ss_x, self.ss_y
                self.above_coef[p][c >> sx: (c + bw + (1 << sx) - 1)
                                   >> sx] = 0
                self.left_coef[p][r >> sy: (r + bh + (1 << sy) - 1)
                                  >> sy] = 0
        # update context grids
        self.skip_grid[r: r + bh, c: c + bw] = int(d.skip)
        self.mode_grid[r: r + bh, c: c + bw] = int(d.y_mode)

    def _write_tu(self, plane: int, mi_r: int, mi_c: int, tx: TxSize,
                  tx_type: TxType, levels, mode: PredictionMode,
                  is_inter: bool = False):
        """Code one transform unit + maintain entropy contexts."""
        sx = 0 if plane == 0 else self.ss_x
        sy = 0 if plane == 0 else self.ss_y
        u_c = mi_c >> sx  # first 4-px unit column of this plane block
        u_r = mi_r >> sy
        uw = tx.width >> 2
        uh = tx.height >> 2
        above = self.above_coef[plane]
        left = self.left_coef[plane]
        a_span = above[u_c: u_c + uw]
        l_span = left[u_r: u_r + uh]
        if plane == 0:
            skip_ctx = 0  # tx covers the whole block (TX_MODE_LARGEST)
        else:
            base = int(bool(a_span.any())) + int(bool(l_span.any()))
            skip_ctx = 7 + base
        # dc sign ctx from neighbor categories
        dcs = 0
        for b in a_span:
            cat = int(b) >> 6
            dcs += 1 if cat == 2 else (-1 if cat == 1 else 0)
        for b in l_span:
            cat = int(b) >> 6
            dcs += 1 if cat == 2 else (-1 if cat == 1 else 0)
        dc_sign_ctx = 0 if dcs == 0 else (1 if dcs < 0 else 2)

        def tx_type_cb():
            if plane != 0:
                return
            if is_inter:
                # spec get_tx_set (inter) + read_tx_type: a symbol IS
                # coded for every luma TU with sqr_up <= 32 (set 3 =
                # {IDTX, DCT} at 32x32, unlike intra's DCT-only).
                if self.base_q_idx == 0 or _sqr_up_idx(tx) > 3:
                    return
                if self.reduced_tx_set or _sqr_up_idx(tx) == 3:
                    order, table = INTER_TX_SET3, self.cdfs.inter_ext_tx3
                elif tx.sqr == TxSize.TX_16X16:
                    order, table = INTER_TX_SET2, self.cdfs.inter_ext_tx2
                else:
                    order, table = INTER_TX_SET1, self.cdfs.inter_ext_tx1
                self.ec.encode_symbol(order.index(tx_type),
                                      table[_sqr_idx(tx)])
                return
            s = intra_tx_set(tx, self.reduced_tx_set)
            if s == 0 or self.base_q_idx == 0:
                return
            order = INTRA_TX_SET1 if s == 1 else INTRA_TX_SET2
            sym = order.index(tx_type)
            sqr = _sqr_up_idx(tx.sqr)
            table = (self.cdfs.intra_ext_tx1 if s == 1
                     else self.cdfs.intra_ext_tx2)
            self.ec.encode_symbol(sym, table[sqr][int(mode)])

        cul = coeffmod.write_coeffs(
            self.ec, self.cdfs, plane, tx, tx_type, levels,
            skip_ctx, dc_sign_ctx, tx_type_cb)
        above[u_c: u_c + uw] = cul
        left[u_r: u_r + uh] = cul

    # ---- inter blocks ------------------------------------------------------

    def write_mv(self, mv, pred, allow_hp: bool = False):
        """mv_residual coding (spec read_mv inverse): joint symbol then
        per-component sign/class/offset. allow_hp=0 means the hp bit is
        implied 1, so diffs must be even (1/4-pel). With
        force_integer_mv the fr symbol is implied 3 as well, so diffs
        must be multiples of 8 (whole-pel)."""
        int_mv = self.force_integer_mv
        dr = int(mv[0]) - int(pred[0])
        dc = int(mv[1]) - int(pred[1])
        joint = (2 if dr != 0 else 0) | (1 if dc != 0 else 0)
        self.ec.encode_symbol(joint, self.cdfs.mv_joint)
        for ci, d in ((0, dr), (1, dc)):
            if d == 0:
                continue
            t = self.cdfs.mv_comp[ci]
            sign = 1 if d < 0 else 0
            z = abs(d) - 1
            self.ec.encode_symbol(sign, t["sign"])
            if z < 16:
                cls = 0
            else:
                cls = z.bit_length() - 4
            self.ec.encode_symbol(cls, t["classes"])
            if cls == 0:
                assert z & 1, "hp bit is implied 1 when allow_hp=0"
                self.ec.encode_symbol(z >> 3, t["class0"])
                if int_mv:
                    assert (z >> 1) & 3 == 3, \
                        "fr implied 3 under force_integer_mv"
                else:
                    self.ec.encode_symbol((z >> 1) & 3,
                                          t["class0_fr"][z >> 3])
                if allow_hp:
                    self.ec.encode_symbol(z & 1, t["class0_hp"])
            else:
                o = z - (2 << (cls + 2))
                assert o & 1 or allow_hp, "hp bit implied 1"
                for i in range(cls):
                    self.ec.encode_symbol((o >> (i + 3)) & 1, t["bits"][i])
                if int_mv:
                    assert (o >> 1) & 3 == 3, \
                        "fr implied 3 under force_integer_mv"
                else:
                    self.ec.encode_symbol((o >> 1) & 3, t["fr"])
                if allow_hp:
                    self.ec.encode_symbol(o & 1, t["hp"])

    def write_inter_block(self, r: int, c: int, bsize: BlockSize, d):
        """inter_frame_mode_info for a P-frame block (single LAST ref,
        zero-MV GLOBALMV path; segmentation/cdef/deltas off)."""
        from rav1e_tpu.entropy.inter import LAST_FRAME, InterBlockInfo
        bw, bh = bsize.width_mi, bsize.height_mi
        ictx = self.inter_ctx
        # skip
        above_sk = int(self.skip_grid[r - 1, c]) if r > 0 else 0
        left_sk = int(self.skip_grid[r, c - 1]) if c > 0 else 0
        self.ec.encode_symbol(int(d.skip), self.cdfs.skip[above_sk + left_sk])
        if self.seg_enabled:   # SegIdPreSkip == 0: after the skip bit
            self._write_segment_id(r, c, bsize, d.seg_id, d.skip)
        self._write_cdef_idx(r, c, d.skip)
        # is_inter
        ii_ctx = ictx.intra_inter_ctx(r, c)
        if getattr(d, "ref", LAST_FRAME) == 0:
            # intra block inside an inter frame (spec
            # inter_frame_mode_info, is_inter = 0): y_mode via the
            # size-group cdf, uv via uv_mode_cfl, intra residual
            from rav1e_tpu.entropy.inter import InterBlockInfo
            self.ec.encode_symbol(0, self.cdfs.intra_inter[ii_ctx])
            sg = {BlockSize.B32X32: 3, BlockSize.B16X16: 2}[bsize]
            self.ec.encode_symbol(int(d.y_mode), self.cdfs.y_mode[sg])
            from rav1e_tpu.core.constants import ANGLE_BASE
            if d.y_mode in ANGLE_BASE:
                self.ec.encode_symbol(
                    d.angle_delta_y + 3,
                    self.cdfs.angle_delta[int(d.y_mode) - 1])
            cfl_allowed = bsize.width <= 32 and bsize.height <= 32
            tbl = (self.cdfs.uv_mode_cfl if cfl_allowed
                   else self.cdfs.uv_mode)
            self.ec.encode_symbol(int(d.uv_mode), tbl[int(d.y_mode)])
            if d.uv_mode in ANGLE_BASE:
                self.ec.encode_symbol(
                    d.angle_delta_uv + 3,
                    self.cdfs.angle_delta[int(d.uv_mode) - 1])
            bw, bh = bsize.width_mi, bsize.height_mi
            if not d.skip:
                ytx = MAX_TX_SIZE_RECT[bsize]
                ytt = d.coeffs.get("y_tx_type", TxType.DCT_DCT)
                self._write_tu(0, r, c, ytx, ytt, d.coeffs[0],
                               d.y_mode)
                uvtx = chroma_tx_size(bsize, self.ss_x, self.ss_y)
                uvtt = chroma_tx_type(d.uv_mode, uvtx,
                                      self.reduced_tx_set)
                self._write_tu(1, r, c, uvtx, uvtt, d.coeffs[1],
                               d.uv_mode)
                self._write_tu(2, r, c, uvtx, uvtt, d.coeffs[2],
                               d.uv_mode)
            else:
                self.above_coef[0][c: c + bw] = 0
                self.left_coef[0][r: r + bh] = 0
                for p in (1, 2):
                    sx, sy = self.ss_x, self.ss_y
                    self.above_coef[p][c >> sx:
                                       (c + bw + (1 << sx) - 1)
                                       >> sx] = 0
                    self.left_coef[p][r >> sy:
                                      (r + bh + (1 << sy) - 1)
                                      >> sy] = 0
            self.skip_grid[r: r + bh, c: c + bw] = int(d.skip)
            self.mode_grid[r: r + bh, c: c + bw] = int(d.y_mode)
            ictx.set_block(r, c, bsize, InterBlockInfo(
                is_inter=False, ref=0, mode=d.y_mode, mv=(0, 0)))
            return
        self.ec.encode_symbol(1, self.cdfs.intra_inter[ii_ctx])
        ref = getattr(d, "ref", LAST_FRAME)
        ref2 = getattr(d, "ref2", 0)
        is_comp = ref2 > 0
        # comp_mode: coded only when the frame header signals
        # reference_select (spec read_ref_frames)
        if self.reference_select:
            self.ec.encode_symbol(
                int(is_comp), self.cdfs.comp_inter[ictx.comp_mode_ctx(r, c)])
        if is_comp:
            return self._write_compound_block(r, c, bsize, d, ref, ref2)
        # single ref tree (spec read_ref_frames single path):
        # p1: 0 = forward group {LAST,LAST2,LAST3,GOLDEN}, 1 = backward
        def srbit(pos, sym):
            self.ec.encode_symbol(sym, self.cdfs.single_ref[
                ictx.single_ref_ctx(r, c, pos)][pos])

        if ref <= 4:
            srbit(0, 0)
            if ref in (1, 2):              # p3 = 0: {LAST, LAST2}
                srbit(2, 0)
                srbit(3, ref - 1)          # p4: LAST vs LAST2
            else:                          # p3 = 1: {LAST3, GOLDEN}
                assert ref in (3, 4), ref
                srbit(2, 1)
                srbit(4, ref - 3)          # p5: LAST3 vs GOLDEN
        else:
            assert ref == 7, "only ALTREF coded in the bwd group"
            srbit(0, 1)
            srbit(1, 1)                    # p2: ALTREF
        # mv stack + inter mode
        stack, mctx = ictx.find_mv_stack(
            r, c, bsize, ref, force_integer_mv=self.force_integer_mv)
        mode = d.y_mode  # inter mode stored in y_mode slot
        mv = tuple(d.mv)
        if mode == PredictionMode.NEWMV:
            # alias to NEAREST/NEARMV when the stack already holds this
            # exact mv (same prediction, cheaper syntax)
            if mv == tuple(stack[0][0]):
                mode = PredictionMode.NEARESTMV
            elif mctx["n_found"] >= 2 and mv == tuple(stack[1][0]):
                mode = PredictionMode.NEARMV
        if mode == PredictionMode.NEWMV:
            self.ec.encode_symbol(0, self.cdfs.newmv[mctx["new"]])
            # drl (spec read_drl_idx): RefMvIdx 0; bits are present
            # only while NumMvFound exceeds idx+1
            for idx in range(2):
                if mctx["n_found"] > idx + 1:
                    self.ec.encode_symbol(
                        0, self.cdfs.drl[mctx["drl_ctx"][idx]])
                    break
            self.write_mv(mv, mctx["pred_mv"])
        else:
            self.ec.encode_symbol(1, self.cdfs.newmv[mctx["new"]])
            if mode == PredictionMode.GLOBALMV:
                self.ec.encode_symbol(0, self.cdfs.zeromv[mctx["zero"]])
            else:
                self.ec.encode_symbol(1, self.cdfs.zeromv[mctx["zero"]])
                nearest = mode == PredictionMode.NEARESTMV
                self.ec.encode_symbol(0 if nearest else 1,
                                      self.cdfs.refmv[mctx["ref"]])
                if not nearest:
                    # RefMvIdx = 1: drl loop starts at idx 1
                    for idx in (1, 2):
                        if mctx["n_found"] > idx + 1:
                            self.ec.encode_symbol(
                                0, self.cdfs.drl[mctx["drl_ctx"][idx]])
                            break
        self._write_inter_residual(r, c, bsize, d)
        ictx.set_block(r, c, bsize, InterBlockInfo(
            is_inter=True, ref=ref, mode=mode, mv=tuple(d.mv)))

    def _write_inter_residual(self, r, c, bsize, d):
        bw, bh = bsize.width_mi, bsize.height_mi
        # residual (same plane order; inter tx type: DCT only at >=32)
        if not d.skip:
            ytx = MAX_TX_SIZE_RECT[bsize]
            self._write_tu(0, r, c, ytx, TxType.DCT_DCT, d.coeffs[0],
                           PredictionMode.DC_PRED, is_inter=True)
            uvtx = chroma_tx_size(bsize, self.ss_x, self.ss_y)
            self._write_tu(1, r, c, uvtx, TxType.DCT_DCT, d.coeffs[1],
                           PredictionMode.DC_PRED, is_inter=True)
            self._write_tu(2, r, c, uvtx, TxType.DCT_DCT, d.coeffs[2],
                           PredictionMode.DC_PRED, is_inter=True)
        else:
            self.above_coef[0][c: c + bw] = 0
            self.left_coef[0][r: r + bh] = 0
            for p in (1, 2):
                sx, sy = self.ss_x, self.ss_y
                self.above_coef[p][c >> sx: (c + bw + (1 << sx) - 1)
                                   >> sx] = 0
                self.left_coef[p][r >> sy: (r + bh + (1 << sy) - 1)
                                  >> sy] = 0
        self.skip_grid[r: r + bh, c: c + bw] = int(d.skip)

    def _write_compound_block(self, r, c, bsize, d, ref: int, ref2: int):
        """Compound (two-reference) block tail: ref pair, compound
        mode symbol, drl, per-ref MV residuals (spec read_ref_frames
        BIDIR path + read_inter_compound_mode + assign_mv)."""
        from rav1e_tpu.entropy.inter import InterBlockInfo
        ictx = self.inter_ctx
        assert ref == 1 and ref2 == 7, "compound pair is (LAST, ALTREF)"
        # comp_ref_type: 1 = BIDIR
        self.ec.encode_symbol(
            1, self.cdfs.comp_ref_type[ictx.comp_ref_type_ctx(r, c)])
        # forward ref LAST: comp_ref p -> {LAST,LAST2}, p1 -> LAST
        self.ec.encode_symbol(
            0, self.cdfs.comp_ref[ictx.comp_ref_ctx(r, c, 0)][0])
        self.ec.encode_symbol(
            0, self.cdfs.comp_ref[ictx.comp_ref_ctx(r, c, 1)][1])
        # backward ref ALTREF: comp_bwdref p -> ALTREF
        self.ec.encode_symbol(
            1, self.cdfs.comp_bwdref[ictx.comp_ref_ctx(r, c, 3)][0])
        stack, mctx = ictx.find_mv_stack(
            r, c, bsize, (ref, ref2),
            force_integer_mv=self.force_integer_mv)
        mode = d.y_mode
        mvs = (tuple(d.mv), tuple(d.mv2))
        if mode == PredictionMode.NEW_NEWMV:
            # alias to the cheaper stack-addressed modes when possible
            if mvs == tuple(stack[0][0]):
                mode = PredictionMode.NEAREST_NEARESTMV
            elif mctx["n_found"] >= 2 and mvs == tuple(stack[1][0]):
                mode = PredictionMode.NEAR_NEARMV
        sym = int(mode) - int(PredictionMode.NEAREST_NEARESTMV)
        self.ec.encode_symbol(
            sym, self.cdfs.inter_compound_mode[mctx["comp_mode"]])
        # drl (spec read_drl_idx): NEW_NEWMV from idx 0; NEAR_NEARMV
        # from idx 1; NEAREST_NEARESTMV / GLOBAL_GLOBALMV none
        if mode == PredictionMode.NEW_NEWMV:
            for idx in range(2):
                if mctx["n_found"] > idx + 1:
                    self.ec.encode_symbol(
                        0, self.cdfs.drl[mctx["drl_ctx"][idx]])
                    break
        elif mode == PredictionMode.NEAR_NEARMV:
            for idx in (1, 2):
                if mctx["n_found"] > idx + 1:
                    self.ec.encode_symbol(
                        0, self.cdfs.drl[mctx["drl_ctx"][idx]])
                    break
        if mode == PredictionMode.NEW_NEWMV:
            self.write_mv(mvs[0], mctx["pred_mvs"][0])
            self.write_mv(mvs[1], mctx["pred_mvs"][1])
        self._write_inter_residual(r, c, bsize, d)
        ictx.set_block(r, c, bsize, InterBlockInfo(
            is_inter=True, ref=ref, mode=mode, mv=mvs[0],
            ref2=ref2, mv2=mvs[1]))

    def _write_block(self, r, c, bsize, d):
        if self.inter_frame:
            self.write_inter_block(r, c, bsize, d)
        else:
            self.write_intra_block(r, c, bsize, d)

    # ---- tree walking ------------------------------------------------------

    def write_sb_tree(self, r: int, c: int, bsize: BlockSize,
                      partitions: dict, blocks: dict):
        """Recursively code one superblock's partition tree."""
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        part = partitions.get((r, c, int(bsize)), PartitionType.NONE)
        self.write_partition(r, c, bsize, part)
        sub = subsize(part, bsize)
        half = bsize.width_mi // 2
        if part == PartitionType.NONE:
            self._write_block(r, c, bsize, blocks[(r, c)])
            self._update_part_ctx(r, c, sub, bsize)
        elif part == PartitionType.SPLIT:
            if sub == BlockSize.B4X4:
                for (dr, dc) in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    rr, cc = r + dr, c + dc
                    if rr < self.mi_rows and cc < self.mi_cols:
                        self._write_block(rr, cc, sub, blocks[(rr, cc)])
                self._update_part_ctx(r, c, sub, bsize)
            else:
                for (dr, dc) in ((0, 0), (0, half), (half, 0), (half, half)):
                    self.write_sb_tree(r + dr, c + dc, sub, partitions, blocks)
        elif part == PartitionType.HORZ:
            self._write_block(r, c, sub, blocks[(r, c)])
            if r + half < self.mi_rows:
                self._write_block(r + half, c, sub, blocks[(r + half, c)])
            self._update_part_ctx(r, c, sub, bsize)
        elif part == PartitionType.VERT:
            self._write_block(r, c, sub, blocks[(r, c)])
            if c + half < self.mi_cols:
                self._write_block(r, c + half, sub, blocks[(r, c + half)])
            self._update_part_ctx(r, c, sub, bsize)
        else:
            raise ValueError(part)

    def write_tile(self, partitions: dict, blocks: dict) -> bytes:
        """Walk all SBs in raster order and finalize the tile data."""
        for r in range(0, self.mi_rows, 16):
            self.left_part[:] = 0
            for c in range(0, self.mi_cols, 16):
                if self.lr_data is not None:
                    self.write_lr(r, c)
                self.write_sb_tree(r, c, BlockSize.B64X64, partitions, blocks)
        return self.ec.done()

    # ---- loop restoration signaling (spec read_lr inverse) ---------------

    def write_lr(self, r: int, c: int):
        from rav1e_tpu.ops.ref.lrf import count_units
        for plane in range(3):
            t = self.lr_data["types"][plane]
            if t == 0:
                continue
            sx = 0 if plane == 0 else self.ss_x
            sy = 0 if plane == 0 else self.ss_y
            usize = 64 >> 0  # LoopRestorationSize (64 both planes)
            ph = (self.frame_mi_rows * 4) >> sy
            pw = (self.frame_mi_cols * 4) >> sx
            unit_rows = count_units(ph, usize)
            unit_cols = count_units(pw, usize)
            py0 = (r * 4) >> sy
            py1 = ((r + 16) * 4) >> sy
            px0 = (c * 4) >> sx
            px1 = ((c + 16) * 4) >> sx
            ur0 = (py0 + usize - 1) // usize
            ur1 = min(unit_rows, (py1 + usize - 1) // usize)
            uc0 = (px0 + usize - 1) // usize
            uc1 = min(unit_cols, (px1 + usize - 1) // usize)
            for ur in range(ur0, ur1):
                for uc in range(uc0, uc1):
                    self._write_lr_unit(plane, t, ur, uc)

    def _write_lr_unit(self, plane: int, ftype: int, ur: int, uc: int):
        unit = self.lr_data["units"][plane][ur][uc]
        if ftype == 2:  # frame type WIENER
            if unit is None:
                self.ec.encode_symbol(0, self.cdfs.wiener_restore)
                return
            self.ec.encode_symbol(1, self.cdfs.wiener_restore)
            self._write_wiener(plane, unit)
        elif ftype == 3:  # SGRPROJ
            if unit is None:
                self.ec.encode_symbol(0, self.cdfs.sgrproj_restore)
                return
            self.ec.encode_symbol(1, self.cdfs.sgrproj_restore)
            self._write_sgr(plane, unit)
        else:  # SWITCHABLE: symbol 0 none / 1 wiener / 2 sgr
            if unit is None:
                self.ec.encode_symbol(0, self.cdfs.switchable_restore)
            elif unit[0] == "W":
                self.ec.encode_symbol(1, self.cdfs.switchable_restore)
                self._write_wiener(plane, unit)
            else:
                self.ec.encode_symbol(2, self.cdfs.switchable_restore)
                self._write_sgr(plane, unit)

    def _write_sgr(self, plane: int, unit):
        from rav1e_tpu.ops.ref.lrf import (SGR_PARAMS_S, SGRPROJ_XQD_MAX,
                                           SGRPROJ_XQD_MIN)
        _, sgr_set, x0, x1 = unit
        self.ec.encode_literal(sgr_set, 4)
        s0, s1 = SGR_PARAMS_S[sgr_set]
        ref = self.lr_sgr_ref[plane]
        if s0:
            _write_signed_subexp_ref(self.ec, x0, SGRPROJ_XQD_MIN[0],
                                     SGRPROJ_XQD_MAX[0] + 1, 4, ref[0])
        else:
            x0 = 0
        if s1:
            _write_signed_subexp_ref(self.ec, x1, SGRPROJ_XQD_MIN[1],
                                     SGRPROJ_XQD_MAX[1] + 1, 4, ref[1])
        else:
            x1 = max(SGRPROJ_XQD_MIN[1],
                     min(SGRPROJ_XQD_MAX[1], (1 << 7) - x0))
        ref[0] = x0
        ref[1] = x1

    def _write_wiener(self, plane: int, unit):
        _, vtaps, htaps = unit
        for p, taps in ((0, vtaps), (1, htaps)):
            first = 1 if plane != 0 else 0  # chroma: 5-tap, w0 == 0
            for j in range(first, 3):
                _write_signed_subexp_ref(
                    self.ec, int(taps[j]), WIENER_TAPS_MIN[j],
                    WIENER_TAPS_MAX[j] + 1, WIENER_TAPS_K[j],
                    self.lr_ref[plane][p][j])
                self.lr_ref[plane][p][j] = int(taps[j])
