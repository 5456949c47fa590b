"""OBU framing + sequence/frame header writers (AV1 spec §5).

Reference parity: rav1e src/header.rs (write_obus, sequence header,
write_uncompressed_frame_header, ULEB sizes, tile group assembly).
Toolset gating mirrors rav1e v0.5.1's sequence-header asserts
(SURVEY.md Appendix A.4): no interintra/masked-compound/warped/dual-
filter/jnt-comp/ref-frame-mvs; screen content tools off.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from rav1e_tpu.core.constants import FrameType, ObuType
from rav1e_tpu.entropy.bitio import BitWriter, uleb128

# (seq_level_idx, max_pic_size, max_h_size, max_v_size)
_LEVELS = [
    (0, 147456, 2048, 1152),
    (1, 278784, 2816, 1584),
    (4, 665856, 4352, 2448),
    (5, 1065024, 5504, 3096),
    (8, 2359296, 6144, 3456),
    (12, 8912896, 8192, 4352),
    (16, 35651584, 16384, 8704),
]


def choose_level(w: int, h: int) -> int:
    for idx, pic, mw, mh in _LEVELS:
        if w * h <= pic and w <= mw and h <= mh:
            return idx
    return 19  # 6.3


@dataclass
class Sequence:
    """Sequence-level parameters (subset rav1e emits; SURVEY §2.1)."""

    width: int
    height: int
    bit_depth: int = 8
    mono: bool = False
    subsampling_x: int = 1
    subsampling_y: int = 1
    still_picture: bool = False
    enable_cdef: bool = False
    enable_restoration: bool = False
    # off: directional prediction then skips edge filtering/upsampling
    # (spec 7.11.2.4); flips on when the filter lands in ops/ref/intra
    enable_intra_edge_filter: bool = False
    enable_order_hint: bool = True
    order_hint_bits: int = 7
    enable_superres: bool = False
    film_grain_params_present: bool = False
    # timing info (spec 5.5.3; rav1e enable_timing_info): display
    # tick rate; equal_picture_interval fixed-fps streams only, no
    # decoder model
    timing_info_present: bool = False
    num_units_in_display_tick: int = 1
    time_scale: int = 30
    num_ticks_per_picture: int = 1
    color_range: int = 0
    chroma_sample_position: int = 0
    color_description: tuple | None = None  # (primaries, transfer, matrix)
    profile: int = 0

    @property
    def frame_width_bits(self) -> int:
        return max((self.width - 1).bit_length(), 1)

    @property
    def frame_height_bits(self) -> int:
        return max((self.height - 1).bit_length(), 1)

    def write(self) -> bytes:
        """sequence_header_obu payload (spec 5.5)."""
        b = BitWriter()
        b.f(self.profile, 3)
        b.bit(self.still_picture)
        b.bit(0)  # reduced_still_picture_header
        b.bit(self.timing_info_present)
        if self.timing_info_present:
            # timing_info(): fixed frame rate, no decoder model
            b.f(self.num_units_in_display_tick, 32)
            b.f(self.time_scale, 32)
            b.bit(1)  # equal_picture_interval
            b.uvlc(self.num_ticks_per_picture - 1)
            b.bit(0)  # decoder_model_info_present_flag
        b.bit(0)  # initial_display_delay_present_flag
        b.f(0, 5)  # operating_points_cnt_minus_1
        b.f(0, 12)  # operating_point_idc[0]
        level = choose_level(self.width, self.height)
        b.f(level, 5)
        if level > 7:
            b.bit(0)  # seq_tier
        b.f(self.frame_width_bits - 1, 4)
        b.f(self.frame_height_bits - 1, 4)
        b.f(self.width - 1, self.frame_width_bits)
        b.f(self.height - 1, self.frame_height_bits)
        b.bit(0)  # frame_id_numbers_present_flag
        b.bit(0)  # use_128x128_superblock: rav1e always 64x64
        b.bit(0)  # enable_filter_intra
        b.bit(self.enable_intra_edge_filter)
        b.bit(0)  # enable_interintra_compound
        b.bit(0)  # enable_masked_compound
        b.bit(0)  # enable_warped_motion
        b.bit(0)  # enable_dual_filter
        b.bit(self.enable_order_hint)
        if self.enable_order_hint:
            b.bit(0)  # enable_jnt_comp
            b.bit(0)  # enable_ref_frame_mvs
        b.bit(1)  # seq_choose_screen_content_tools
        # -> seq_force_screen_content_tools = SELECT (2); each frame
        #    writes allow_screen_content_tools = 0.
        b.bit(1)  # seq_choose_integer_mv -> force_integer_mv = SELECT
        if self.enable_order_hint:
            b.f(self.order_hint_bits - 1, 3)
        b.bit(self.enable_superres)
        b.bit(self.enable_cdef)
        b.bit(self.enable_restoration)
        self._color_config(b)
        b.bit(self.film_grain_params_present)
        b.trailing_bits()
        return b.bytes()

    def _color_config(self, b: BitWriter):
        high = self.bit_depth > 8
        b.bit(high)
        if self.profile == 2 and high:
            b.bit(self.bit_depth == 12)
        if self.profile != 1:
            b.bit(self.mono)
        assert not self.mono, "monochrome not plumbed yet"
        if self.color_description is not None:
            b.bit(1)
            cp, tc, mc = self.color_description
            b.f(cp, 8)
            b.f(tc, 8)
            b.f(mc, 8)
            identity = cp == 1 and tc == 13 and mc == 0
        else:
            b.bit(0)
            identity = False
        if not identity:
            b.bit(self.color_range)
            if self.profile == 0:
                pass  # 4:2:0 implied
            elif self.profile == 1:
                pass  # 4:4:4 implied
            else:
                # profile 2: 12-bit signals subsampling explicitly;
                # 8/10-bit implies 4:2:2
                if self.bit_depth == 12:
                    b.bit(self.subsampling_x)
                    if self.subsampling_x:
                        b.bit(self.subsampling_y)
            if self.subsampling_x and self.subsampling_y:
                b.f(self.chroma_sample_position, 2)
        b.bit(0)  # separate_uv_delta_q


@dataclass
class FrameParams:
    """Per-frame header fields for an intra (KEY) frame."""

    frame_type: FrameType = FrameType.KEY
    show_frame: bool = True
    base_q_idx: int = 100
    disable_cdf_update: bool = False
    order_hint: int = 0
    tx_mode_select: bool = False  # False => TX_MODE_LARGEST
    reduced_tx_set: bool = True
    # compound prediction: reference_select=1 lets blocks choose
    # single vs compound; ref_order_hints (per ref_idx slot position,
    # 7 entries) feed the skip-mode-allowed mirror computation
    reference_select: bool = False
    ref_order_hints: list | None = None
    # segmentation: None or list of 8 per-segment ALT_Q deltas (int,
    # None = segment feature disabled). Only SEG_LVL_ALT_Q supported.
    seg_alt_q: list | None = None
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    context_update_tile_id: int = 0
    tile_size_bytes: int = 4
    loop_filter_levels: tuple = (0, 0, 0, 0)
    loop_filter_sharpness: int = 0
    loop_filter_delta_enabled: bool = False
    # quantization_params chroma deltas (spec read_delta_q; V follows
    # U because seq separate_uv_delta_q = 0). rav1e runs chroma at a
    # finer quantizer than luma (QuantizerParameters in
    # src/quantize/mod.rs derives per-plane qi from one log-q target)
    delta_q_u_dc: int = 0      # -63..63
    delta_q_u_ac: int = 0
    # film grain (written only when seq.film_grain_params_present):
    # None = apply_grain 0
    film_grain: "FilmGrainParams | None" = None
    # loop restoration (written only when seq.enable_restoration):
    # per-plane frame restoration types, spec Remap_Lr_Type indices
    # (0 NONE, 1 SWITCHABLE, 2 WIENER, 3 SGRPROJ); unit size 64 fixed
    lr_types: tuple = (0, 0, 0)
    # CDEF (written only when seq.enable_cdef): either one uniform
    # strength (cdef_bits = 0, per-SB index free) or a multi-entry
    # set via cdef_strengths (list of (y_pri, y_sec, uv_pri, uv_sec);
    # cdef_bits = log2(len), each SB codes a literal index)
    cdef_damping: int = 3      # 3..6
    cdef_y_pri: int = 0
    cdef_y_sec: int = 0        # {0, 1, 2, 4}
    cdef_uv_pri: int = 0
    cdef_uv_sec: int = 0
    cdef_strengths: list | None = None
    # render size (spec 5.9.6): display dims when the coded frame is
    # padded (arbitrary-resolution input padded to the SB grid). None
    # or == coded dims -> render_and_frame_size_different = 0.
    render_size: tuple | None = None
    # error-resilient / S-frame features (rav1e error_resilient +
    # switch_frame_interval, [BIN] `switch_frame_interval`):
    # error_resilient=1 codes primary_ref implied NONE and the 8
    # reference slots' order hints; frame_type SWITCH additionally
    # implies error_resilient, refresh=0xFF, size-from-ref, and
    # force_integer_mv=1
    error_resilient: bool = False
    force_integer_mv: bool = False
    # order hints currently held by the decoder's 8 reference slots
    # (spec RefOrderHint conformance check under error resilience)
    slot_order_hints: list | None = None


def _write_render_size(b: BitWriter, seq: "Sequence", fp: FrameParams):
    rs = fp.render_size
    if rs is not None and tuple(rs) != (seq.width, seq.height):
        b.bit(1)  # render_and_frame_size_different
        b.f(rs[0] - 1, 16)
        b.f(rs[1] - 1, 16)
    else:
        b.bit(0)  # render_and_frame_size_different


def _tile_log2(blk_size: int, target: int) -> int:
    k = 0
    while (blk_size << k) < target:
        k += 1
    return k


class TileInfo:
    """Uniform tile layout (spec 5.9.15). rav1e: uniform spacing only."""

    def __init__(self, seq: Sequence, cols_log2: int = 0, rows_log2: int = 0):
        mi_cols = 2 * ((seq.width + 7) >> 3)
        mi_rows = 2 * ((seq.height + 7) >> 3)
        self.sb_cols = (mi_cols + 15) >> 4
        self.sb_rows = (mi_rows + 15) >> 4
        sb_shift = 4  # 64x64 superblocks
        sb_size = sb_shift + 2
        max_tile_width_sb = 4096 >> sb_size
        max_tile_area_sb = (4096 * 2304) >> (2 * sb_size)
        self.min_log2_cols = _tile_log2(max_tile_width_sb, self.sb_cols)
        self.max_log2_cols = _tile_log2(1, min(self.sb_cols, 64))
        self.max_log2_rows = _tile_log2(1, min(self.sb_rows, 64))
        self.min_log2_tiles = max(
            self.min_log2_cols,
            _tile_log2(max_tile_area_sb, self.sb_rows * self.sb_cols),
        )
        self.cols_log2 = max(cols_log2, self.min_log2_cols)
        self.min_log2_rows = max(self.min_log2_tiles - self.cols_log2, 0)
        self.rows_log2 = max(rows_log2, self.min_log2_rows)
        assert self.cols_log2 <= self.max_log2_cols
        assert self.rows_log2 <= self.max_log2_rows
        # uniform spacing tile boundaries in SB units
        self.col_starts = self._starts(self.sb_cols, self.cols_log2)
        self.row_starts = self._starts(self.sb_rows, self.rows_log2)
        self.n_cols = len(self.col_starts) - 1
        self.n_rows = len(self.row_starts) - 1

    @staticmethod
    def _starts(sbs: int, log2: int) -> list[int]:
        size_sb = (sbs + (1 << log2) - 1) >> log2
        starts = list(range(0, sbs, size_sb)) + [sbs]
        return starts

    @property
    def n_tiles(self) -> int:
        return self.n_cols * self.n_rows

    def write(self, b: BitWriter, fp: FrameParams):
        b.bit(1)  # uniform_tile_spacing_flag
        k = self.min_log2_cols
        while k < self.cols_log2:
            b.bit(1)
            k += 1
        if self.cols_log2 < self.max_log2_cols:
            b.bit(0)
        k = self.min_log2_rows
        while k < self.rows_log2:
            b.bit(1)
            k += 1
        if self.rows_log2 < self.max_log2_rows:
            b.bit(0)
        if self.cols_log2 > 0 or self.rows_log2 > 0:
            b.f(fp.context_update_tile_id, self.rows_log2 + self.cols_log2)
            b.f(fp.tile_size_bytes - 1, 2)




def _write_segmentation(b: BitWriter, fp: FrameParams):
    """segmentation_params (spec 5.9.14). With PRIMARY_REF_NONE the
    update flags are implied (update_map=1, temporal=0, update_data=1);
    only the SEG_LVL_ALT_Q feature is coded."""
    if not fp.seg_alt_q:
        b.bit(0)  # segmentation_enabled
        return
    b.bit(1)      # segmentation_enabled
    # primary_ref_frame == PRIMARY_REF_NONE: no update flags coded
    for seg in range(8):
        alt_q = fp.seg_alt_q[seg] if seg < len(fp.seg_alt_q) else None
        # feature 0: SEG_LVL_ALT_Q (signed, 8 magnitude bits)
        if alt_q is not None:
            b.bit(1)
            v = max(-255, min(255, int(alt_q))) & ((1 << 9) - 1)
            b.f(v, 9)  # su(9): two's complement in 9 bits
        else:
            b.bit(0)
        for _ in range(7):  # remaining features disabled
            b.bit(0)


def write_frame_header(seq: Sequence, fp: FrameParams, ti: TileInfo) -> BitWriter:
    """uncompressed_header for a shown KEY frame (spec 5.9.2); returns
    the writer (unaligned) so a FRAME OBU can continue with tile data."""
    assert fp.frame_type == FrameType.KEY and fp.show_frame
    b = BitWriter()
    b.bit(0)  # show_existing_frame
    b.f(fp.frame_type, 2)
    b.bit(fp.show_frame)
    # error_resilient_mode implied 1 for shown KEY frames
    b.bit(fp.disable_cdf_update)
    b.bit(0)  # allow_screen_content_tools (SELECT at seq level)
    b.bit(0)  # frame_size_override_flag
    b.f(fp.order_hint, seq.order_hint_bits)
    # primary_ref_frame implied NONE; refresh implied 0xFF
    # frame_size(): from sequence max; superres disabled -> nothing
    _write_render_size(b, seq, fp)
    # allow_intrabc: not coded (screen content off)
    if not fp.disable_cdf_update:
        b.bit(1)  # disable_frame_end_update_cdf
    ti.write(b, fp)
    # quantization_params
    b.f(fp.base_q_idx, 8)
    b.delta_q(0)  # y dc
    b.delta_q(fp.delta_q_u_dc)  # u dc (v inherits: separate_uv off)
    b.delta_q(fp.delta_q_u_ac)  # u ac
    b.bit(0)  # using_qmatrix
    # segmentation_params
    _write_segmentation(b, fp)
    # delta_q_params
    if fp.base_q_idx > 0:
        b.bit(0)  # delta_q_present
    # loop_filter_params (CodedLossless is false: base_q_idx > 0)
    lf = fp.loop_filter_levels
    b.f(lf[0], 6)
    b.f(lf[1], 6)
    if lf[0] or lf[1]:
        b.f(lf[2], 6)
        b.f(lf[3], 6)
    b.f(fp.loop_filter_sharpness, 3)
    b.bit(fp.loop_filter_delta_enabled)
    assert not fp.loop_filter_delta_enabled
    _write_cdef_lr(b, seq, fp)
    # read_tx_mode
    b.bit(fp.tx_mode_select)
    # frame_reference_mode / skip_mode_params / warped: nothing (intra)
    b.bit(fp.reduced_tx_set)
    # global_motion: nothing (intra)
    _write_film_grain(b, seq, fp)
    return b


@dataclass
class FilmGrainParams:
    """Spec 5.9.30 film_grain_params (new-table path).

    Reference parity: rav1e's grain table passthrough / photon-noise
    tables. Scaling points are (value, scaling) pairs; AR coefficients
    are signed ints in [-128, 127]."""

    grain_seed: int = 0
    y_points: list = field(default_factory=list)    # [(value, scaling)]
    cb_points: list = field(default_factory=list)
    cr_points: list = field(default_factory=list)
    chroma_scaling_from_luma: bool = False
    grain_scaling: int = 8     # 8..11
    ar_coeff_lag: int = 0      # 0..3
    ar_coeffs_y: list = field(default_factory=list)
    ar_coeffs_cb: list = field(default_factory=list)
    ar_coeffs_cr: list = field(default_factory=list)
    ar_coeff_shift: int = 6    # 6..9
    grain_scale_shift: int = 0
    cb_mult: int = 128
    cb_luma_mult: int = 192
    cb_offset: int = 256
    cr_mult: int = 128
    cr_luma_mult: int = 192
    cr_offset: int = 256
    overlap_flag: bool = True
    clip_to_restricted_range: bool = False


def photon_noise_params(iso: int = 800, seed: int = 7391) -> FilmGrainParams:
    """Simple ISO-style grain table: luma-only scaling curve rising
    with brightness, no AR correlation (white grain)."""
    strength = max(1, min(40, iso // 100))
    pts = [(0, 0), (64, strength // 2), (128, strength),
           (192, strength), (255, strength)]
    return FilmGrainParams(grain_seed=seed & 0xFFFF, y_points=pts,
                           chroma_scaling_from_luma=False)


def _write_film_grain(b: BitWriter, seq: Sequence, fp: FrameParams,
                      show_frame: bool = True):
    """film_grain_params (spec 5.9.30), end of uncompressed_header."""
    if not seq.film_grain_params_present:
        return
    g = fp.film_grain
    if g is None:
        b.bit(0)  # apply_grain
        return
    b.bit(1)
    b.f(g.grain_seed, 16)
    if fp.frame_type == FrameType.INTER:
        b.bit(1)  # update_grain (no ref reuse yet)
    b.f(len(g.y_points), 4)
    for (v, s) in g.y_points:
        b.f(v, 8)
        b.f(s, 8)
    if not seq.mono:
        b.bit(g.chroma_scaling_from_luma)
        if not g.chroma_scaling_from_luma:
            b.f(len(g.cb_points), 4)
            for (v, s) in g.cb_points:
                b.f(v, 8)
                b.f(s, 8)
            b.f(len(g.cr_points), 4)
            for (v, s) in g.cr_points:
                b.f(v, 8)
                b.f(s, 8)
    b.f(g.grain_scaling - 8, 2)
    b.f(g.ar_coeff_lag, 2)
    num_pos = 2 * g.ar_coeff_lag * (g.ar_coeff_lag + 1)
    assert len(g.ar_coeffs_y) == num_pos
    for cv in g.ar_coeffs_y:
        b.f(cv + 128, 8)
    n_c = num_pos + (1 if g.y_points else 0)
    if g.chroma_scaling_from_luma or g.cb_points:
        assert len(g.ar_coeffs_cb) == n_c
        for cv in g.ar_coeffs_cb:
            b.f(cv + 128, 8)
    if g.chroma_scaling_from_luma or g.cr_points:
        assert len(g.ar_coeffs_cr) == n_c
        for cv in g.ar_coeffs_cr:
            b.f(cv + 128, 8)
    b.f(g.ar_coeff_shift - 6, 2)
    b.f(g.grain_scale_shift, 2)
    if g.cb_points:
        b.f(g.cb_mult, 8)
        b.f(g.cb_luma_mult, 8)
        b.f(g.cb_offset, 9)
    if g.cr_points:
        b.f(g.cr_mult, 8)
        b.f(g.cr_luma_mult, 8)
        b.f(g.cr_offset, 9)
    b.bit(g.overlap_flag)
    b.bit(g.clip_to_restricted_range)


def _write_cdef_lr(b: BitWriter, seq: Sequence, fp: FrameParams):
    """cdef_params (spec 5.9.19) + lr_params (off)."""
    if seq.enable_cdef:
        b.f(fp.cdef_damping - 3, 2)
        if fp.cdef_strengths:
            n = len(fp.cdef_strengths)
            bits = max(n - 1, 0).bit_length()
            assert n == 1 << bits and bits <= 3, n
            b.f(bits, 2)
            for (yp, ys, up, us) in fp.cdef_strengths:
                b.f(yp, 4)
                b.f(min(ys, 3), 2)      # coded 3 means strength 4
                b.f(up, 4)
                b.f(min(us, 3), 2)
        else:
            b.f(0, 2)  # cdef_bits = 0 -> one strength, free per-SB
            b.f(fp.cdef_y_pri, 4)
            b.f(min(fp.cdef_y_sec, 3), 2)
            b.f(fp.cdef_uv_pri, 4)
            b.f(min(fp.cdef_uv_sec, 3), 2)
    # lr_params (spec 5.9.20): unit size fixed at 64 (lr_unit_shift 0)
    if seq.enable_restoration:
        uses_lr = any(t != 0 for t in fp.lr_types)
        uses_chroma_lr = any(t != 0 for t in fp.lr_types[1:])
        for t in fp.lr_types:
            b.f(t, 2)
        if uses_lr:
            b.bit(0)  # lr_unit_shift -> LoopRestorationSize = 64
            if seq.subsampling_x and seq.subsampling_y and uses_chroma_lr:
                b.bit(0)  # lr_uv_shift -> chroma unit 64 (in chroma px)


def write_inter_frame_header(seq: Sequence, fp: FrameParams, ti: TileInfo,
                             order_hint: int = 0,
                             refresh_flags: int = 0x01,
                             ref_idx: list | None = None,
                             show_frame: bool = True) -> BitWriter:
    """uncompressed_header for an INTER or SWITCH frame (single ref
    path, PRIMARY_REF_NONE, no superres, filters per fp).

    SWITCH frames (rav1e switch_frame_interval S-frames): spec 5.9.2
    implies error_resilient_mode=1, frame_size_override=1 (explicit
    dims, since error resilience forbids size-from-refs), and
    refresh_frame_flags=0xFF; we signal force_integer_mv=1 via
    allow_screen_content_tools so a decoder can splice streams.
    error_resilient INTER frames code each reference slot's order
    hint (fp.slot_order_hints, spec RefOrderHint conformance)."""
    is_switch = fp.frame_type == FrameType.SWITCH
    err = bool(fp.error_resilient) or is_switch
    int_mv = bool(fp.force_integer_mv) or is_switch
    b = BitWriter()
    b.bit(0)  # show_existing_frame
    b.f(int(fp.frame_type), 2)
    b.bit(1 if show_frame else 0)
    if not show_frame:
        b.bit(1)  # showable_frame (displayed later via show_existing)
    if not is_switch:
        b.bit(1 if err else 0)  # error_resilient_mode (SWITCH: implied)
    b.bit(fp.disable_cdf_update)
    # seq_force_screen_content_tools == SELECT: coded per frame; the
    # force_integer_mv flag only exists under screen content tools
    b.bit(1 if int_mv else 0)  # allow_screen_content_tools
    if int_mv:
        b.bit(1)  # force_integer_mv (seq SELECT)
    if not is_switch:
        b.bit(0)  # frame_size_override_flag (SWITCH: implied 1)
    b.f(order_hint & ((1 << seq.order_hint_bits) - 1), seq.order_hint_bits)
    if not err:
        b.f(7, 3)  # primary_ref_frame = PRIMARY_REF_NONE
    if not is_switch:
        b.f(refresh_flags, 8)  # SWITCH: implied 0xFF
    if err and seq.enable_order_hint:
        # error resilience: each reference slot's current order hint
        hints = fp.slot_order_hints or [0] * 8
        msk = (1 << seq.order_hint_bits) - 1
        for i in range(8):
            b.f(hints[i] & msk, seq.order_hint_bits)
    # frame_refs_short_signaling not used (enable_order_hint -> flag)
    if seq.enable_order_hint:
        b.bit(0)  # frame_refs_short_signaling
    ref_idx = ref_idx or [0] * 7
    for i in range(7):
        b.f(ref_idx[i], 3)
    if is_switch:
        # frame_size_override=1 with error_resilient=1: explicit dims
        # (frame_size_with_refs is forbidden under error resilience)
        b.f(seq.width - 1, seq.frame_width_bits)
        b.f(seq.height - 1, seq.frame_height_bits)
    # superres off; render size follows
    _write_render_size(b, seq, fp)
    if not int_mv:
        b.bit(0)  # allow_high_precision_mv (quarter-pel MVs)
    # interpolation filter: not switchable, EIGHTTAP_REGULAR
    b.bit(0)  # is_filter_switchable
    b.f(0, 2)  # interpolation_filter
    b.bit(0)  # is_motion_mode_switchable
    # use_ref_frame_mvs: only coded when seq enable_ref_frame_mvs (off)
    if not fp.disable_cdf_update:
        b.bit(1)  # disable_frame_end_update_cdf
    ti.write(b, fp)
    b.f(fp.base_q_idx, 8)
    b.delta_q(0)                # y dc
    b.delta_q(fp.delta_q_u_dc)  # u dc (v inherits: separate_uv off)
    b.delta_q(fp.delta_q_u_ac)  # u ac
    b.bit(0)  # using_qmatrix
    _write_segmentation(b, fp)
    if fp.base_q_idx > 0:
        b.bit(0)  # delta_q_present
    lf = fp.loop_filter_levels
    b.f(lf[0], 6)
    b.f(lf[1], 6)
    if lf[0] or lf[1]:
        b.f(lf[2], 6)
        b.f(lf[3], 6)
    b.f(fp.loop_filter_sharpness, 3)
    b.bit(0)  # loop_filter_delta_enabled
    _write_cdef_lr(b, seq, fp)
    b.bit(fp.tx_mode_select)
    b.bit(1 if fp.reference_select else 0)
    # skip_mode_params (spec 5.9.22): with reference_select and order
    # hints, skipModeAllowed depends on the refs' order hints relative
    # to this frame; when allowed, skip_mode_present is coded (0 here)
    if fp.reference_select and seq.enable_order_hint:
        bits = seq.order_hint_bits
        msk = (1 << bits) - 1
        half = 1 << (bits - 1)

        def rel(a, b):
            diff = (a - b) & msk
            return (diff & (half - 1)) - (diff & half)

        fwd_hint = bwd_hint = None
        for hint in (fp.ref_order_hints or []):
            d = rel(hint, order_hint)
            if d < 0:
                if fwd_hint is None or rel(hint, fwd_hint) > 0:
                    fwd_hint = hint
            elif d > 0:
                if bwd_hint is None or rel(hint, bwd_hint) < 0:
                    bwd_hint = hint
        allowed = fwd_hint is not None and bwd_hint is not None
        if fwd_hint is not None and bwd_hint is None:
            # second-closest forward ref also enables skip mode
            snd = None
            for hint in (fp.ref_order_hints or []):
                if rel(hint, fwd_hint) < 0:
                    if snd is None or rel(hint, snd) > 0:
                        snd = hint
            allowed = snd is not None
        if allowed:
            b.bit(0)  # skip_mode_present
    # allow_warped_motion: implied 0 (seq enable_warped_motion == 0)
    b.bit(fp.reduced_tx_set)
    # global_motion_params: is_global = 0 per ref
    for _ in range(7):
        b.bit(0)
    _write_film_grain(b, seq, fp, show_frame)
    return b


def interframe_packet(seq: Sequence, fp: FrameParams, ti: TileInfo,
                      tiles: list[bytes], order_hint: int,
                      refresh_flags: int = 0x01,
                      ref_idx: list | None = None,
                      show_frame: bool = True) -> bytes:
    hdr = write_inter_frame_header(seq, fp, ti, order_hint,
                                   refresh_flags, ref_idx, show_frame)
    return temporal_delimiter() + assemble_frame_obu(hdr, tiles, ti, fp)


def show_existing_packet(slot: int) -> bytes:
    """TD + FRAME_HEADER OBU displaying a previously decoded showable
    frame from reference slot `slot` (spec show_existing_frame)."""
    b = BitWriter()
    b.bit(1)           # show_existing_frame
    b.f(slot, 3)       # frame_to_show_map_idx
    b.trailing_bits()
    return temporal_delimiter() + obu(ObuType.FRAME_HEADER, b.bytes())


def obu(obu_type: ObuType, payload: bytes) -> bytes:
    """Wrap payload with an OBU header + uleb size."""
    hdr = bytes([(int(obu_type) << 3) | 0x02])  # has_size_field
    return hdr + uleb128(len(payload)) + payload


def temporal_delimiter() -> bytes:
    return obu(ObuType.TEMPORAL_DELIMITER, b"")


# -- metadata OBUs (spec 5.8; rav1e src/header.rs write_metadata_obu /
#    capi rav1e_config_set_content_light / set_mastering_display) ----

METADATA_TYPE_HDR_CLL = 1
METADATA_TYPE_HDR_MDCV = 2


def content_light_obu(max_cll: int, max_fall: int) -> bytes:
    """HDR content-light-level metadata OBU (spec 5.8.3): nit-valued
    MaxCLL / MaxFALL, both u16."""
    b = BitWriter()
    b.f(max_cll, 16)
    b.f(max_fall, 16)
    b.trailing_bits()
    return obu(ObuType.METADATA,
               uleb128(METADATA_TYPE_HDR_CLL) + b.bytes())


def mastering_display_obu(primaries, white_point,
                          max_luminance: float,
                          min_luminance: float) -> bytes:
    """HDR mastering-display-color-volume metadata OBU (spec 5.8.4).

    primaries: 3 (x, y) CIE chromaticities in R,G,B order as floats
    (coded 0.16 fixed, in the spec's G,B,R order); white_point: (x, y);
    luminances in nits (coded 24.8 / 18.14 fixed)."""
    def q16(v: float) -> int:
        return max(0, min(0xFFFF, round(v * (1 << 16))))

    b = BitWriter()
    r, g, bl = primaries
    for x, y in (g, bl, r):       # spec order: G, B, R
        b.f(q16(x), 16)
        b.f(q16(y), 16)
    b.f(q16(white_point[0]), 16)
    b.f(q16(white_point[1]), 16)
    b.f(max(0, min(0xFFFFFFFF, round(max_luminance * 256))), 32)
    b.f(max(0, min(0xFFFFFFFF, round(min_luminance * (1 << 14)))), 32)
    b.trailing_bits()
    return obu(ObuType.METADATA,
               uleb128(METADATA_TYPE_HDR_MDCV) + b.bytes())


def assemble_frame_obu(header: BitWriter, tiles: list[bytes],
                       ti: TileInfo, fp: FrameParams) -> bytes:
    """FRAME OBU = uncompressed header + tile group (spec 5.10/5.11)."""
    b = header
    # spec 5.10.1: frame_obu = frame_header + byte_alignment() +
    # tile_group_obu; the tile group header starts byte-aligned
    b.byte_align()
    if ti.n_tiles > 1:
        b.bit(0)  # tile_start_and_end_present_flag (must be 0 in OBU_FRAME)
        b.byte_align()
    body = bytearray(b.bytes())
    for i, t in enumerate(tiles):
        if i < len(tiles) - 1:
            body += (len(t) - 1).to_bytes(fp.tile_size_bytes, "little")
        body += t
    return obu(ObuType.FRAME, bytes(body))


def keyframe_packet(seq: Sequence, fp: FrameParams, ti: TileInfo,
                    tiles: list[bytes]) -> bytes:
    """One temporal unit: TD + sequence header + FRAME OBU."""
    hdr = write_frame_header(seq, fp, ti)
    return (temporal_delimiter() + obu(ObuType.SEQUENCE_HEADER, seq.write())
            + assemble_frame_obu(hdr, tiles, ti, fp))
