"""Speed presets.

Reference parity: rav1e src/api/config/speedsettings.rs
(SpeedSettings::from_preset, presets 0..10). Each preset maps to the
feature set the pipelines understand; lower = slower/better.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SpeedSettings:
    """Feature toggles derived from a speed preset (0..10)."""

    speed: int = 6
    # intra
    intra_modes: int = 13          # candidate luma modes
    angle_deltas: bool = True
    partition_split_rdo: bool = True
    partition_split8: bool = False  # 16->8 PARTITION_SPLIT RDO (inter)
    kf_split8: bool = False        # 16->8 PARTITION_SPLIT RDO (keyframes)
    rect_parts: bool = False       # HORZ/VERT partition RDO (keyframes)
    cfl: bool = True
    tx_search: bool = True         # intra TX-type RDO (rav1e rdo_tx_decision)
    # inter
    search_px: int = 16            # full-pel search radius
    subpel: bool = True
    satd_subpel: bool = False      # SATD distortion in subpel descent
    mv_refine_16: bool = False     # per-16 subpel ME in split RDO
    intra_in_inter: bool = False   # intra candidates in inter frames
    b64_merge: bool = False        # PARTITION_NONE at 64x64 (TX_64X64)
    multiref: bool = False         # LAST + GOLDEN(=keyframe) P frames
    # in-loop filters
    cdef_auto: bool = True
    lr: bool = False
    # analysis
    scene_mode: str = "fast"       # rav1e fast_scene_detection flag

    @classmethod
    def from_preset(cls, speed: int) -> "SpeedSettings":
        s = max(0, min(10, speed))
        return cls(
            speed=s,
            intra_modes=13 if s <= 6 else (7 if s <= 8 else 1),
            angle_deltas=s <= 6,
            partition_split_rdo=s <= 7,
            # rav1e partition_range reaches 8x8 from speed <= 6
            partition_split8=s <= 6,
            kf_split8=s <= 6,
            # rav1e non_square_partition: low speeds only
            rect_parts=s <= 3,
            cfl=s <= 6,
            tx_search=s <= 6,
            search_px=24 if s <= 2 else (16 if s <= 6 else 8),
            subpel=s <= 8,
            satd_subpel=s <= 6,    # rav1e use_satd_subpel (speeds <=6)
            mv_refine_16=s <= 4,   # cheap {parent,0} per-16 MVs above
            intra_in_inter=s <= 6,
            b64_merge=s <= 6,
            # rav1e multiref (speeds <= 7): we gate at <= 5 because the
            # multi-ref step forgoes split/b64/intra RDO (see
            # encode_pframe2_tpu) — only worth it where the cleaner
            # keyframe reference buys more than those tools
            multiref=s <= 5,
            cdef_auto=s <= 8,
            lr=s <= 3,
            # rav1e: standard (cost-based) scene detection below
            # speed 10's fast_scene_detection
            scene_mode="standard" if s <= 5 else "fast",
        )
