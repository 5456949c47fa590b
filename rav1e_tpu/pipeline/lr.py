"""Frame-level loop-restoration decision pass (all planes).

Reference parity: rav1e src/lrf.rs (RestorationState) + the LRF leg
of src/rdo.rs::rdo_loop_decision, restructured as a whole-frame pass
after CDEF (SURVEY §7.0 allows this: same final stream semantics).
Shared by the intra and inter reference pipelines.
"""

from __future__ import annotations

import os

import numpy as np

from rav1e_tpu.ops.ref.lrf import (count_units, search_lr_plane,
                                   sgr_filter_unit, wiener_filter_unit)


def apply_lr_frame(frame_rec, srcs, tw, bit_depth: int,
                   ss_x: int, ss_y: int,
                   chroma_lr: bool = True):
    """Search + apply restoration per plane on the (post-CDEF) recon.

    Mutates frame_rec in place and attaches the unit grids to the
    tile writer (tw.lr_data). Returns the per-plane frame restoration
    types for the frame header (fp.lr_types)."""
    force = os.environ.get("RAV1E_TPU_LR_FORCE")  # debug hook
    if force:
        parts = force.split(",")
        kind = (("S", int(parts[1]), int(parts[2]), int(parts[3]))
                if parts[0] == "S" else
                ("W", tuple(map(int, parts[1:4])),
                 tuple(map(int, parts[4:7]))))
        rec_y = frame_rec[0]
        ph, pw = rec_y.shape
        n_ur = count_units(ph, 64)
        n_uc = count_units(pw, 64)
        grid = [[kind] * n_uc for _ in range(n_ur)]
        filtered = rec_y.copy()
        for ur in range(n_ur):
            y0 = 0 if ur == 0 else ur * 64 - 8
            y1 = ph if ur == n_ur - 1 else (ur + 1) * 64 - 8
            for uc in range(n_uc):
                x0 = uc * 64
                x1 = pw if uc == n_uc - 1 else (uc + 1) * 64
                if kind[0] == "S":
                    f = sgr_filter_unit(rec_y, y0, x0, y1 - y0,
                                        x1 - x0, kind[1], kind[2],
                                        kind[3], bd=bit_depth)
                else:
                    f = wiener_filter_unit(rec_y, y0, x0, y1 - y0,
                                           x1 - x0, kind[1], kind[2],
                                           bd=bit_depth)
                filtered[y0:y1, x0:x1] = f
        frame_rec[0][:] = filtered
        tw.lr_data = {"types": [1, 0, 0], "units": {0: grid}}
        return (1, 0, 0)

    # the per-unit candidate search (Wiener LS/preset taps + SGR set
    # ladder) runs batched on device for 8-bit planes (ops/tpu/lrf.py;
    # VERDICT r2 #7 — the host numpy pass cost a full CPU frame pass
    # inside the TPU pipeline); >8-bit falls back to the reference
    # search (box-sum cumsums overflow int32 lanes above 8-bit)
    use_tpu = (bit_depth == 8
               and not os.environ.get("RAV1E_TPU_LR_HOST"))
    if use_tpu:
        from rav1e_tpu.ops.tpu.lrf import search_lr_plane_tpu
    types = [0, 0, 0]
    units: dict = {}
    for pi in range(3):
        if pi > 0 and not chroma_lr:
            break
        src_p = np.asarray(srcs[pi]).astype(np.int64)
        search = search_lr_plane_tpu if use_tpu else search_lr_plane
        grid, filtered, used = search(
            frame_rec[pi], src_p, bd=bit_depth,
            ss=0 if pi == 0 else ss_y, chroma=pi > 0)
        if used:
            types[pi] = 1          # RESTORE_SWITCHABLE
            units[pi] = grid
            frame_rec[pi][:] = filtered
    if any(types):
        tw.lr_data = {"types": types, "units": units}
    return tuple(types)
