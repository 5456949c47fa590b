"""Default CDF tables and per-tile adaptive CDF state.

Reference parity: rav1e src/context/cdf_context.rs (CDFContext holds
every AV1 syntax CDF; per-tile copies start from frame-initial values;
checkpoint/rollback used inside RDO).

Tables come from entropy/tables/default_cdfs.npz (see
tools/extract_tables.py). Runtime representation: plain Python lists of
ints per CDF record — [v0..v_{n-2}, 0, counter] — matching what
rav1e_tpu.entropy.ec expects (n+1 entries for an n-symbol alphabet).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

_NPZ = Path(__file__).resolve().parent / "tables" / "default_cdfs.npz"


@lru_cache(maxsize=1)
def tables() -> dict:
    """Raw default tables as numpy int32 arrays ([..., nsym] layout,
    last column is the 0 terminator; counter slot NOT included)."""
    with np.load(_NPZ) as z:
        return {k: z[k] for k in z.files}


def qctx_for_qidx(base_q_idx: int) -> int:
    """Coefficient CDF q-context bucket (spec init_coeff_cdfs)."""
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3


def _to_lists(arr: np.ndarray):
    """Recursively convert [..., nsym] int32 array into nested lists of
    mutable CDF records with a trailing counter slot appended."""
    if arr.ndim == 1:
        return list(int(v) for v in arr) + [0]
    return [_to_lists(a) for a in arr]


class TileCDFs:
    """Mutable CDF set for one tile. Attribute per table family.

    Records adapt in place via ec.update_cdf during encoding; a fresh
    instance (from frame-initial defaults) is created per tile, as the
    spec requires.
    """

    def __init__(self, base_q_idx: int):
        t = tables()
        q = qctx_for_qidx(base_q_idx)
        self.q = q
        # mode/partition tables
        self.partition_8 = _to_lists(t["partition_8"])
        self.partition_mid = _to_lists(t["partition_mid"])  # [3(16/32/64 sz)][4]
        self.partition_128 = _to_lists(t["partition_128"])
        self.kf_y_mode = _to_lists(t["kf_y_mode"])
        self.y_mode = _to_lists(t["y_mode"])
        self.uv_mode = _to_lists(t["uv_mode"])
        self.uv_mode_cfl = _to_lists(t["uv_mode_cfl"])
        self.angle_delta = _to_lists(t["angle_delta"])
        self.skip = _to_lists(t["skip"])
        self.cfl_sign = _to_lists(t["cfl_sign"])
        self.cfl_alpha = _to_lists(t["cfl_alpha"])
        self.seg_tree = _to_lists(t["seg_tree"])
        self.tx_size_8 = _to_lists(t["tx_size_8"])
        self.tx_size = _to_lists(t["tx_size"])
        self.intra_ext_tx1 = _to_lists(t["intra_ext_tx1"])
        self.intra_ext_tx2 = _to_lists(t["intra_ext_tx2"])
        self.inter_ext_tx1 = _to_lists(t["inter_ext_tx1"])
        self.inter_ext_tx2 = _to_lists(t["inter_ext_tx2"])
        self.inter_ext_tx3 = _to_lists(t["inter_ext_tx3"])
        # inter mode tables
        self.intra_inter = _to_lists(t["intra_inter"])
        self.newmv = _to_lists(t["newmv"])
        self.zeromv = _to_lists(t["zeromv"])
        self.refmv = _to_lists(t["refmv"])
        self.drl = _to_lists(t["drl"])
        self.single_ref = _to_lists(t["single_ref"])
        # compound reference / mode tables
        self.comp_inter = _to_lists(t["comp_inter"])
        self.comp_ref_type = _to_lists(t["comp_ref_type"])
        self.comp_ref = _to_lists(t["comp_ref"])
        self.comp_bwdref = _to_lists(t["comp_bwdref"])
        self.inter_compound_mode = _to_lists(t["inter_compound_mode"])
        # MV coding (nmv_context): component 0 = row, 1 = col
        self.mv_joint = _to_lists(t["mv_joint"])
        self.mv_comp = []
        for ci in (0, 1):
            p = f"mv{ci}_"
            self.mv_comp.append({
                "sign": _to_lists(t[p + "sign"]),
                "classes": _to_lists(t[p + "classes"]),
                "class0": _to_lists(t[p + "class0"]),
                "class0_fr": _to_lists(t[p + "class0_fr"]),
                "class0_hp": _to_lists(t[p + "class0_hp"]),
                "bits": _to_lists(t[p + "bits"]),
                "fr": _to_lists(t[p + "fr"]),
                "hp": _to_lists(t[p + "hp"]),
            })
        # loop restoration (defaults live as .text mov-immediates in
        # the libaom build, matching the libaom source constants:
        # AOM_CDF2(11570), AOM_CDF2(16855), AOM_CDF3(9413, 22581))
        self.wiener_restore = [21198, 0, 0]
        self.sgrproj_restore = [15913, 0, 0]
        self.switchable_restore = [23355, 10187, 0, 0]
        # coefficient tables (q-bucketed)
        self.txb_skip = _to_lists(t["txb_skip"][q])
        self.eob_pt = {
            16: _to_lists(t["eob_pt_16"][q]),
            32: _to_lists(t["eob_pt_32"][q]),
            64: _to_lists(t["eob_pt_64"][q]),
            128: _to_lists(t["eob_pt_128"][q]),
            256: _to_lists(t["eob_pt_256"][q]),
            512: _to_lists(t["eob_pt_512"][q]),
            1024: _to_lists(t["eob_pt_1024"][q]),
        }
        self.eob_hi_bit = _to_lists(t["eob_hi_bit"][q])
        self.coeff_base_eob = _to_lists(t["coeff_base_eob"][q])
        self.coeff_base = _to_lists(t["coeff_base"][q])
        self.coeff_br = _to_lists(t["coeff_br"][q])
        self.dc_sign = _to_lists(t["dc_sign"][q])
