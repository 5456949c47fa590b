"""Inter-frame syntax: ref-MV stack, mode contexts, block writing.

Reference parity: rav1e src/context/block_unit.rs (mv_stack
construction, SURVEY A.4 asserts), src/encoder.rs inter block coding.
Context semantics follow libaom mvref_common.c / dav1d refmvs.c; the
decode oracles arbitrate every detail.

Current scope (M3a): single reference (LAST), GLOBALMV/NEARESTMV/
NEWMV-ready stack scaffolding, zero-MV coding path. Temporal MVs are
disabled at the sequence level, so ZeroMvContext stays 0 (the spec only
updates it in the temporal scan).

All context derivations here are oracle-verified: GOP streams decode
bit-exactly on BOTH dav1d and libaom (tests/test_inter_conformance.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rav1e_tpu.core.constants import BlockSize, PredictionMode

LAST_FRAME = 1  # spec ref frame enum (INTRA=0, LAST=1, ...)


@dataclass
class InterBlockInfo:
    """Per-MI info the stack/context derivations need."""

    is_inter: bool = False
    ref: int = 0          # 0 when intra; LAST_FRAME.. when inter
    mode: PredictionMode = PredictionMode.DC_PRED
    mv: tuple = (0, 0)    # (row, col) in 1/8 pel


class InterCtx:
    """Tile-level grids for inter context derivation."""

    def __init__(self, mi_rows: int, mi_cols: int,
                 ref_sign_bias: dict | None = None):
        self.mi_rows = mi_rows
        self.mi_cols = mi_cols
        # RefFrameSignBias per ref enum (True = backward ref); drives
        # the sign flip in the extra-candidate search (spec 7.10.2.12)
        self.ref_sign_bias = ref_sign_bias or {}
        self.is_inter = np.zeros((mi_rows, mi_cols), bool)
        self.ref = np.zeros((mi_rows, mi_cols), np.int8)
        self.mode = np.zeros((mi_rows, mi_cols), np.int16)
        self.mv = np.zeros((mi_rows, mi_cols, 2), np.int32)
        self.bw4 = np.zeros((mi_rows, mi_cols), np.int16)
        self.bh4 = np.zeros((mi_rows, mi_cols), np.int16)

    def set_block(self, r, c, bsize: BlockSize, info: InterBlockInfo):
        bh, bw = bsize.height_mi, bsize.width_mi
        self.is_inter[r:r + bh, c:c + bw] = info.is_inter
        self.ref[r:r + bh, c:c + bw] = info.ref
        self.mode[r:r + bh, c:c + bw] = int(info.mode)
        self.mv[r:r + bh, c:c + bw] = info.mv
        self.bw4[r:r + bh, c:c + bw] = bw
        self.bh4[r:r + bh, c:c + bw] = bh

    # ---- contexts ----------------------------------------------------------

    def intra_inter_ctx(self, r, c) -> int:
        has_a, has_l = r > 0, c > 0
        if has_a and has_l:
            a_int = not self.is_inter[r - 1, c]
            l_int = not self.is_inter[r, c - 1]
            return 3 if (a_int and l_int) else int(a_int or l_int)
        if has_a or has_l:
            nb_int = (not self.is_inter[r - 1, c]) if has_a \
                else (not self.is_inter[r, c - 1])
            return 2 * int(nb_int)
        return 0

    def _neighbor_ref_counts(self, r, c) -> np.ndarray:
        counts = np.zeros(8, np.int32)
        if r > 0 and self.is_inter[r - 1, c]:
            counts[self.ref[r - 1, c]] += 1
        if c > 0 and self.is_inter[r, c - 1]:
            counts[self.ref[r, c - 1]] += 1
        return counts

    def single_ref_ctx(self, r, c, pos: int) -> int:
        """Context for single_ref_pN (pos 0 == p1). Mirrors libaom
        get_pred_context_single_ref_pN count comparisons."""
        cnt = self._neighbor_ref_counts(r, c)
        groups = {
            0: (cnt[1] + cnt[2] + cnt[3] + cnt[4],
                cnt[5] + cnt[6] + cnt[7]),       # p1: fwd vs bwd
            1: (cnt[5] + cnt[6], cnt[7]),        # p2: BWD/ALT2 vs ALT
            2: (cnt[1] + cnt[2], cnt[3] + cnt[4]),  # p3
            3: (cnt[1], cnt[2]),                 # p4: LAST vs LAST2
            4: (cnt[3], cnt[4]),                 # p5: LAST3 vs GOLDEN
            5: (cnt[5], cnt[6]),                 # p6: BWD vs ALT2
        }
        a, b = groups[pos]
        return 1 if a == b else (0 if a < b else 2)

    def find_mv_stack(self, r, c, bsize: BlockSize, ref: int,
                      allow_hp: bool = False):
        """Build the ref-MV stack + mode contexts (spec 7.10.2, no
        temporal/compound). Returns (stack, mctx) with mctx keys:
        new/zero/ref contexts, n_found, drl_ctx[2], pred_mv."""
        bw4, bh4 = bsize.width_mi, bsize.height_mi
        stack: list = []  # [mv, weight]
        newmv_count = 0
        REF_CAT = 640  # REF_CAT_LEVEL

        def lower(mv):
            rr, cc = mv
            if not allow_hp:
                if rr & 1:
                    rr += 1 if rr < 0 else -1
                if cc & 1:
                    cc += 1 if cc < 0 else -1
            return (rr, cc)

        def add_cand(rr, cc, weight, count_newmv=True):
            nonlocal newmv_count
            if not (0 <= rr < self.mi_rows and 0 <= cc < self.mi_cols):
                return False
            if not self.is_inter[rr, cc] or self.ref[rr, cc] != ref:
                return False
            mv = lower((int(self.mv[rr, cc, 0]), int(self.mv[rr, cc, 1])))
            for ent in stack:
                if ent[0] == mv:
                    ent[1] += weight
                    break
            else:
                if len(stack) < 8:
                    stack.append([mv, weight])
            if count_newmv and self.mode[rr, cc] == int(PredictionMode.NEWMV):
                newmv_count += 1
            return True

        def scan_row(delta, close):
            rr = r + delta
            if rr < 0:
                return False
            end = min(bw4, self.mi_cols - c)
            found = False
            i = 0
            while i < end:
                cc = c + i
                ln = max(1, min(int(self.bw4[rr, cc]), bw4))
                if not close:
                    ln = max(ln, 2)  # outer rows step >= 8x8
                if add_cand(rr, cc, 2 * ln, count_newmv=close):
                    found = True
                i += ln
            return found

        def scan_col(delta, close):
            cc = c + delta
            if cc < 0:
                return False
            end = min(bh4, self.mi_rows - r)
            found = False
            i = 0
            while i < end:
                rr = r + i
                ln = max(1, min(int(self.bh4[rr, cc]), bh4))
                if not close:
                    ln = max(ln, 2)
                if add_cand(rr, cc, 2 * ln, count_newmv=close):
                    found = True
                i += ln
            return found

        # ---- close scans (these feed nearest_match + newmv_count) ----
        found_row = scan_row(-1, True)
        found_col = scan_col(-1, True)
        tr = False
        if r > 0 and c + bw4 < self.mi_cols and self._has_tr(r, c, bsize):
            tr = add_cand(r - 1, c + bw4, 4)
        nearest_match = int(found_row or tr) + int(found_col)
        n_nearest = len(stack)
        for ent in stack:
            ent[1] += REF_CAT
        # (temporal scan disabled at sequence level)
        # top-left point, then outer rows/cols (none count newmv)
        tl = False
        if r > 0 and c > 0:
            tl = add_cand(r - 1, c - 1, 4, count_newmv=False)
        far_row = far_col = False
        for idx in (3, 5):
            if r - idx >= 0:
                far_row |= scan_row(-idx, False)
            if c - idx >= 0:
                far_col |= scan_col(-idx, False)
        total_match = (int(found_row or tr or tl or far_row)
                       + int(found_col or far_col))
        # mode contexts (libaom setup_ref_mv_list switch)
        new_ctx = ref_ctx = 0
        if nearest_match == 0:
            if total_match >= 1:
                new_ctx = 1
            ref_ctx = 1 if total_match == 1 else (2 if total_match >= 2
                                                  else 0)
        elif nearest_match == 1:
            new_ctx = 2 if newmv_count > 0 else 3
            ref_ctx = 3 if total_match == 1 else 4
        else:
            new_ctx = 4 if newmv_count > 0 else 5
            ref_ctx = 5
        # sort: nearest segment then outer segment, both desc by weight
        # (stable bubble passes, matching the spec's sort)
        stack[:n_nearest] = sorted(stack[:n_nearest], key=lambda e: -e[1])
        stack[n_nearest:] = sorted(stack[n_nearest:], key=lambda e: -e[1])
        # extra search (spec 7.10.2.12): when fewer than 2 candidates,
        # different-ref neighbors along row -1 / col -1 contribute with
        # a sign flip when their RefFrameSignBias differs from ours
        if len(stack) < 2:
            my_bias = self.ref_sign_bias.get(ref, False)

            def add_extra(rr, cc):
                if len(stack) >= 2:
                    return
                if not (0 <= rr < self.mi_rows and 0 <= cc < self.mi_cols):
                    return
                if not self.is_inter[rr, cc]:
                    return
                cref = int(self.ref[rr, cc])
                mv = (int(self.mv[rr, cc, 0]), int(self.mv[rr, cc, 1]))
                if self.ref_sign_bias.get(cref, False) != my_bias:
                    mv = (-mv[0], -mv[1])
                mv = lower(mv)
                for ent in stack:
                    if ent[0] == mv:
                        return
                stack.append([mv, 2])

            if r > 0:
                i = 0
                end = min(bw4, self.mi_cols - c)
                while i < end and len(stack) < 2:
                    ln = max(1, min(int(self.bw4[r - 1, c + i]), bw4))
                    add_extra(r - 1, c + i)
                    i += ln
            if c > 0:
                i = 0
                end = min(bh4, self.mi_rows - r)
                while i < end and len(stack) < 2:
                    ln = max(1, min(int(self.bh4[r + i, c - 1]), bh4))
                    add_extra(r + i, c - 1)
                    i += ln
        n_found = len(stack)
        # pad with the global mv (identity => (0,0)); count unchanged
        while len(stack) < 2:
            stack.append([(0, 0), 0])
        drl_ctx = []
        for idx in range(3):
            w0 = stack[idx][1] if idx < len(stack) else 0
            w1 = stack[idx + 1][1] if idx + 1 < len(stack) else 0
            if w0 >= REF_CAT and w1 >= REF_CAT:
                drl_ctx.append(0)
            elif w0 >= REF_CAT:
                drl_ctx.append(1)
            elif w1 < REF_CAT:
                drl_ctx.append(2)
            else:
                drl_ctx.append(0)
        return stack, {"new": new_ctx, "zero": 0, "ref": ref_ctx,
                       "n_found": n_found, "drl_ctx": drl_ctx,
                       "pred_mv": lower(tuple(stack[0][0]))}

    def _has_tr(self, r, c, bsize: BlockSize) -> bool:
        """Top-right availability for the uniform grids we emit
        (sub-blocks of 64x64 SBs in Z order)."""
        bw = bsize.width_mi
        sb_r, sb_c = r % 16, c % 16
        if sb_r == 0:
            return True  # top row of SB: above-right SB row decoded
        # bottom half: available only when the quadrant to the upper
        # right is within the same SB (left column of a split)
        return sb_c + bw < 16
