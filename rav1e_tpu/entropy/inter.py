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


def _comp_mode_ctx_cell(feat):
    """Compound mode symbol context from the (pair-)match counts.

    feat = (closeMatches, totalMatches, newMv>0, ...). Every reachable
    cell was brute-forced against dav1d AND libaom (the solver in the
    compound conformance work):
      close == 0            -> Min(total, 1)
      close == 1, total 1   -> 3 + (newmv == 0)
      close == 1, total 2   -> 5 + (newmv == 0)
      close == 2            -> Min(7, 7 + (newmv == 0))"""
    cp, tp, nm = feat[0], feat[1], feat[2]
    if cp == 0:
        return min(tp, 1)
    base = (3 if tp == 1 else 5) if cp == 1 else 7
    return min(7, base + (0 if nm else 1))


@dataclass
class InterBlockInfo:
    """Per-MI info the stack/context derivations need."""

    is_inter: bool = False
    ref: int = 0          # 0 when intra; LAST_FRAME.. when inter
    mode: PredictionMode = PredictionMode.DC_PRED
    mv: tuple = (0, 0)    # (row, col) in 1/8 pel
    ref2: int = 0         # second ref (compound); 0 = NONE
    mv2: tuple = (0, 0)


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
        self.ref2 = np.zeros((mi_rows, mi_cols), np.int8)
        self.mv2 = np.zeros((mi_rows, mi_cols, 2), np.int32)
        self.bw4 = np.zeros((mi_rows, mi_cols), np.int16)
        self.bh4 = np.zeros((mi_rows, mi_cols), np.int16)

    def set_block(self, r, c, bsize: BlockSize, info: InterBlockInfo):
        bh, bw = bsize.height_mi, bsize.width_mi
        self.is_inter[r:r + bh, c:c + bw] = info.is_inter
        self.ref[r:r + bh, c:c + bw] = info.ref
        self.mode[r:r + bh, c:c + bw] = int(info.mode)
        self.mv[r:r + bh, c:c + bw] = info.mv
        self.ref2[r:r + bh, c:c + bw] = info.ref2
        self.mv2[r:r + bh, c:c + bw] = info.mv2
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
        for rr, cc in ((r - 1, c), (r, c - 1)):
            if rr < 0 or cc < 0 or not self.is_inter[rr, cc]:
                continue
            counts[self.ref[rr, cc]] += 1
            if self.ref2[rr, cc] > 0:
                counts[self.ref2[rr, cc]] += 1
        return counts

    # -- compound reference contexts (libaom pred_common.c semantics) --------

    def _nb(self, r, c):
        """(avail, is_inter, is_comp, ref0_backward, ref0) for the
        above and left neighbors."""
        out = []
        for rr, cc in ((r - 1, c), (r, c - 1)):
            if rr < 0 or cc < 0:
                out.append(None)
                continue
            out.append((bool(self.is_inter[rr, cc]),
                        self.ref2[rr, cc] > 0,
                        self.ref[rr, cc] >= 5,
                        int(self.ref[rr, cc])))
        return out

    def comp_mode_ctx(self, r, c) -> int:
        """Context for the single-vs-compound bit (libaom
        get_reference_mode_context): 5 contexts from the neighbors'
        single/comp state and forward/backward ref direction."""
        a, l = self._nb(r, c)
        if a is not None and l is not None:
            a_int, a_comp, a_bwd, _ = a
            l_int, l_comp, l_bwd, _ = l
            if not a_comp and not l_comp:
                return int(a_bwd) ^ int(l_bwd)
            if not a_comp:
                return 2 + int(a_bwd or not a_int)
            if not l_comp:
                return 2 + int(l_bwd or not l_int)
            return 4
        e = a if a is not None else l
        if e is not None:
            e_int, e_comp, e_bwd, _ = e
            return 3 if e_comp else int(e_bwd)
        return 1

    def comp_ref_type_ctx(self, r, c) -> int:
        """Context for comp_ref_type (UNIDIR vs BIDIR); this encoder
        only emits BIDIR compound, so the unidir-neighbor branches
        collapse (has_uni_comp_refs == 0 for coded blocks)."""
        a, l = self._nb(r, c)
        if a is not None and l is not None:
            a_int, a_comp = a[0], a[1]
            l_int, l_comp = l[0], l[1]
            if not a_int and not l_int:
                return 2
            if not a_int or not l_int:
                e = l if not a_int else a
                return 1 if e[1] else 2
            a_bwd, l_bwd = a[2], l[2]
            if not a_comp and not l_comp:
                return 1 + 2 * int(not (a_bwd ^ l_bwd))
            if not a_comp or not l_comp:
                return 1
            return 0
        e = a if a is not None else l
        if e is not None:
            if not e[0]:
                return 2
            # inter edge: single -> 2, comp -> 4 * has_uni_comp_refs
            # (bidir == 0; oracle-verified)
            return 0 if e[1] else 2
        return 2

    def comp_ref_ctx(self, r, c, pos: int) -> int:
        """Contexts for comp_ref_p/p1/p2 (pos 0..2) and
        comp_bwdref_p/p1 (pos 3..4): neighbor ref-count comparisons
        with the same lt/eq/gt pattern as single_ref."""
        cnt = self._neighbor_ref_counts(r, c)
        groups = {
            0: (cnt[1] + cnt[2], cnt[3] + cnt[4]),  # LAST12 vs L3+GLD
            1: (cnt[1], cnt[2]),                    # LAST vs LAST2
            2: (cnt[3], cnt[4]),                    # LAST3 vs GOLDEN
            3: (cnt[5] + cnt[6], cnt[7]),           # BWD+ALT2 vs ALT
            4: (cnt[5], cnt[6]),                    # BWD vs ALT2
        }
        a, b = groups[pos]
        return 1 if a == b else (0 if a < b else 2)

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

    _NEWMV_MODES = {int(PredictionMode.NEWMV),
                    int(PredictionMode.NEW_NEWMV),
                    int(PredictionMode.NEAREST_NEWMV),
                    int(PredictionMode.NEW_NEARESTMV),
                    int(PredictionMode.NEAR_NEWMV),
                    int(PredictionMode.NEW_NEARMV)}

    def find_mv_stack(self, r, c, bsize: BlockSize, ref,
                      allow_hp: bool = False,
                      force_integer_mv: bool = False):
        """Build the ref-MV stack + mode contexts (spec 7.10.2, no
        temporal scan). `ref` is an int (single prediction) or a
        (fwd, bwd) pair (compound). Stack entries are [mv, weight]
        for single, [(mv0, mv1), weight] for compound. Returns
        (stack, mctx) with mctx keys: new/zero/ref contexts, n_found,
        drl_ctx[3], pred_mv (single) / pred_mvs (compound)."""
        bw4, bh4 = bsize.width_mi, bsize.height_mi
        comp = isinstance(ref, (tuple, list))
        refs = tuple(ref) if comp else (int(ref),)
        stack: list = []  # [mv | (mv0, mv1), weight]
        newmv_count = 0
        REF_CAT = 640  # REF_CAT_LEVEL

        def lower(mv):
            rr, cc = mv
            if force_integer_mv:
                # spec integer_mv_precision: round to nearest
                # whole-pel (ties away from zero stay at the lower)
                def rnd(v):
                    # C-style remainder (libaom integer_mv_precision)
                    mod = v % 8 if v >= 0 else -((-v) % 8)
                    if mod:
                        v -= mod
                        if abs(mod) > 4:
                            v += 8 if mod > 0 else -8
                    return v
                return (rnd(rr), rnd(cc))
            if not allow_hp:
                if rr & 1:
                    rr += 1 if rr < 0 else -1
                if cc & 1:
                    cc += 1 if cc < 0 else -1
            return (rr, cc)

        def _cand_refs(rr, cc):
            return (int(self.ref[rr, cc]), int(self.ref2[rr, cc]))

        def _cand_mv(rr, cc, j):
            g = self.mv if j == 0 else self.mv2
            return (int(g[rr, cc, 0]), int(g[rr, cc, 1]))

        def _push(key, weight):
            for ent in stack:
                if ent[0] == key:
                    ent[1] += weight
                    return
            if len(stack) < 8:
                stack.append([key, weight])

        def add_cand(rr, cc, weight, count_newmv=True):
            nonlocal newmv_count
            if not (0 <= rr < self.mi_rows and 0 <= cc < self.mi_cols):
                return False
            if not self.is_inter[rr, cc]:
                return False
            crefs = _cand_refs(rr, cc)
            matched = False
            if comp:
                # compound: the stack needs the exact pair; loose
                # (partial) matches are tracked separately per shared
                # direction for the mode-context feature key
                nonlocal loose_hit, loose_bwd_hit, loose_newmv
                if crefs == refs:
                    key = (lower(_cand_mv(rr, cc, 0)),
                           lower(_cand_mv(rr, cc, 1)))
                    _push(key, weight)
                    matched = True
                    if (count_newmv and int(self.mode[rr, cc])
                            in self._NEWMV_MODES):
                        nonlocal newmv_count
                        newmv_count += 1
                elif crefs[0] in refs or crefs[1] in refs:
                    loose_hit = True
                    if refs[1] in crefs:
                        loose_bwd_hit = True
                    if (count_newmv and int(self.mode[rr, cc])
                            in self._NEWMV_MODES):
                        loose_newmv += 1
                return matched
            for j in (0, 1):
                if crefs[j] == refs[0]:
                    _push(lower(_cand_mv(rr, cc, j)), weight)
                    matched = True
            if not matched:
                return False
            if count_newmv and int(self.mode[rr, cc]) in self._NEWMV_MODES:
                newmv_count += 1
            return True

        loose_hit = False       # scanned cand sharing >=1 ref (no pair)
        loose_bwd_hit = False   # ... sharing the backward ref
        loose_newmv = 0         # NEW-family modes among loose cands

        def scan_row(delta, close):
            nonlocal loose_hit, loose_bwd_hit, loose_row, loose_row_bwd
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
                loose_hit = False
                loose_bwd_hit = False
                if add_cand(rr, cc, 2 * ln, count_newmv=close):
                    found = True
                loose_row = loose_row or loose_hit
                loose_row_bwd = loose_row_bwd or loose_bwd_hit
                i += ln
            return found

        def scan_col(delta, close):
            nonlocal loose_hit, loose_bwd_hit, loose_col, loose_col_bwd
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
                loose_hit = False
                loose_bwd_hit = False
                if add_cand(rr, cc, 2 * ln, count_newmv=close):
                    found = True
                loose_col = loose_col or loose_hit
                loose_col_bwd = loose_col_bwd or loose_bwd_hit
                i += ln
            return found

        # ---- close scans (these feed nearest_match + newmv_count) ----
        loose_row = loose_col = False
        loose_row_bwd = loose_col_bwd = False
        found_row = scan_row(-1, True)
        found_col = scan_col(-1, True)
        tr = False
        if r > 0 and c + bw4 < self.mi_cols and self._has_tr(r, c, bsize):
            loose_hit = False
            loose_bwd_hit = False
            tr = add_cand(r - 1, c + bw4, 4)
            loose_row = loose_row or loose_hit
            loose_row_bwd = loose_row_bwd or loose_bwd_hit
        nearest_match = int(found_row or tr) + int(found_col)
        n_nearest = len(stack)
        for ent in stack:
            ent[1] += REF_CAT
        # (temporal scan disabled at sequence level)
        # top-left point, then outer rows/cols (none count newmv)
        tl = False
        if r > 0 and c > 0:
            loose_hit = False
            loose_bwd_hit = False
            tl = add_cand(r - 1, c - 1, 4, count_newmv=False)
            loose_row = loose_row or loose_hit
            loose_row_bwd = loose_row_bwd or loose_bwd_hit
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
        # different-ref neighbors along row -1 / col -1 contribute.
        # Single: each usable mv (sign-flipped when RefFrameSignBias
        # differs) appends directly. Compound: per-list RefId/RefDiff
        # collection, then combined pairs padded with the global mv.
        if len(stack) < 2:
            if comp:
                ref_id = [[], []]
                ref_diff = [[], []]

                def add_extra(rr, cc):
                    if not self.is_inter[rr, cc]:
                        return
                    crefs = _cand_refs(rr, cc)
                    for j in (0, 1):
                        cref = crefs[j]
                        if cref <= 0:
                            continue
                        cmv = _cand_mv(rr, cc, j)
                        for li in (0, 1):
                            if cref == refs[li]:
                                if len(ref_id[li]) < 2:
                                    ref_id[li].append(cmv)
                            elif len(ref_diff[li]) < 2:
                                mv = cmv
                                if (self.ref_sign_bias.get(cref, False)
                                        != self.ref_sign_bias.get(
                                            refs[li], False)):
                                    mv = (-mv[0], -mv[1])
                                ref_diff[li].append(mv)
            else:
                my_bias = self.ref_sign_bias.get(refs[0], False)

                def add_extra(rr, cc):
                    if not self.is_inter[rr, cc]:
                        return
                    crefs = _cand_refs(rr, cc)
                    for j in (0, 1):
                        if len(stack) >= 2 or crefs[j] <= 0:
                            continue
                        mv = _cand_mv(rr, cc, j)
                        if (self.ref_sign_bias.get(crefs[j], False)
                                != my_bias):
                            mv = (-mv[0], -mv[1])
                        mv = lower(mv)
                        if all(ent[0] != mv for ent in stack):
                            stack.append([mv, 2])

            if r > 0:
                i = 0
                end = min(bw4, self.mi_cols - c)
                while i < end and (comp or len(stack) < 2):
                    ln = max(1, min(int(self.bw4[r - 1, c + i]), bw4))
                    add_extra(r - 1, c + i)
                    i += ln
            if c > 0:
                i = 0
                end = min(bh4, self.mi_rows - r)
                while i < end and (comp or len(stack) < 2):
                    ln = max(1, min(int(self.bh4[r + i, c - 1]), bh4))
                    add_extra(r + i, c - 1)
                    i += ln
            if comp:
                combined = []
                for li in (0, 1):
                    lst = (ref_id[li] + ref_diff[li])[:2]
                    while len(lst) < 2:
                        lst.append((0, 0))  # global mv (identity)
                    combined.append([lower(m) for m in lst])
                if len(stack) == 1:
                    if (combined[0][0] == stack[0][0][0]
                            and combined[1][0] == stack[0][0][1]):
                        stack.append([(combined[0][1], combined[1][1]), 2])
                    else:
                        stack.append([(combined[0][0], combined[1][0]), 2])
                elif len(stack) == 0:
                    for idx in (0, 1):
                        stack.append([(combined[0][idx],
                                       combined[1][idx]), 2])
        n_found = len(stack)
        # pad with the global mv (identity => (0,0)); count unchanged
        zero = ((0, 0), (0, 0)) if comp else (0, 0)
        while len(stack) < 2:
            stack.append([zero, 0])
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
        mctx = {"new": new_ctx, "zero": 0, "ref": ref_ctx,
                "n_found": n_found, "drl_ctx": drl_ctx}
        if comp:
            mctx["pred_mvs"] = (lower(tuple(stack[0][0][0])),
                                lower(tuple(stack[0][0][1])))
            # compound mode context: per-neighborhood-class table,
            # each cell established by brute force against the decode
            # oracles (see tests/test_inter_conformance.py). The key
            # captures pair matches (close/total/newmv) plus loose
            # (one-shared-ref) neighbors split by shared direction.
            feat = (nearest_match, total_match, int(newmv_count > 0),
                    int(loose_row_bwd) + int(loose_col_bwd),
                    (int(loose_row) + int(loose_col)
                     - int(loose_row_bwd) - int(loose_col_bwd)),
                    int(loose_newmv > 0))
            mctx["_feat"] = feat
            mctx["comp_mode"] = _comp_mode_ctx_cell(feat)
        else:
            mctx["pred_mv"] = lower(tuple(stack[0][0]))
        return stack, mctx

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
