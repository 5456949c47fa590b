"""Coefficient coding (AV1 spec §5.11.39 coeffs()) — encoder side.

Reference parity: rav1e src/context/transform_unit.rs (scan orders,
EOB classes, base/br level contexts) and the coefficient write path in
src/encoder.rs encode_tx_block. Context semantics follow libaom
encodetxb.c / dav1d recon.c (decoder ground truth).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from rav1e_tpu.core.constants import TxSize, TxType

NUM_BASE_LEVELS = 2
COEFF_BASE_RANGE = 12

TX_CLASS_2D, TX_CLASS_HORIZ, TX_CLASS_VERT = 0, 1, 2


def tx_class(tx_type: TxType) -> int:
    if tx_type in (TxType.V_DCT, TxType.V_ADST, TxType.V_FLIPADST):
        return TX_CLASS_VERT
    if tx_type in (TxType.H_DCT, TxType.H_ADST, TxType.H_FLIPADST):
        return TX_CLASS_HORIZ
    return TX_CLASS_2D


_SQR = {  # Tx_Size_Sqr index (0..4 for 4..64)
    TxSize.TX_4X4: 0, TxSize.TX_8X8: 1, TxSize.TX_16X16: 2,
    TxSize.TX_32X32: 3, TxSize.TX_64X64: 4,
    TxSize.TX_4X8: 0, TxSize.TX_8X4: 0, TxSize.TX_8X16: 1,
    TxSize.TX_16X8: 1, TxSize.TX_16X32: 2, TxSize.TX_32X16: 2,
    TxSize.TX_32X64: 3, TxSize.TX_64X32: 3, TxSize.TX_4X16: 0,
    TxSize.TX_16X4: 0, TxSize.TX_8X32: 1, TxSize.TX_32X8: 1,
    TxSize.TX_16X64: 2, TxSize.TX_64X16: 2,
}
_SQR_UP = {t: _SQR[t.sqr_up] for t in TxSize}


def txs_ctx(tx_size: TxSize) -> int:
    """(Tx_Size_Sqr + Tx_Size_Sqr_Up + 1) >> 1."""
    return (_SQR[tx_size] + _SQR_UP[tx_size] + 1) >> 1


@lru_cache(maxsize=None)
def scan_order(w: int, h: int, tclass: int) -> np.ndarray:
    """Scan position list (pos = r * w + c), length w*h.

    Default (2D) scan: anti-diagonal zigzag with alternating direction
    (even diagonals traversed bottom-left -> top-right). VERT class
    scans column-major, HORIZ row-major.
    """
    if tclass == TX_CLASS_2D:
        out = []
        for d in range(w + h - 1):
            lo = max(0, d - w + 1)
            hi = min(d, h - 1)
            cells = [(r, d - r) for r in range(lo, hi + 1)]
            # square: zigzag (even diagonals bottom-left -> top-right);
            # rect: no alternation - tall scans each diagonal top-down,
            # wide bottom-up (verified vs libdav1d/libaom scan tables)
            if (w == h and d % 2 == 0) or (w > h):
                cells = cells[::-1]
            out.extend(r * w + c for r, c in cells)
        return np.array(out, np.int32)
    if tclass == TX_CLASS_VERT:
        return np.array([r * w + c for c in range(w) for r in range(h)],
                        np.int32)
    return np.array([r * w + c for r in range(h) for c in range(w)], np.int32)


# base-context position offsets (dav1d lo_ctx_offsets), [min(r,4)][min(c,4)]
_LO_OFF_SQ = np.array([
    [0, 1, 6, 6, 21],
    [1, 6, 6, 21, 21],
    [6, 6, 21, 21, 21],
    [6, 21, 21, 21, 21],
    [21, 21, 21, 21, 21]], np.int32)
# oracle-verified assignment (tall 16x32 fitted empirically): the
# 11-offset table applies when h == 2*w, the 16-offset table when
# w == 2*h
_LO_OFF_TALL = np.array([  # h == 2*w
    [0, 11, 11, 11, 11],
    [11, 11, 11, 11, 11],
    [6, 6, 21, 21, 21],
    [6, 21, 21, 21, 21],
    [21, 21, 21, 21, 21]], np.int32)
_LO_OFF_WIDE = np.array([  # w == 2*h
    [0, 16, 6, 6, 21],
    [16, 16, 6, 21, 21],
    [16, 16, 21, 21, 21],
    [16, 16, 21, 21, 21],
    [16, 16, 21, 21, 21]], np.int32)


def _lo_offsets(w: int, h: int) -> np.ndarray:
    # the tall/wide tables apply to ANY non-square aspect (1:2 and
    # 1:4 alike) — dav1d selects the offset table by wide/tall class,
    # not exact ratio (8x32 via the square table desynced the oracle)
    if h > w:
        return _LO_OFF_TALL
    if w > h:
        return _LO_OFF_WIDE
    return _LO_OFF_SQ


def base_ctx(lv: np.ndarray, r: int, c: int, tclass: int,
             offsets: np.ndarray) -> int:
    """coeff_base context for position (r, c); lv = abs levels [h][w]."""
    h, w = lv.shape
    if tclass == TX_CLASS_2D:
        if r == 0 and c == 0:
            return 0
        nbrs = ((r, c + 1), (r + 1, c), (r + 1, c + 1), (r, c + 2), (r + 2, c))
    elif tclass == TX_CLASS_VERT:
        nbrs = ((r, c + 1), (r + 1, c), (r + 2, c), (r + 3, c), (r + 4, c))
    else:
        nbrs = ((r, c + 1), (r + 1, c), (r, c + 2), (r, c + 3), (r, c + 4))
    mag = 0
    for (rr, cc) in nbrs:
        if rr < h and cc < w:
            mag += min(int(lv[rr, cc]), 3)
    mag = min((mag + 1) >> 1, 4)
    if tclass == TX_CLASS_2D:
        return mag + int(offsets[min(r, 4), min(c, 4)])
    pos = r if tclass == TX_CLASS_VERT else c
    off_1d = 0 if pos == 0 else (7 if pos == 1 else 14)
    return mag + off_1d


def br_ctx(lv: np.ndarray, r: int, c: int, tclass: int) -> int:
    h, w = lv.shape
    nbrs = [(r, c + 1), (r + 1, c)]
    if tclass == TX_CLASS_2D:
        nbrs.append((r + 1, c + 1))
    elif tclass == TX_CLASS_VERT:
        nbrs.append((r + 2, c))
    else:
        nbrs.append((r, c + 2))
    mag = 0
    for (rr, cc) in nbrs:
        if rr < h and cc < w:
            mag += min(int(lv[rr, cc]), 15)
    mag = min((mag + 1) >> 1, 6)
    if tclass == TX_CLASS_2D:
        if r == 0 and c == 0:
            return mag
        if r < 2 and c < 2:
            return mag + 7
        return mag + 14
    pos = r if tclass == TX_CLASS_VERT else c
    return mag if pos == 0 else mag + 14


def eob_pt_class(eob: int) -> int:
    """EOB group symbol: 1->0, 2->1, 3..4->2, 5..8->3, ..."""
    assert eob >= 1
    if eob == 1:
        return 0
    return (eob - 1).bit_length()


# group start in eob-count terms: symbol k >= 2 covers
# eob in [2^(k-1) + 1, 2^k]
def eob_group_start(pt: int) -> int:
    return pt if pt <= 1 else (1 << (pt - 1)) + 1


def write_coeffs(ec, cdfs, plane: int, tx_size: TxSize, tx_type: TxType,
                 levels: np.ndarray, skip_ctx: int, dc_sign_ctx: int,
                 tx_type_cb=None) -> int:
    """Write one TX block's coefficients. levels: signed [h][w].

    tx_type_cb, if given, is invoked right after a non-zero all_zero
    flag (spec order: transform_type() is coded there for luma).
    Returns the neighbor context byte: min(sum |levels|, 63) | dc sign
    category << 6 (category 1 = negative DC, 2 = positive DC).
    """
    h, w = levels.shape
    ptype = 0 if plane == 0 else 1
    tc = tx_class(tx_type)
    sw, sh = min(w, 32), min(h, 32)
    scan = scan_order(sw, sh, tc)
    lv = np.abs(levels).astype(np.int32)[:sh, :sw]
    flat = lv.reshape(-1)
    nzmask = flat[scan] != 0
    eob = int(np.nonzero(nzmask)[0][-1]) + 1 if nzmask.any() else 0
    tctx = txs_ctx(tx_size)
    ec.encode_symbol(1 if eob == 0 else 0, cdfs.txb_skip[tctx][skip_ctx])
    if eob == 0:
        return 0
    if tx_type_cb is not None:
        tx_type_cb()
    # eob position
    pt = eob_pt_class(eob)
    n_pels = sw * sh
    emctx = 0 if tc == TX_CLASS_2D else 1
    tbl = cdfs.eob_pt[max(n_pels, 16)]
    rec = tbl[ptype][emctx] if isinstance(tbl[ptype][0], list) else tbl[ptype]
    ec.encode_symbol(pt, rec)
    if pt >= 2:
        ofs = eob - eob_group_start(pt)
        nbits = pt - 1
        msb = (ofs >> (nbits - 1)) & 1
        ec.encode_symbol(msb, cdfs.eob_hi_bit[tctx][ptype][pt])
        for b in range(nbits - 2, -1, -1):
            ec.encode_bool((ofs >> b) & 1, 1 << 14)
    offsets = _lo_offsets(sw, sh)
    # base + br levels, one reverse-scan pass (spec 5.11.39: coeff_br
    # symbols interleave immediately after each capped base symbol)
    br_tctx = min(tctx, 3)
    for ci in range(eob - 1, -1, -1):
        pos = int(scan[ci])
        r, c = pos // sw, pos % sw
        level = int(lv[r, c])
        if ci == eob - 1:
            if ci == 0:
                ectx = 0
            elif ci <= (n_pels >> 3):
                ectx = 1
            elif ci <= (n_pels >> 2):
                ectx = 2
            else:
                ectx = 3
            ec.encode_symbol(min(level, 3) - 1,
                             cdfs.coeff_base_eob[tctx][ptype][ectx])
        else:
            bctx = base_ctx(lv, r, c, tc, offsets)
            ec.encode_symbol(min(level, 3),
                             cdfs.coeff_base[tctx][ptype][bctx])
        if level > NUM_BASE_LEVELS:
            bctx = br_ctx(lv, r, c, tc)
            base_range = level - 1 - NUM_BASE_LEVELS
            idx = 0
            while idx < COEFF_BASE_RANGE:
                k = min(base_range - idx, 3)
                ec.encode_symbol(k, cdfs.coeff_br[br_tctx][ptype][bctx])
                if k < 3:
                    break
                idx += 3
    # signs + golomb remainder, forward scan
    cul = 0
    dc_cat = 0
    for ci in range(eob):
        pos = int(scan[ci])
        r, c = pos // sw, pos % sw
        level = int(lv[r, c])
        if level == 0:
            continue
        sign = 1 if levels[r, c] < 0 else 0
        if pos == 0:
            ec.encode_symbol(sign, cdfs.dc_sign[ptype][dc_sign_ctx])
            dc_cat = 1 if sign else 2
        else:
            ec.encode_bool(sign, 1 << 14)
        if level > COEFF_BASE_RANGE + NUM_BASE_LEVELS:
            _write_golomb(ec, level - COEFF_BASE_RANGE - NUM_BASE_LEVELS - 1)
        cul += level
    cul = min(cul, 63)
    return cul | (dc_cat << 6)


def _write_golomb(ec, value: int):
    """Exp-Golomb with equi-probable bits (spec read_golomb mirror)."""
    x = value + 1
    length = x.bit_length()
    for _ in range(length - 1):
        ec.encode_bool(0, 1 << 14)
    for b in range(length - 1, -1, -1):
        ec.encode_bool((x >> b) & 1, 1 << 14)
