"""TPU-batched P-frame encoding.

Unlike intra (wavefront-serialized by prediction deps), inter blocks are
independent given the reference frame, so the whole frame batches:

- full-pel motion search as ONE grouped cross-correlation on the MXU
  (SSD decomposed as ||w||^2 - 2 w.b + ||b||^2; the w.b term is a
  feature_group_count=B conv with each block as its own filter),
- quarter-pel refinement with the spec 8-tap filters as batched int32
  einsums (fixed-trip-count descent, compiler-friendly),
- DCT + quantize + bit-exact inverse over the [B, 32, 32] batch,
- entropy packing on host via the native C packer.

Reference parity: rav1e src/me.rs (full/sub-pel search) and
src/encoder.rs motion_compensate, redesigned for XLA batching.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.core.constants import (
    BlockSize,
    FrameType,
    PartitionType,
    PredictionMode,
    TxSize,
    TxType,
)
from rav1e_tpu.entropy.obu import (
    FrameParams,
    Sequence,
    TileInfo,
    interframe_packet,
)
from rav1e_tpu.entropy.tile import BlockDecision, TileWriter
from rav1e_tpu.ops.ref.mc import SUBPEL_FILTERS
from rav1e_tpu.ops.ref.quant import ac_q as ac_q_lut, dc_q as dc_q_lut
from rav1e_tpu.ops.tpu import transforms as T

PAD = 32          # ref padding: search 16 + subpel drift + filter taps
SEARCH = 16       # full-pel search radius (px)

def _scans():
    from rav1e_tpu.entropy.coeffs import TX_CLASS_2D, scan_order
    return (scan_order(32, 32, TX_CLASS_2D),
            scan_order(16, 16, TX_CLASS_2D),
            scan_order(8, 8, TX_CLASS_2D),
            scan_order(4, 4, TX_CLASS_2D))

_FILT = jnp.asarray(SUBPEL_FILTERS["REGULAR"], jnp.int32)  # [16, 8]
# 4-tap bank (spec Subpel_Filters[4]): any pass whose block extent is
# <= 4 px — the 4x4 chroma of 16->8 split children at 4:2:0
_FILT4 = jnp.asarray(SUBPEL_FILTERS["REGULAR_4"], jnp.int32)


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


def _split_bits() -> float:
    from rav1e_tpu.core.constants import PartitionType
    from rav1e_tpu.entropy.cost import mode_cost_tables
    pm = mode_cost_tables()["partition_mid"]
    return float(pm[int(PartitionType.SPLIT)]
                 - pm[int(PartitionType.NONE)]
                 + 4.0 * pm[int(PartitionType.NONE)])


@lru_cache(maxsize=1)
def _split8_bits() -> float:
    """Partition bits for a 16->8 SPLIT: the SPLIT-vs-NONE delta at
    the 16 level (partition_mid) plus four NONE symbols from the
    4-ary partition_8 family (spec: 8x8 with 4x4 support present)."""
    from rav1e_tpu.core.constants import PartitionType
    from rav1e_tpu.entropy.cost import _avg_bits, mode_cost_tables, tables
    pm = mode_cost_tables()["partition_mid"]
    p8 = _avg_bits(tables()["partition_8"])
    return float(pm[int(PartitionType.SPLIT)]
                 - pm[int(PartitionType.NONE)]
                 + 4.0 * p8[int(PartitionType.NONE)])


@lru_cache(maxsize=1)
def _intra_in_inter_bits() -> float:
    """Signaling bits for a DC intra block in an inter frame:
    intra_inter(0) + y_mode(DC, size group 3) + uv_mode_cfl(DC)."""
    from rav1e_tpu.entropy.cost import _avg_bits, tables
    t = tables()
    return (float(_avg_bits(t["intra_inter"])[0])
            + float(_avg_bits(t["y_mode"])[0])
            + float(_avg_bits(t["uv_mode_cfl"])[0]))


def _merge_save_bits() -> float:
    """Signaling bits PARTITION_NONE at 64 saves vs SPLIT + 4x NONE@32
    (the per-32 skip/mode/ref overhead is counted in the 32 costs)."""
    from rav1e_tpu.core.constants import PartitionType
    from rav1e_tpu.entropy.cost import mode_cost_tables
    pm = mode_cost_tables()["partition_mid"]
    return float(pm[int(PartitionType.SPLIT)]
                 + 4.0 * pm[int(PartitionType.NONE)]
                 - pm[int(PartitionType.NONE)])


def build_rd_inter(qindex: int, bit_depth: int = 8,
                   chroma_dq: int | None = None) -> dict:
    """Traced RD inputs for the batched P step: λ, MV-rate LUT, inter
    mode bits, coefficient-rate LUTs (WriterCounter twin —
    entropy/cost.py; rav1e src/rdo.rs::compute_rd_cost analog).

    chroma_dq: frame-header delta_q_u_dc/ac in qindex steps — chroma
    quantizes (and its rate LUTs price) at qindex + chroma_dq (rav1e
    QuantizerParameters runs chroma finer than luma)."""
    from rav1e_tpu.entropy.cost import (
        inter_mode_bits, mv_component_bits, rd_lambda, sad_lambda)
    from rav1e_tpu.ops.ref.deblock import level_from_qindex
    from rav1e_tpu.pipeline.tpu_intra import rate_luts
    from rav1e_tpu.ops.ref.quant import ac_q as _acq
    from rav1e_tpu.ops.ref.quant import chroma_dq as _cdq
    from rav1e_tpu.ops.ref.quant import dc_q as _dcq
    imb = inter_mode_bits()
    if chroma_dq is None:
        chroma_dq = _cdq(qindex)
    qc = qindex + chroma_dq
    return {
        "dcq_c": jnp.int32(_dcq(qc, 0, bit_depth)),
        "acq_c": jnp.int32(_acq(qc, 0, bit_depth)),
        "lam": jnp.float32(rd_lambda(qindex, bit_depth)),
        "lam_sad": jnp.float32(sad_lambda(qindex, bit_depth)),
        "mv_bits": jnp.asarray(mv_component_bits()),
        "newmv": jnp.float32(imb["NEWMV"] + 1.2),  # + mv_joint avg
        "globalmv": jnp.float32(imb["GLOBALMV"]),
        "nearest": jnp.float32(imb["NEARESTMV"]),
        "near": jnp.float32(imb["NEARMV"]),
        "intra32": jnp.float32(_intra_in_inter_bits()),
        "skip0": jnp.float32(imb["skip0"]),
        "skip1": jnp.float32(imb["skip1"]),
        "y32": rate_luts(qindex, TxSize.TX_32X32, 0),
        "c16": rate_luts(qc, TxSize.TX_16X16, 1),
        "y16": rate_luts(qindex, TxSize.TX_16X16, 0),
        "c8": rate_luts(qc, TxSize.TX_8X8, 1),
        "c32": rate_luts(qc, TxSize.TX_32X32, 1),
        "y8": rate_luts(qindex, TxSize.TX_8X8, 0),
        "c4": rate_luts(qc, TxSize.TX_4X4, 1),
        "split_bits": jnp.float32(_split_bits()),
        "split_bits8": jnp.float32(_split8_bits()),
        "merge_save": jnp.float32(_merge_save_bits()),
        "base_lf": jnp.int32(level_from_qindex(qindex)),
    }


def _mc_batch(ref_pad, pos_r, pos_c, mv8, n, ss, interm=False,
              four_tap=False, bd: int = 8):
    """Batched sub-pel prediction. ref_pad padded by PAD>>ss with edge
    replication; pos_r/pos_c [B] plane-scale block origins; mv8 [B,2]
    luma-scale 1/8-pel MVs; n = block size. Returns [B, n, n] int32.

    interm=True keeps compound intermediate precision (spec 7.11.3.1
    isCompound: InterRound1 = 7, unclipped) for COMPOUND_AVERAGE.

    four_tap=True uses the Subpel_Filters[4] bank (spec: blocks with
    w/h <= 4) — pass it when the n x n region is consumed as <=4 px
    sub-blocks sharing this MV (convolution is per-pixel, so one
    region pass equals the per-sub-block passes)."""
    p = PAD >> ss
    p16r = (pos_r << 4) + mv8[:, 0] * (2 >> ss)
    p16c = (pos_c << 4) + mv8[:, 1] * (2 >> ss)
    ir, fr = p16r >> 4, p16r & 15
    ic, fc = p16c >> 4, p16c & 15

    def slice_one(r0, c0):
        return jax.lax.dynamic_slice(ref_pad, (r0 + p - 3, c0 + p - 3),
                                     (n + 7, n + 7))

    patch = jax.vmap(slice_one)(ir, ic)          # [B, n+7, n+7]
    bank = _FILT4 if four_tap else _FILT
    fh = bank[fc]                                # [B, 8]
    fv = bank[fr]
    # taps as fused shift/multiply-accumulate (int32 VPU) — the
    # stack+einsum form materialized [8, B, n, n] operands per pass
    intm = sum(fh[:, t, None, None] * patch[:, :, t: t + n]
               for t in range(8))
    intm = _round2(intm, 3)
    out = sum(fv[:, t, None, None] * intm[:, t: t + n, :]
              for t in range(8))
    if interm:
        return _round2(out, 7)
    return jnp.clip(_round2(out, 11), 0, (1 << bd) - 1)


def _comp_avg(p0, p1, bd: int = 8):
    """COMPOUND_AVERAGE of two intermediate-precision predictions
    (ops/ref/mc.py mc_predict_avg twin): Round2(p0 + p1, 5), clipped."""
    return jnp.clip(_round2(p0 + p1, 5), 0, (1 << bd) - 1)


def _gather_patch(ref_pad, pos_r, pos_c, mv8c, n, ss, M):
    """ONE dynamic_slice per block: an (n+7+2M)^2 patch around the
    center MV. All subpel-descent candidates within ±M px of the
    center then evaluate from this patch with zero further gathers
    (per-block gathers are the TPU cost of motion search — profiled
    at 2/3 of the P-step before this restructure).

    Returns (patch [B, n+7+2M, n+7+2M], ir0, ic0) with patch[b, 0, 0]
    = ref row (ir0 - 3 - M), col (ic0 - 3 - M)."""
    p = PAD >> ss
    p16r = (pos_r << 4) + mv8c[:, 0] * (2 >> ss)
    p16c = (pos_c << 4) + mv8c[:, 1] * (2 >> ss)
    ir0, ic0 = p16r >> 4, p16c >> 4

    def slice_one(r0, c0):
        return jax.lax.dynamic_slice(
            ref_pad, (r0 + p - 3 - M, c0 + p - 3 - M),
            (n + 7 + 2 * M, n + 7 + 2 * M))

    return jax.vmap(slice_one)(ir0, ic0), ir0, ic0


def _mc_patch(patch, ir0, ic0, pos_r, pos_c, mv8, n, ss, M,
              interm=False, bd: int = 8):
    """Subpel prediction from pre-gathered patches (bit-exact twin of
    _mc_batch): the whole-pixel drift vs the patch center (≤ M) folds
    into an extended (8+2M)-tap filter with the 8 spec taps placed at
    the drift offset — pure static slices + fused madds, no gather.
    Accepts extra leading batch dims shared across all array args
    (mv8 [..., 2], pos/ir0 broadcastable)."""
    p16r = (pos_r << 4) + mv8[..., 0] * (2 >> ss)
    p16c = (pos_c << 4) + mv8[..., 1] * (2 >> ss)
    ir, fr = p16r >> 4, p16r & 15
    ic, fc = p16c >> 4, p16c & 15
    cr = jnp.clip(ir - ir0 + M, 0, 2 * M)
    cc = jnp.clip(ic - ic0 + M, 0, 2 * M)
    T = 8 + 2 * M

    def ext(fil, carry):
        # fil [..., 8] -> [..., T] with taps at offset carry (0..2M)
        out = None
        for s in range(2 * M + 1):
            pad = [(0, 0)] * (fil.ndim - 1) + [(s, 2 * M - s)]
            v = jnp.pad(fil, pad)
            out = v if out is None else jnp.where(
                carry[..., None] == s, v, out)
        return out

    fh = ext(_FILT[fc], cc)
    fv = ext(_FILT[fr], cr)
    # fused int32 shift/multiply-accumulate (see _mc_batch)
    intm = sum(fh[..., t, None, None] * patch[..., :, t: t + n]
               for t in range(T))
    intm = _round2(intm, 3)
    out = sum(fv[..., t, None, None] * intm[..., t: t + n, :]
              for t in range(T))
    if interm:
        return _round2(out, 7)
    return jnp.clip(_round2(out, 11), 0, (1 << bd) - 1)


def _mc_patch_multi(patch, ir0, ic0, pos_r, pos_c, mv8c, n, ss, M,
                    bd: int = 8):
    """_mc_patch for C candidate MVs [C, B, 2] sharing one patch set:
    one dispatch evaluates all candidates (the horizontal taps read
    each patch row once per candidate but stay inside one fusion —
    the per-candidate-call form cost a full pass over the step's op
    graph 13x per subpel descent). Returns [C, B, n, n] int32."""
    C = mv8c.shape[0]
    return _mc_patch(patch[None], ir0[None], ic0[None],
                     pos_r[None], pos_c[None], mv8c, n, ss, M, bd=bd)


_HAD8 = np.array([[1, 1, 1, 1, 1, 1, 1, 1],
                  [1, -1, 1, -1, 1, -1, 1, -1],
                  [1, 1, -1, -1, 1, 1, -1, -1],
                  [1, -1, -1, 1, 1, -1, -1, 1],
                  [1, 1, 1, 1, -1, -1, -1, -1],
                  [1, -1, 1, -1, -1, 1, -1, 1],
                  [1, 1, -1, -1, -1, -1, 1, 1],
                  [1, -1, -1, 1, -1, 1, 1, -1]], np.float32)


def satd(d):
    """SAD-normalized SATD over 8x8 Hadamard tiles (rav1e
    src/dist.rs::get_satd, batched on the MXU): [B, n, n] residual ->
    [B]. Normalization /8 puts it on the SAD amplitude scale."""
    B, n, _ = d.shape
    x = (d.reshape(B, n // 8, 8, n // 8, 8)
         .transpose(0, 1, 3, 2, 4)
         .reshape(B, -1, 8, 8).astype(jnp.float32))
    h = jnp.asarray(_HAD8)
    t = jnp.einsum("ij,bkjl,ml->bkim", h, x, h,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(jnp.abs(t), axis=(1, 2, 3)) * 0.125


def to_blocks(plane, n):
    return (plane.reshape(-1, n, plane.shape[1] // n, n)
            .transpose(0, 2, 1, 3).reshape(-1, n, n))


def from_blocks(blks, ph, pw, n):
    return (blks.reshape(ph // n, pw // n, n, n)
            .transpose(0, 2, 1, 3).reshape(ph, pw))


def _search_one_ref(ryp, blks, by, bx, rd, B, use_satd=False,
                    search: int = SEARCH, subpel: bool = True,
                    bd: int = 8, ds2: bool = True):
    """Motion search vs ONE padded reference plane: full-pel SSD via
    batched matmul on the MXU, then quarter-pel fixed-trip descent
    from a single pre-gathered patch per block (rav1e src/me.rs
    estimate_motion, batched). Returns (mv8 [B,2] eighth-pel, patch,
    pir0, pic0, grid_fn) where grid_fn(mv [B,2]) estimates full-frame
    SSE of an arbitrary in-window MV from the search's SSD surface.

    ds2=True runs the full-pel stage at HALF resolution (rav1e me.rs
    hierarchical pyramid levels): same +-search px coverage at 1/8 the
    SSD-surface traffic (the full-res surface materialized ~550 MB of
    f32 intermediates per frame = 24 ms of the 84 ms decision core);
    the descent then opens with a full-pel step (M=2 patches) and the
    caller's exact-SSE re-judge keeps the final costs honest.

    search: full-pel radius (SpeedSettings.search_px, <= PAD);
    subpel=False skips the descent (SpeedSettings.subpel off,
    speeds > 8)."""
    assert search <= PAD, (search, PAD)
    # ---- full-pel SSD search (grouped conv on the MXU) ----------
    # Search windows sit on the regular 32-grid (origin = block -
    # search after the PAD shift), so ALL [B, W, W] windows assemble
    # from a KxK arrangement of a static 32-tiling — no per-block
    # dynamic slices (those lowered to ~2000 DMA descriptors/frame).
    nby_l = ryp.shape[0] // 32 - 2                # h // 32
    nbx_l = ryp.shape[1] // 32 - 2
    # ds2 pays only where the full-res SSD surface is HBM-bound
    # (~550 MB of f32 intermediates at 1080p); small frames take the
    # exact surface — the half-res SSE pricing is aliasing-biased and
    # cost ~8% bytes on low-rate pans (bdrate_r5 diagnosis)
    use_ds2 = (ds2 and B == nby_l * nbx_l and B >= 510
               and search % 2 == 0 and search >= 4)

    def assemble_windows(plane, want, tile, offp, kk):
        """[B, want, want] windows at origin tile*(i,j)+offp of
        `plane` (padded coords), want <= tile*kk, via static tiling —
        no per-block dynamic slices (those lowered to ~2000 DMA
        descriptors/frame)."""
        need_r = offp + tile * (nby_l + kk - 1)
        need_c = offp + tile * (nbx_l + kk - 1)
        pr = max(0, need_r - plane.shape[0])
        pc = max(0, need_c - plane.shape[1])
        if pr or pc:
            plane = jnp.pad(plane, ((0, pr), (0, pc)))
        g = (plane[offp:need_r, offp:need_c]
             .reshape(nby_l + kk - 1, tile, nbx_l + kk - 1, tile)
             .transpose(0, 2, 1, 3))
        rows = [jnp.concatenate([g[i:nby_l + i, j:nbx_l + j]
                                 for j in range(kk)], axis=-1)
                for i in range(kk)]
        wins = jnp.concatenate(rows, axis=-2)
        return wins.reshape(-1, tile * kk, tile * kk)[:, :want, :want]

    # The SSD surface is computed as one batched matmul with a
    # diagonal reduction (the grouped-conv form cannot tile onto the
    # MXU — profiled 37.7 ms at 1080p, 0.06% MFU):
    #   M[b, r, R, dx] = sum_c blk[b, r, c] * win[b, R, dx + c]
    #   corr[b, dy, dx] = sum_r M[b, r, r + dy, dx]
    # The contraction runs over the block columns (dot_general, batch
    # b), and the row-offset coupling becomes static slice adds.
    def ssd_surface(wins, wsq, bcomp, n, S):
        S1 = 2 * S + 1
        w_bf = wins.astype(jnp.bfloat16)
        b_bf = bcomp.astype(jnp.bfloat16)
        w2 = jnp.stack([w_bf[:, :, dx: dx + n] for dx in range(S1)], 2)
        m = jnp.einsum("brc,bRdc->brRd", b_bf, w2,
                       preferred_element_type=jnp.float32)
        corr = m[:, 0, 0:S1, :]
        for r in range(1, n):
            corr = corr + m[:, r, r: r + S1, :]   # [B,S1,S1]
        return wsq - 2.0 * corr + jnp.sum(
            (bcomp * bcomp).astype(jnp.float32), (1, 2))[:, None, None]

    def rate_grid(S, px_step):
        # real MV + mode-signaling rate (entropy/cost.py LUTs): every
        # non-zero candidate codes NEWMV + the MV residual; (0,0)
        # codes GLOBALMV
        fp_idx = np.abs(np.arange(-S, S + 1)) * 8 * px_step
        mvb = rd["mv_bits"][jnp.asarray(fp_idx)]
        return (mvb[:, None] + mvb[None, :] + rd["newmv"]
                ).at[S, S].set(rd["globalmv"])[None]

    if use_ds2:
        # ---- half-res full-pel stage (hierarchical level 1) ------
        S2 = search // 2
        r2 = (ryp.astype(jnp.float32)
              .reshape(ryp.shape[0] // 2, 2, ryp.shape[1] // 2, 2)
              .mean((1, 3)))
        blks2 = blks.astype(jnp.float32).reshape(B, 16, 2, 16, 2) \
            .mean((2, 4))
        off2 = PAD // 2 - S2
        win2 = 2 * S2 + 16
        K2 = (win2 + 15) // 16
        sq2 = jax.lax.reduce_window(r2 * r2, 0.0, jax.lax.add,
                                    (16, 16), (1, 1), "valid")
        wins = assemble_windows(r2, win2, 16, off2, K2)
        wsq = assemble_windows(sq2, 2 * S2 + 1, 16, off2, K2)
        # x4: each ds2 cell stands for 4 source pixels of SSE
        ssd = ssd_surface(wins, wsq, blks2, 16, S2) * 4.0
        cost = ssd + rd["lam"] * rate_grid(S2, 2)
        flat = jnp.argmin(cost.reshape(B, -1), axis=1)
        mv_fp = jnp.stack([flat // (2 * S2 + 1) - S2,
                           flat % (2 * S2 + 1) - S2], 1) * 2
        grid_S, grid_step = S2, 2
        # full-pel opening step: the ds2 winner is within +-1 px of
        # the full-res optimum; drift 8+4+2+2 = 2 px -> M = 2
        desc_steps = (8, 4, 2, 2) if subpel else (8,)
        M = 2
    else:
        win_sz = 2 * search + 32
        sq_sums = jax.lax.reduce_window(
            (ryp * ryp).astype(jnp.float32), 0.0, jax.lax.add,
            (32, 32), (1, 1), "valid")            # sliding 32x32 sums
        off = PAD - search                        # window origin shift
        K = (win_sz + 31) // 32                   # tiles per window side
        if B == nby_l * nbx_l:
            # single-chip path: blocks cover the padded plane's grid
            wins = assemble_windows(ryp.astype(jnp.float32), win_sz,
                                    32, off, K)
            wsq = assemble_windows(sq_sums, 2 * search + 1, 32, off, K)
        else:
            # tile-sharded path: refs are replicated full-frame while
            # the block set is this tile's column slice at traced
            # offsets — per-block dynamic slices are the general form
            def win_one(r0, c0):
                return jax.lax.dynamic_slice(
                    ryp, (r0 + off, c0 + off), (win_sz, win_sz))

            wins = jax.vmap(win_one)(by, bx).astype(jnp.float32)

            def sums_one(r0, c0):
                return jax.lax.dynamic_slice(
                    sq_sums, (r0 + off, c0 + off),
                    (2 * search + 1, 2 * search + 1))

            wsq = jax.vmap(sums_one)(by, bx)
        ssd = ssd_surface(wins, wsq, blks, 32, search)
        cost = ssd + rd["lam"] * rate_grid(search, 1)
        flat = jnp.argmin(cost.reshape(B, -1), axis=1)
        mv_fp = jnp.stack([flat // (2 * search + 1) - search,
                           flat % (2 * search + 1) - search], 1)
        grid_S, grid_step = search, 1
        desc_steps = (4, 2, 2) if subpel else ()
        M = 1

    def grid_fn(mv):
        """Estimate SSE of an arbitrary (subpel) MV from the SSD
        surface: one take_along_axis (the erosion passes' metric)."""
        fp_r = (mv[:, 0] + 4) >> 3
        fp_c = (mv[:, 1] + 4) >> 3
        cy = jnp.clip(jnp.round(fp_r / grid_step).astype(jnp.int32),
                      -grid_S, grid_S)
        cx = jnp.clip(jnp.round(fp_c / grid_step).astype(jnp.int32),
                      -grid_S, grid_S)
        flat_i = (cy + grid_S) * (2 * grid_S + 1) + (cx + grid_S)
        return jnp.take_along_axis(
            ssd.reshape(B, -1), flat_i[:, None], 1)[:, 0]

    # ---- quarter-pel refinement (fixed-trip descent) ------------
    # one patch gather per block; every candidate (and the final
    # prediction) evaluates in-patch (drift <= M px)
    mv8 = mv_fp * 8
    patch32, pir0, pic0 = _gather_patch(ryp, by, bx, mv8, 32, 0, M)

    def ssd8(mv8c):
        pred = _mc_patch(patch32, pir0, pic0, by, bx, mv8c, 32, 0, M,
                         bd=bd)
        mvr = (rd["mv_bits"][jnp.abs(mv8c[:, 0])]
               + rd["mv_bits"][jnp.abs(mv8c[:, 1])])
        if use_satd:
            # rav1e use_satd_subpel (src/me.rs): Hadamard distortion
            # with the amplitude-domain lambda
            return satd(pred - blks) + rd["lam_sad"] * mvr
        d = (pred - blks).astype(jnp.float32)
        return jnp.sum(d * d, axis=(1, 2)) + rd["lam"] * mvr

    def ssd8_multi(mv8c):
        """[C, B, 2] candidates in ONE patch-shared dispatch."""
        C = mv8c.shape[0]
        pred = _mc_patch_multi(patch32, pir0, pic0, by, bx, mv8c,
                               32, 0, M, bd=bd)
        mvr = (rd["mv_bits"][jnp.abs(mv8c[..., 0])]
               + rd["mv_bits"][jnp.abs(mv8c[..., 1])])
        d = pred - blks[None]
        if use_satd:
            return (satd(d.reshape(C * B, 32, 32)).reshape(C, B)
                    + rd["lam_sad"] * mvr)
        df = d.astype(jnp.float32)
        return jnp.sum(df * df, axis=(2, 3)) + rd["lam"] * mvr

    best = ssd8(mv8)
    for step_sz in desc_steps:
        cands = jnp.stack([
            mv8 + jnp.array([-step_sz, 0]),
            mv8 + jnp.array([step_sz, 0]),
            mv8 + jnp.array([0, -step_sz]),
            mv8 + jnp.array([0, step_sz])], 0)    # [4,B,2]
        costs = ssd8_multi(cands)                 # [4,B]
        k = jnp.argmin(costs, axis=0)
        cbest = jnp.take_along_axis(costs, k[None], 0)[0]
        cmv = jnp.take_along_axis(
            cands, k[None, :, None].repeat(2, -1), 0)[0]
        better = cbest < best
        mv8 = jnp.where(better[:, None], cmv, mv8)
        best = jnp.where(better, cbest, best)
    # zero-MV blocks stay GLOBALMV-zero
    is_zero = jnp.all(mv_fp == 0, axis=1)
    mv8 = jnp.where(is_zero[:, None], 0, mv8)
    return mv8, patch32, pir0, pic0, grid_fn


def _coarse_mv(y, ryp, B, search: int = SEARCH):
    """Hierarchical long-range candidate (rav1e me.rs pyramid
    predictors; SURVEY §2.1 ME row "hierarchical"): full-pel SSD at
    4x downsampling over +-4*search px — motion past the fine window
    (fast pans, jumping objects between pyramid anchors) lands within
    one of these coarse minima. Returns [B, 2] full-res eighth-pel
    MVs on the 4-px grid; the caller re-judges them at exact SSE.

    Same matmul-diagonal formulation as the fine search, at 1/16 the
    pixels: blocks are 8x8, windows (2S+8)^2 at ds4 scale."""
    h, tw = y.shape
    S = search                                     # ds4 radius

    def ds4(p):
        return p.reshape(p.shape[0] // 4, 4, p.shape[1] // 4, 4) \
                .astype(jnp.float32).mean((1, 3))

    yd = ds4(y)                                    # [h/4, tw/4]
    # reference without PAD, downsampled, then re-padded by S
    rf = jax.lax.slice(ryp, (PAD, PAD),
                       (PAD + h, PAD + tw))
    rd4 = jnp.pad(ds4(rf), S, mode="edge")
    blks = to_blocks(yd, 8)                        # [B, 8, 8]
    win_sz = 2 * S + 8
    nby, nbx = h // 32, tw // 32
    K = (win_sz + 7) // 8
    need_r = 8 * (nby + K - 1)
    need_c = 8 * (nbx + K - 1)
    pr = max(0, need_r - rd4.shape[0])
    pc = max(0, need_c - rd4.shape[1])
    g = jnp.pad(rd4, ((0, pr), (0, pc)))[:need_r, :need_c] \
        .reshape(nby + K - 1, 8, nbx + K - 1, 8).transpose(0, 2, 1, 3)
    rows = [jnp.concatenate([g[i:nby + i, j:nbx + j]
                             for j in range(K)], axis=-1)
            for i in range(K)]
    wins = (jnp.concatenate(rows, axis=-2)
            .reshape(B, 8 * K, 8 * K)[:, :win_sz, :win_sz])
    S1 = 2 * S + 1
    w2 = jnp.stack([wins[:, :, dx: dx + 8] for dx in range(S1)], 2)
    m = jnp.einsum("brc,bRdc->brRd", blks, w2,
                   preferred_element_type=jnp.float32)
    corr = m[:, 0, 0:S1, :]
    for r in range(1, 8):
        corr = corr + m[:, r, r: r + S1, :]
    wsq = jax.lax.reduce_window(wins * wins, 0.0, jax.lax.add,
                                (1, 8, 8), (1, 1, 1), "valid")
    ssd = (wsq - 2.0 * corr
           + jnp.sum(blks * blks, axis=(1, 2))[:, None, None])
    flat = jnp.argmin(ssd.reshape(B, -1), axis=1)
    mv = jnp.stack([flat // S1 - S, flat % S1 - S], 1)
    mv_px = mv * 4                                 # ds4 px -> px
    # clamp so the 8-tap MC window stays inside the PAD-px edge
    # replication on BOTH planes (chroma pads PAD/2 at half scale —
    # the binding constraint: 2*(PAD/2 - 8) luma px)
    ii = jnp.arange(B, dtype=jnp.int32)
    by = (ii // nbx) * 32
    bx = (ii % nbx) * 32
    m = min(PAD - 8, 2 * (PAD // 2 - 8))
    tr = jnp.clip(by + mv_px[:, 0], -m, h - 32 + m)
    tc = jnp.clip(bx + mv_px[:, 1], -m, tw - 32 + m)
    return jnp.stack([tr - by, tc - bx], 1) * 8    # 1/8 pel


def _merge64_pass(y, u, v, ryp, rup, rvp, ryp2, rup2, rvp2, rd, lam,
                  code, nby, nbx, mv8, rec_y, rec_u, rec_v, lv_y, lv_u,
                  lv_v, skip, split, skip16_out, choice, mvb8,
                  cost_fin, bd=8):
    """PARTITION_NONE at 64x64 (rav1e rdo_partition_decision's top
    level): one MV + TX_64X64 luma / TX_32X32 chroma per SB, RD-tested
    against the four 32-level results. Candidates: the TL child's MV
    and zero, against the forward ref and (B frames) the backward ref.
    Saves the per-32 partition/skip/mode signaling floor on easy
    content. Returns the updated per-32 outputs + (b64_map, b64g,
    choice64 merged into `choice`)."""
    mx64 = (1 << bd) - 1
    from functools import partial as _prt64
    _mc_batch_bd = _prt64(_mc_batch, bd=bd)
    from rav1e_tpu.pipeline.tpu_intra import block_bits
    B = nby * nbx
    nr64, nc64 = nby // 2, nbx // 2
    B64n = nr64 * nc64
    by64 = jnp.asarray((np.repeat(np.arange(nr64), nc64) * 64)
                       .astype(np.int32))
    bx64 = jnp.asarray((np.tile(np.arange(nc64), nr64) * 64)
                       .astype(np.int32))
    blks64 = to_blocks(y, 64)
    ub32 = to_blocks(u.astype(jnp.int32), 32)
    vb32 = to_blocks(v.astype(jnp.int32), 32)
    mvg64 = mv8.reshape(nby, nbx, 2)
    mv_tl = mvg64[0::2, 0::2].reshape(B64n, 2)
    zero = jnp.zeros_like(mv_tl)

    def sse64(p):
        d = (p - blks64).astype(jnp.float32)
        return jnp.sum(d * d, (1, 2))

    # neighbor-relative MV rate (see cand_pass): the merged block's
    # mv-stack predictor is ~ the left SB's MV, so a coherent field
    # codes the merge as a ~2-bit NEAREST alias, not a full NEWMV
    mvtl_g = mv_tl.reshape(nr64, nc64, 2)
    pred64 = jnp.concatenate([mvtl_g[:, :1], mvtl_g[:, :-1]],
                             1).reshape(B64n, 2)

    def mvr64(mv):
        z = (mv[:, 0] == 0) & (mv[:, 1] == 0)
        d0 = jnp.minimum(jnp.abs(mv[:, 0] - pred64[:, 0]), 1024)
        d1 = jnp.minimum(jnp.abs(mv[:, 1] - pred64[:, 1]), 1024)
        same = (d0 == 0) & (d1 == 0) & ~z
        r = rd["newmv"] + rd["mv_bits"][d0] + rd["mv_bits"][d1]
        r = jnp.where(same, rd["nearest"], r)
        return jnp.where(z, rd["globalmv"], r)

    cand_mv = [mv_tl, zero]
    cand_ref = [0, 0]
    preds = [_mc_batch_bd(ryp, by64, bx64, m, 64, 0) for m in cand_mv]
    if ryp2 is not None:
        cand_mv += [mv_tl, zero]
        cand_ref += [1, 1]
        preds += [_mc_batch_bd(ryp2, by64, bx64, m, 64, 0)
                  for m in (mv_tl, zero)]
    costs = jnp.stack([sse64(p) + lam * mvr64(m)
                       for p, m in zip(preds, cand_mv)], 0)
    k = jnp.argmin(costs, 0)
    k2 = k[:, None]
    mv64 = cand_mv[0]
    pred_y64 = preds[0]
    for i in range(1, len(cand_mv)):
        mv64 = jnp.where(k2 == i, cand_mv[i], mv64)
        pred_y64 = jnp.where(k[:, None, None] == i, preds[i], pred_y64)
    choice64 = (k >= 2).astype(jnp.int32)
    pu_f = _mc_batch_bd(rup, by64 // 2, bx64 // 2, mv64, 32, 1)
    pv_f = _mc_batch_bd(rvp, by64 // 2, bx64 // 2, mv64, 32, 1)
    if ryp2 is not None:
        pu_b = _mc_batch_bd(rup2, by64 // 2, bx64 // 2, mv64, 32, 1)
        pv_b = _mc_batch_bd(rvp2, by64 // 2, bx64 // 2, mv64, 32, 1)
        c3 = (choice64 == 1)[:, None, None]
        pred_u64 = jnp.where(c3, pu_b, pu_f)
        pred_v64 = jnp.where(c3, pv_b, pv_f)
    else:
        pred_u64, pred_v64 = pu_f, pv_f
    lv_y64, r2_y64 = code(blks64 - pred_y64, TxSize.TX_64X64)
    lv_u32, r2_u32 = code(ub32 - pred_u64, TxSize.TX_32X32, chroma=True)
    lv_v32, r2_v32 = code(vb32 - pred_v64, TxSize.TX_32X32, chroma=True)
    cd_y64 = jnp.clip(pred_y64 + r2_y64, 0, mx64)
    cd_u32 = jnp.clip(pred_u64 + r2_u32, 0, mx64)
    cd_v32 = jnp.clip(pred_v64 + r2_v32, 0, mx64)
    sse64_c = (sse64(cd_y64)
               + jnp.sum((cd_u32 - ub32).astype(jnp.float32) ** 2,
                         (1, 2))
               + jnp.sum((cd_v32 - vb32).astype(jnp.float32) ** 2,
                         (1, 2)))
    sse64_s = (sse64(pred_y64)
               + jnp.sum((pred_u64 - ub32).astype(jnp.float32) ** 2,
                         (1, 2))
               + jnp.sum((pred_v64 - vb32).astype(jnp.float32) ** 2,
                         (1, 2)))
    # TX64 codes only the low-freq 32x32 (already zeroed beyond)
    lv64r = lv_y64[:, :32, :32]
    cbits64 = (block_bits(lv64r, rd["y32"])
               + block_bits(lv_u32, rd["c32"])
               + block_bits(lv_v32, rd["c32"]))
    skip64 = (sse64_s + lam * rd["skip1"]
              <= sse64_c + lam * (rd["skip0"] + cbits64))
    cost64 = (lam * (mvr64(mv64) - rd["merge_save"])
              + jnp.where(skip64, sse64_s + lam * rd["skip1"],
                          sse64_c + lam * (rd["skip0"] + cbits64)))
    cf22 = (cost_fin.reshape(nr64, 2, nc64, 2).sum((1, 3))
            .reshape(B64n))
    b64 = cost64 < cf22
    b64_map = b64.reshape(nr64, nc64)

    def quads64(x, n):
        return (x.reshape(nr64, nc64, 2, n, 2, n)
                .transpose(0, 2, 1, 4, 3, 5)
                .reshape(nby, nbx, n, n).reshape(B, n, n))

    b64g = jnp.repeat(jnp.repeat(b64_map, 2, 0), 2, 1).reshape(B)
    b3 = b64g[:, None, None]
    sk3 = skip64[:, None, None]
    rec_y = jnp.where(b3, quads64(jnp.where(sk3, pred_y64, cd_y64),
                                  32), rec_y)
    rec_u = jnp.where(b3, quads64(jnp.where(sk3, pred_u64, cd_u32),
                                  16), rec_u)
    rec_v = jnp.where(b3, quads64(jnp.where(sk3, pred_v64, cd_v32),
                                  16), rec_v)
    tl_mask = jnp.zeros((nby, nbx), bool)
    tl_mask = tl_mask.at[0::2, 0::2].set(b64_map)
    tl_g = tl_mask.reshape(B)
    lv64_tl = jnp.zeros((nby, nbx, 32, 32), jnp.int32)
    lv64_tl = lv64_tl.at[0::2, 0::2].set(
        jnp.where(sk3, 0, lv64r).reshape(nr64, nc64, 32, 32))
    lv_y = jnp.where(b3, jnp.where(tl_g[:, None, None],
                                   lv64_tl.reshape(B, 32, 32), 0),
                     lv_y)
    lv_u = jnp.where(b3, quads64(jnp.where(sk3, 0, lv_u32), 16), lv_u)
    lv_v = jnp.where(b3, quads64(jnp.where(sk3, 0, lv_v32), 16), lv_v)
    skip64g = jnp.repeat(jnp.repeat(
        skip64.reshape(nr64, nc64), 2, 0), 2, 1).reshape(B)
    skip = jnp.where(b64g, skip64g, skip)
    split = split & ~b64g
    skip16_out = jnp.where(b64g[:, None], skip64g[:, None], skip16_out)
    mv64g = (jnp.repeat(jnp.repeat(
        mv64.reshape(nr64, nc64, 2), 2, 0), 2, 1).reshape(B, 2))
    mv8 = jnp.where(b64g[:, None], mv64g, mv8)
    ch64g = jnp.repeat(jnp.repeat(
        choice64.reshape(nr64, nc64), 2, 0), 2, 1).reshape(B)
    choice = jnp.where(b64g, ch64g, choice)
    mvb8 = jnp.where(b64g[:, None], 0, mvb8)
    return (b64_map, b64g, mv8, rec_y, rec_u, rec_v, lv_y, lv_u,
            lv_v, skip, split, skip16_out, choice, mvb8)



def p_frame_body(y, u, v, ryp, rup, rvp, dcq, acq, cdef_prm, rd,
                 by, bx, nby, nbx, deblock_fn=None, cdef_fn=None,
                 use_split: bool = True,
                 ryp2=None, rup2=None, rvp2=None, ds16=None,
                 use_satd: bool = False, refine16: bool = True,
                 fwd2: bool = False, intra_rdo: bool = False,
                 b64_rdo: bool = False,
                 search: int = SEARCH, subpel: bool = True,
                 use_split8: bool = False, bd: int = 8):
    """The whole batched P-frame encode for one (sub)frame region:
    grouped-conv full-pel search, subpel descent, 32-NONE vs 16-SPLIT
    RDO with the WriterCounter-twin rate model, skip RD, recon
    assembly, injected in-loop filters, compact level transfer.

    y/u/v: local (tile) source planes; ryp/rup/rvp: PADDED full-frame
    reference planes (replicated across shards - SURVEY §5.8
    "replicate refs, shard residual/recon work"); by/bx: GLOBAL pixel
    origins of the region's 32-blocks (may be traced, e.g. offset by
    the shard's tile index); deblock_fn/cdef_fn: filter+search
    callables (single-chip whole-frame or tiled halo-exchange
    variants)."""
    h, tw = y.shape[0], y.shape[1]
    B = nby * nbx
    # bit-depth threading: one static bd drives every clip/MC range
    # (10-bit shares InterRound 3/11 with 8-bit; SURVEY §7 M6)
    mx = (1 << bd) - 1
    from functools import partial as _prt
    mcb = _prt(_mc_batch, bd=bd)
    cavg = _prt(_comp_avg, bd=bd)
    blks = to_blocks(y, 32)                       # [B,32,32]
    # per-16 distortion scales (rav1e DistortionScale from lookahead
    # importance + activity masking, src/rdo.rs) weight every SSE term
    # in the RD decisions; ds16 [B,4] in (TL,TR,BL,BR) quad order
    if ds16 is None:
        ds16 = jnp.ones((B, 4), jnp.float32)
    ds32 = jnp.mean(ds16, axis=1)                 # [B]
    mv8, patch32, pir0, pic0, gridf0 = _search_one_ref(
        ryp, blks, by, bx, rd, B, use_satd, search, subpel, bd=bd)

    ub = to_blocks(u.astype(jnp.int32), 16)
    vb = to_blocks(v.astype(jnp.int32), 16)
    lam = rd["lam"]

    def exact_sse(ref_pad):
        def f(mv):
            p = mcb(ref_pad, by, bx, mv, 32, 0)
            return jnp.sum((p - blks).astype(jnp.float32) ** 2, (1, 2))
        return f

    def cand_pass(mv8, sse_fn, extra=None, grid_fn=None):
        """Left/above MV candidates with NEIGHBOR-RELATIVE rates: the
        real writer codes NEWMV residuals against the mv-stack
        predictor (~ the left/above MVs), so pricing |mv| from zero
        misjudges coherent-vs-stray MVs and leaves the field
        fragmented — every blob boundary then pays NEWMV+residual
        instead of the ~2-bit NEAREST alias (measured ~50 B/frame of
        pure signaling on a clean pan). rav1e rdo_mode_decision's
        NEARESTMV/NEARMV trials from the mv stack, batched.

        grid_fn (optional): cheap SSD-surface metric used to
        PRESELECT one best alternative among {left, above, zero,
        median} per block, so the expensive sse_fn runs only on
        {own, best-alt, extra} — 3 MC passes instead of 6 (the exact
        re-judge was ~20 ms of the decision core at 1080p)."""
        mvg = mv8.reshape(nby, nbx, 2)
        mvl = jnp.concatenate([mvg[:, :1], mvg[:, :-1]],
                              1).reshape(B, 2)
        mva = jnp.concatenate([mvg[:1], mvg[:-1]], 0).reshape(B, 2)

        def zero(mv):
            return (mv[:, 0] == 0) & (mv[:, 1] == 0)

        def dbits(mv, pred):
            d0 = jnp.minimum(jnp.abs(mv[:, 0] - pred[:, 0]), 1024)
            d1 = jnp.minimum(jnp.abs(mv[:, 1] - pred[:, 1]), 1024)
            return rd["mv_bits"][d0] + rd["mv_bits"][d1]

        def rate_rel(mv, pred):
            # GLOBALMV when zero; NEAREST alias when it matches the
            # stack predictor; NEWMV + residual bits otherwise
            r = rd["newmv"] + dbits(mv, pred)
            same = (mv[:, 0] == pred[:, 0]) & (mv[:, 1] == pred[:, 1])
            r = jnp.where(same & ~zero(pred), rd["nearest"], r)
            return jnp.where(zero(mv), rd["globalmv"], r)

        r_own = rate_rel(mv8, mvl)
        mv0 = jnp.zeros_like(mv8)
        # median MV: a GLOBAL candidate that collapses same-motion
        # blobs in one pass (neighbor candidates alone only move blob
        # boundaries one block per pass)
        mvmed = jnp.broadcast_to(
            (jnp.round(jnp.median(mv8, axis=0) / 2).astype(jnp.int32)
             * 2)[None], mv8.shape)    # quarter-pel grid (allow_hp=0)
        # the zero/GLOBALMV candidate is the GLOBAL attractor: at high
        # q the prediction-SSE landscape is flat (under the recon
        # noise floor), and without it incoherent all-skip MV blobs
        # are locally stable — each blob interior aliases NEAREST
        # while only boundaries pay, so neighbor candidates alone
        # collapse the field one ring per pass
        rates = [r_own,
                 jnp.where(zero(mvl), rd["globalmv"], rd["nearest"]),
                 jnp.where(zero(mva), rd["globalmv"], rd["near"]),
                 jnp.broadcast_to(rd["globalmv"], r_own.shape),
                 rate_rel(mvmed, mvl)]
        cands = [mv8, mvl, mva, mv0, mvmed]
        if grid_fn is not None:
            # preselect the best alternative on the free SSD surface
            alt_r = jnp.stack(rates[1:], 0)           # [4,B]
            alt_c = (ds32[None]
                     * jnp.stack([grid_fn(c) for c in cands[1:]], 0)
                     + lam * alt_r)
            ka = jnp.argmin(alt_c, 0)                 # [B]
            alt_mv = cands[1]
            for i in range(1, 4):
                alt_mv = jnp.where(ka[:, None] == i, cands[1 + i],
                                   alt_mv)
            cands = [mv8, alt_mv]
            rates = [rates[0],
                     jnp.take_along_axis(alt_r, ka[None], 0)[0]]
        if extra is not None:
            # hierarchical coarse MV (long-range; _coarse_mv): priced
            # as a plain NEWMV against the left predictor
            cands.append(extra)
            rates.append(rate_rel(extra, mvl))
        cand_r = jnp.stack(rates, 0)                  # [C,B]
        cc = (ds32[None] * jnp.stack([sse_fn(c) for c in cands], 0)
              + lam * cand_r)
        k = jnp.argmin(cc, 0)                         # own wins ties
        out = mv8
        for i in range(1, len(cands)):
            out = jnp.where(k[:, None] == i, cands[i], out)
        return out, jnp.take_along_axis(cand_r, k[None], 0)[0]

    if ryp2 is None:
        # ---- single-ref: neighbor-MV candidates + final prediction
        # (rav1e rdo_mode_decision's NEARESTMV/NEARMV trials from the
        # mv stack, restructured batched: the left/above ME MVs stand
        # in for the stack entries — after coding-order aliasing in
        # the packer a matching MV costs only the mode symbol).
        # Candidates are priced with NEIGHBOR-RELATIVE rates: the real
        # writer codes NEWMV residuals against the mv-stack predictor
        # (~ the left/above MVs), so pricing |mv| from zero misjudges
        # coherent-vs-stray MVs and leaves the field fragmented —
        # every blob boundary then pays NEWMV+residual instead of the
        # ~2-bit NEAREST alias (measured ~50 B/frame on a clean pan).
        # Blob erosion: each pass moves same-motion blob boundaries
        # one ring, so iterate the free full-pel-grid pass before one
        # exact-subpel re-judge (3 grid reads + 5 _mc_batch). -------
        for _ in range(8):
            mv8, _ = cand_pass(mv8, gridf0)
        # long-range rescue: 4x-downsampled coarse search covers
        # +-4*search px (anchor-to-anchor motion of fast objects lands
        # far outside the fine window; bench/bdrate object clip)
        mv_coarse = _coarse_mv(y, ryp, B, search)
        mv8, rate32 = cand_pass(mv8, exact_sse(ryp),
                                extra=mv_coarse, grid_fn=gridf0)
        pred_y = mcb(ryp, by, bx, mv8, 32, 0)
        pred_u = mcb(rup, by // 2, bx // 2, mv8, 16, 1)
        pred_v = mcb(rvp, by // 2, bx // 2, mv8, 16, 1)
        choice = jnp.zeros((B,), jnp.int32)
        mvb8 = jnp.zeros_like(mv8)
    else:
        # ---- two refs. B frame: fwd / bwd / compound-average RDO
        # (rav1e rdo_mode_decision inter loop over ref sets,
        # restructured as three fixed candidates per block).
        # fwd2: multi-ref P (LAST + GOLDEN, both forward) — two
        # single-ref candidates, no compound. ----------------------
        mvb8_, patchb, pbir, pbic, gridfb = _search_one_ref(
            ryp2, blks, by, bx, rd, B, use_satd, search, subpel,
            bd=bd)
        # per-ref MV-field coherence passes (see cand_pass): 3 free
        # full-pel-grid erosion rounds + one exact re-judge. Snapped
        # MVs may leave the M=1 descent patches, so predictions
        # rebuild via _mc_batch rather than _mc_patch
        for _ in range(8):
            mv8, _ = cand_pass(mv8, gridf0)
            mvb8_, _ = cand_pass(mvb8_, gridfb)
        mv_coarse = _coarse_mv(y, ryp, B, search)
        mvb_coarse = _coarse_mv(y, ryp2, B, search)
        mv8, rate_f = cand_pass(mv8, exact_sse(ryp),
                                extra=mv_coarse, grid_fn=gridf0)
        mvb8_, rate_b = cand_pass(mvb8_, exact_sse(ryp2),
                                  extra=mvb_coarse, grid_fn=gridfb)
        pf_y = mcb(ryp, by, bx, mv8, 32, 0)
        pb_y = mcb(ryp2, by, bx, mvb8_, 32, 0)

        def sse_of(p):
            d = (p - blks).astype(jnp.float32)
            return jnp.sum(d * d, axis=(1, 2))

        cost_f = ds32 * sse_of(pf_y) + lam * rate_f
        if fwd2:
            # GOLDEN pays the extra single-ref tree bits (~p3+p5)
            cost_b = ds32 * sse_of(pb_y) + lam * (rate_b + 2.0)
            choice = jnp.argmin(jnp.stack([cost_f, cost_b], 1), axis=1)
            pc_y = pf_y
        else:
            if_y = mcb(ryp, by, bx, mv8, 32, 0, interm=True)
            ib_y = mcb(ryp2, by, bx, mvb8_, 32, 0, interm=True)
            pc_y = cavg(if_y, ib_y)
            # compound signaling overhead vs single (comp_mode +
            # second ref + drl): ~2 bits on top of both MV residuals
            # minority-ref surcharge: a BWD block among FWD neighbors
            # codes against an empty ALTREF mv stack (no NEAREST
            # aliasing) + the comp_mode/ref-tree context flips —
            # ref-checkerboard fields cost real bits the per-block
            # trace can't see, so tilt ties toward the forward ref
            cost_b = ds32 * sse_of(pb_y) + lam * (rate_b + 4.0)
            cost_c = (ds32 * sse_of(pc_y)
                      + lam * (rate_f + rate_b + 2.0))
            choice = jnp.argmin(
                jnp.stack([cost_f, cost_b, cost_c], 1), axis=1)
        ch3 = choice[:, None, None]
        pred_y = jnp.where(ch3 == 0, pf_y,
                           jnp.where(ch3 == 1, pb_y, pc_y))
        pf_u = mcb(rup, by // 2, bx // 2, mv8, 16, 1)
        pf_v = mcb(rvp, by // 2, bx // 2, mv8, 16, 1)
        pb_u = mcb(rup2, by // 2, bx // 2, mvb8_, 16, 1)
        pb_v = mcb(rvp2, by // 2, bx // 2, mvb8_, 16, 1)
        if fwd2:
            pc_u, pc_v = pf_u, pf_v
        else:
            pc_u = cavg(
                mcb(rup, by // 2, bx // 2, mv8, 16, 1,
                          interm=True),
                mcb(rup2, by // 2, bx // 2, mvb8_, 16, 1,
                          interm=True))
            pc_v = cavg(
                mcb(rvp, by // 2, bx // 2, mv8, 16, 1,
                          interm=True),
                mcb(rvp2, by // 2, bx // 2, mvb8_, 16, 1,
                          interm=True))
        pred_u = jnp.where(ch3 == 0, pf_u,
                           jnp.where(ch3 == 1, pb_u, pc_u))
        pred_v = jnp.where(ch3 == 0, pf_v,
                           jnp.where(ch3 == 1, pb_v, pc_v))
        # primary MV: fwd for single-fwd/compound, second ref's for
        # single-second; second MV only meaningful for compound
        mvb8 = jnp.where((choice == 2)[:, None], mvb8_, 0)
        mv8 = jnp.where((choice == 1)[:, None], mvb8_, mv8)
        rate32 = None

    def code(resid, tx, chroma=False):
        # dynamic-q quantize/dequant (ops.ref.quant semantics with
        # dcq/acq as traced scalars); chroma planes quantize at the
        # frame-header delta_q_u qindex (rav1e QuantizerParameters)
        cf = T.forward_transform(resid, tx, TxType.DCT_DCT)
        n = tx.width
        shift = 2 if n == 64 else (1 if n * n > 256 else 0)
        dc_mask = np.zeros((n, n), bool)
        dc_mask[0, 0] = True
        dc_mask = jnp.asarray(dc_mask)
        qd = rd["dcq_c"] if chroma else dcq
        qa = rd["acq_c"] if chroma else acq
        q = jnp.where(dc_mask, qd, qa).astype(jnp.int32)
        bias = jnp.where(dc_mask, 21, 17)
        a = jnp.abs(cf) << shift
        lv = jnp.minimum((a + (q * bias) // 64) // q, (1 << 15) - 1)
        lv = jnp.sign(cf) * lv
        dqv = ((jnp.abs(lv) * q) & 0xFFFFFF) >> shift
        dq = jnp.sign(lv) * dqv
        r2 = T.inverse_transform(dq, tx, TxType.DCT_DCT, bd=bd)
        return lv, r2

    lv_y, r2_y = code(blks - pred_y, TxSize.TX_32X32)
    lv_u, r2_u = code(ub - pred_u, TxSize.TX_16X16, chroma=True)
    lv_v, r2_v = code(vb - pred_v, TxSize.TX_16X16, chroma=True)
    # skip as an RD decision (rav1e prices skip=1 vs coded
    # residual; src/rdo.rs luma_chroma_mode_rdo skip trial):
    # sse(recon) + λ(skip0 + coeff bits)  vs  sse(pred) + λ·skip1
    from rav1e_tpu.pipeline.tpu_intra import block_bits
    lam = rd["lam"]

    def mv_rate(mv):
        r = (rd["mv_bits"][jnp.abs(mv[..., 0])]
             + rd["mv_bits"][jnp.abs(mv[..., 1])])
        zero = (mv[..., 0] == 0) & (mv[..., 1] == 0)
        return jnp.where(zero, rd["globalmv"], r + rd["newmv"])

    cd_y = jnp.clip(pred_y + r2_y, 0, mx)
    cd_u = jnp.clip(pred_u + r2_u, 0, mx)
    cd_v = jnp.clip(pred_v + r2_v, 0, mx)
    sse_c = (jnp.sum((cd_y - blks).astype(jnp.float32) ** 2, (1, 2))
             + jnp.sum((cd_u - ub).astype(jnp.float32) ** 2, (1, 2))
             + jnp.sum((cd_v - vb).astype(jnp.float32) ** 2, (1, 2)))
    sse_s = (jnp.sum((pred_y - blks).astype(jnp.float32) ** 2, (1, 2))
             + jnp.sum((pred_u - ub).astype(jnp.float32) ** 2, (1, 2))
             + jnp.sum((pred_v - vb).astype(jnp.float32) ** 2, (1, 2)))
    cbits = (block_bits(lv_y, rd["y32"]) + block_bits(lv_u, rd["c16"])
             + block_bits(lv_v, rd["c16"]))
    skip = (ds32 * sse_s + lam * rd["skip1"]
            <= ds32 * sse_c + lam * (rd["skip0"] + cbits))
    sk3 = skip[:, None, None]
    lv_y = jnp.where(sk3, 0, lv_y)
    lv_u = jnp.where(sk3, 0, lv_u)
    lv_v = jnp.where(sk3, 0, lv_v)
    rec_y32 = jnp.where(sk3, pred_y, cd_y)
    rec_u32 = jnp.where(sk3, pred_u, cd_u)
    rec_v32 = jnp.where(sk3, pred_v, cd_v)
    cost32 = (lam * (mv_rate(mv8) if rate32 is None else rate32)
              + jnp.where(skip, ds32 * sse_s + lam * rd["skip1"],
                          ds32 * sse_c + lam * (rd["skip0"] + cbits)))

    # ---- PARTITION_SPLIT alternative: per-16 MVs + TX16/TX8
    # residuals (rav1e rdo_partition_decision restructured as a
    # second fixed-shape candidate set). use_split=False stubs the
    # candidate (cost=inf) so XLA dead-code-eliminates the search —
    # speed presets >7 drop split RDO entirely. ----
    offs_r = np.array([0, 0, 16, 16], np.int32)
    offs_c = np.array([0, 16, 0, 16], np.int32)
    by16 = (by[:, None] + offs_r[None, :]).reshape(-1)
    bx16 = (bx[:, None] + offs_c[None, :]).reshape(-1)

    def quads(x, n):
        # [B, 2n, 2n] -> [4B, n, n] in (TL, TR, BL, BR) order
        Bn = x.shape[0]
        return (x.reshape(Bn, 2, n, 2, n).transpose(0, 1, 3, 2, 4)
                .reshape(Bn * 4, n, n))

    def unquads(x, n):
        Bn = x.shape[0] // 4
        return (x.reshape(Bn, 2, 2, n, n).transpose(0, 1, 3, 2, 4)
                .reshape(Bn, 2 * n, 2 * n))

    blks16 = quads(blks, 16)
    ub8 = quads(ub, 8)
    vb8 = quads(vb, 8)

    if not use_split:
        split = jnp.zeros((B,), bool)
        sp3 = split[:, None, None]
        rec_y = rec_y32
        rec_u = rec_u32
        rec_v = rec_v32
        lv_y16 = jnp.zeros((B * 4, 16, 16), jnp.int32)
        lv_u8 = jnp.zeros((B * 4, 8, 8), jnp.int32)
        lv_v8 = jnp.zeros((B * 4, 8, 8), jnp.int32)
        mv16_out = jnp.repeat(mv8[:, None, :], 4, axis=1)
        skip16_out = jnp.repeat(skip[:, None], 4, axis=1)
        b64_map = None
        if b64_rdo and nby % 2 == 0 and nbx % 2 == 0:
            (b64_map, _b64g, mv8, rec_y, rec_u, rec_v, lv_y, lv_u,
             lv_v, skip, split, skip16_out, choice,
             mvb8) = _merge64_pass(
                y, u, v, ryp, rup, rvp, ryp2, rup2, rvp2, rd, lam,
                code, nby, nbx, mv8, rec_y, rec_u, rec_v, lv_y, lv_u,
                lv_v, skip, split, skip16_out, choice, mvb8, cost32,
                bd=bd)
            sp3 = split[:, None, None]
            mv16_out = jnp.repeat(mv8[:, None, :], 4, axis=1)
        return _finish_outputs(
            y, u, v, h, tw, nby, nbx, B, rd, cdef_prm, mv8, skip,
            split, sp3, mv16_out, skip16_out, lv_y, lv_u, lv_v,
            lv_y16, lv_u8, lv_v8, rec_y, rec_u, rec_v,
            deblock_fn, cdef_fn, choice, mvb8, b64_map=b64_map,
            bd=bd)

    ds16f = ds16.reshape(B * 4)
    mv_par = jnp.repeat(mv8, 4, axis=0)
    # two-ref: only the cheap {parent, LAST-zero} split is coded —
    # the refined per-16 descent is single-ref machinery (its patches
    # come from the FWD ref, but a compound parent's children decode
    # with both refs)
    refine16 = refine16 and ryp2 is None
    if refine16:
        # two patch gathers (parent- and zero-centered), then the
        # whole per-16 refinement runs in-patch: drift <= 8+4+2+2 =
        # 16 eighth-pel = 2 px (M=2)
        patch_p, pir_p, pic_p = _gather_patch(ryp, by16, bx16, mv_par,
                                              16, 0, 2)
        mv_zero = jnp.zeros_like(mv_par)
        patch_z, pir_z, pic_z = _gather_patch(ryp, by16, bx16, mv_zero,
                                              16, 0, 2)

        def cost16_from(patch, ir0, ic0, mv):
            pred = _mc_patch(patch, ir0, ic0, by16, bx16, mv, 16,
                             0, 2, bd=bd)
            d = (pred - blks16).astype(jnp.float32)
            return (ds16f * jnp.sum(d * d, axis=(1, 2))
                    + lam * (rd["mv_bits"][jnp.abs(mv[:, 0])]
                             + rd["mv_bits"][jnp.abs(mv[:, 1])]))

        best_par = cost16_from(patch_p, pir_p, pic_p, mv_par)
        zcost = cost16_from(patch_z, pir_z, pic_z, mv_zero)
        zbet = zcost < best_par
        mv16 = jnp.where(zbet[:, None], 0, mv_par)
        best16 = jnp.minimum(best_par, zcost)
        z3 = zbet[:, None, None]
        patch16 = jnp.where(z3, patch_z, patch_p)
        pir16 = jnp.where(zbet, pir_z, pir_p)
        pic16 = jnp.where(zbet, pic_z, pic_p)

        def cost16_of(mv):
            return cost16_from(patch16, pir16, pic16, mv)

        for step_sz in (8, 4, 2, 2):
            cands = jnp.stack([
                mv16 + jnp.array([-step_sz, 0]),
                mv16 + jnp.array([step_sz, 0]),
                mv16 + jnp.array([0, -step_sz]),
                mv16 + jnp.array([0, step_sz])], 0)
            costs = jnp.stack([cost16_of(c) for c in cands], 0)
            k = jnp.argmin(costs, axis=0)
            cbest = jnp.take_along_axis(costs, k[None], 0)[0]
            cmv = jnp.take_along_axis(
                cands, k[None, :, None].repeat(2, -1), 0)[0]
            better = cbest < best16
            mv16 = jnp.where(better[:, None], cmv, mv16)
            best16 = jnp.where(better, cbest, best16)

        pred_y16 = _mc_patch(patch16, pir16, pic16, by16, bx16,
                             mv16, 16, 0, 2, bd=bd)
        pred_u8 = mcb(rup, by16 // 2, bx16 // 2, mv16, 8, 1)
        pred_v8 = mcb(rvp, by16 // 2, bx16 // 2, mv16, 8, 1)
        if use_split8:
            # 16->8 children: 4x4 chroma predicts with the 4-tap bank
            # (spec w/h <= 4); same MV, so one 8x8-region pass equals
            # the four per-child passes
            pred_u8_4t = mcb(rup, by16 // 2, bx16 // 2, mv16,
                                   8, 1, four_tap=True)
            pred_v8_4t = mcb(rvp, by16 // 2, bx16 // 2, mv16,
                                   8, 1, four_tap=True)
    else:
        # cheap split (faster presets): per-16 MV in {parent, 0} —
        # BOTH predictions are free: parent = quadrant of the
        # 32-block subpel prediction; zero = the co-located reference
        # block (a static reshape + row gather, no dynamic slices,
        # no 8-tap work). Profiled: the full per-16 descent was 217
        # ms of a 385 ms 1080p step.
        hF = ryp.shape[0] - 2 * PAD
        wF = ryp.shape[1] - 2 * PAD
        idx16 = (by16 // 16) * (wF // 16) + bx16 // 16
        refy16 = to_blocks(
            jax.lax.slice(ryp, (PAD, PAD), (PAD + hF, PAD + wF)), 16)
        refu8 = to_blocks(
            jax.lax.slice(rup, (PAD // 2, PAD // 2),
                          (PAD // 2 + hF // 2, PAD // 2 + wF // 2)), 8)
        refv8 = to_blocks(
            jax.lax.slice(rvp, (PAD // 2, PAD // 2),
                          (PAD // 2 + hF // 2, PAD // 2 + wF // 2)), 8)
        pz_y = jnp.take(refy16, idx16, axis=0)
        pz_u = jnp.take(refu8, idx16, axis=0)
        pz_v = jnp.take(refv8, idx16, axis=0)
        pp_y = quads(pred_y, 16)
        pp_u = quads(pred_u, 8)
        pp_v = quads(pred_v, 8)

        def cost16_pred(pred, mv):
            d = (pred - blks16).astype(jnp.float32)
            return (ds16f * jnp.sum(d * d, axis=(1, 2))
                    + lam * (rd["mv_bits"][jnp.abs(mv[:, 0])]
                             + rd["mv_bits"][jnp.abs(mv[:, 1])]))

        zbet = (cost16_pred(pz_y, jnp.zeros_like(mv_par))
                < cost16_pred(pp_y, mv_par))
        if ryp2 is not None:
            # two-ref: a zero-MV child decodes as single-LAST
            # GLOBALMV (the zero candidate predicts from the FWD
            # ref); a non-fwd parent with zero MV would be
            # indistinguishable in the packed stream, so force those
            # quads to the zero child
            amb = ((mv_par[:, 0] == 0) & (mv_par[:, 1] == 0)
                   & (jnp.repeat(choice, 4, axis=0) != 0))
            zbet = zbet | amb
        mv16 = jnp.where(zbet[:, None], 0, mv_par)
        z3 = zbet[:, None, None]
        pred_y16 = jnp.where(z3, pz_y, pp_y)
        pred_u8 = jnp.where(z3, pz_u, pp_u)
        pred_v8 = jnp.where(z3, pz_v, pp_v)
        if use_split8:
            # 4-tap chroma for potential 16->8 children (spec w/h <=
            # 4): recompute the parent 32-block's chroma with the
            # 4-tap bank and quarter it; the zero-MV candidate is an
            # integer phase (impulse row), identical in both banks
            pp_u4t = quads(mcb(rup, by // 2, bx // 2, mv8,
                                     16, 1, four_tap=True), 8)
            pp_v4t = quads(mcb(rvp, by // 2, bx // 2, mv8,
                                     16, 1, four_tap=True), 8)
            pred_u8_4t = jnp.where(z3, pz_u, pp_u4t)
            pred_v8_4t = jnp.where(z3, pz_v, pp_v4t)
    lv_y16, r2_y16 = code(blks16 - pred_y16, TxSize.TX_16X16)
    lv_u8, r2_u8 = code(ub8 - pred_u8, TxSize.TX_8X8, chroma=True)
    lv_v8, r2_v8 = code(vb8 - pred_v8, TxSize.TX_8X8, chroma=True)
    cd_y16 = jnp.clip(pred_y16 + r2_y16, 0, mx)
    cd_u8 = jnp.clip(pred_u8 + r2_u8, 0, mx)
    cd_v8 = jnp.clip(pred_v8 + r2_v8, 0, mx)
    sse_c16 = (jnp.sum((cd_y16 - blks16).astype(jnp.float32) ** 2,
                       (1, 2))
               + jnp.sum((cd_u8 - ub8).astype(jnp.float32) ** 2,
                         (1, 2))
               + jnp.sum((cd_v8 - vb8).astype(jnp.float32) ** 2,
                         (1, 2)))
    sse_s16 = (jnp.sum((pred_y16 - blks16).astype(jnp.float32) ** 2,
                       (1, 2))
               + jnp.sum((pred_u8 - ub8).astype(jnp.float32) ** 2,
                         (1, 2))
               + jnp.sum((pred_v8 - vb8).astype(jnp.float32) ** 2,
                         (1, 2)))
    cbits16 = (block_bits(lv_y16, rd["y16"])
               + block_bits(lv_u8, rd["c8"])
               + block_bits(lv_v8, rd["c8"]))
    skip16 = (ds16f * sse_s16 + lam * rd["skip1"]
              <= ds16f * sse_c16 + lam * (rd["skip0"] + cbits16))
    s163 = skip16[:, None, None]
    lv_y16 = jnp.where(s163, 0, lv_y16)
    lv_u8 = jnp.where(s163, 0, lv_u8)
    lv_v8 = jnp.where(s163, 0, lv_v8)
    rec_y16 = jnp.where(s163, pred_y16, cd_y16)
    rec_u8 = jnp.where(s163, pred_u8, cd_u8)
    rec_v8 = jnp.where(s163, pred_v8, cd_v8)
    cost16 = (lam * mv_rate(mv16)
              + jnp.where(skip16, ds16f * sse_s16 + lam * rd["skip1"],
                          ds16f * sse_c16
                          + lam * (rd["skip0"] + cbits16)))

    # ---- 16->8 PARTITION_SPLIT candidate (rav1e partition_range down
    # to 8x8, SURVEY §1 "min 4x4"): four 8x8 children per 16-quad, MV
    # inherited from the parent (the packer NEAREST-aliases matching
    # MVs against the mv stack, ~2 bits each), TX_8X8 luma + TX_4X4
    # chroma residuals with their own skip RD. Wins on local detail
    # where one busy 8x8 otherwise forces the whole 16 to code. ----
    split16 = jnp.zeros((B, 4), bool)
    skip8_out = jnp.zeros((B, 4, 4), bool)
    lv_y8 = jnp.zeros((B * 16, 8, 8), jnp.int32)
    lv_u4 = jnp.zeros((B * 16, 4, 4), jnp.int32)
    lv_v4 = jnp.zeros((B * 16, 4, 4), jnp.int32)
    if use_split8:
        blks8 = quads(blks16, 8)                   # [16B, 8, 8]
        ub4 = quads(ub8, 4)
        vb4 = quads(vb8, 4)
        pred_y8 = quads(pred_y16, 8)
        # children's 4x4 chroma uses the 4-tap prediction (the parent
        # 16's own chroma stays 8-tap — different pixels at subpel)
        pred_u4 = quads(pred_u8_4t, 4)
        pred_v4 = quads(pred_v8_4t, 4)
        lv_y8, r2_y8 = code(blks8 - pred_y8, TxSize.TX_8X8)
        lv_u4, r2_u4 = code(ub4 - pred_u4, TxSize.TX_4X4, chroma=True)
        lv_v4, r2_v4 = code(vb4 - pred_v4, TxSize.TX_4X4, chroma=True)
        cd_y8 = jnp.clip(pred_y8 + r2_y8, 0, mx)
        cd_u4 = jnp.clip(pred_u4 + r2_u4, 0, mx)
        cd_v4 = jnp.clip(pred_v4 + r2_v4, 0, mx)
        ds8 = jnp.repeat(ds16f, 4, axis=0)
        sse_c8 = (jnp.sum((cd_y8 - blks8).astype(jnp.float32) ** 2,
                          (1, 2))
                  + jnp.sum((cd_u4 - ub4).astype(jnp.float32) ** 2,
                            (1, 2))
                  + jnp.sum((cd_v4 - vb4).astype(jnp.float32) ** 2,
                            (1, 2)))
        sse_s8 = (jnp.sum((pred_y8 - blks8).astype(jnp.float32) ** 2,
                          (1, 2))
                  + jnp.sum((pred_u4 - ub4).astype(jnp.float32) ** 2,
                            (1, 2))
                  + jnp.sum((pred_v4 - vb4).astype(jnp.float32) ** 2,
                            (1, 2)))
        cbits8 = (block_bits(lv_y8, rd["y8"])
                  + block_bits(lv_u4, rd["c4"])
                  + block_bits(lv_v4, rd["c4"]))
        skip8 = (ds8 * sse_s8 + lam * rd["skip1"]
                 <= ds8 * sse_c8 + lam * (rd["skip0"] + cbits8))
        s83 = skip8[:, None, None]
        lv_y8 = jnp.where(s83, 0, lv_y8)
        lv_u4 = jnp.where(s83, 0, lv_u4)
        lv_v4 = jnp.where(s83, 0, lv_v4)
        rec_y8 = jnp.where(s83, pred_y8, cd_y8)
        rec_u4 = jnp.where(s83, pred_u4, cd_u4)
        rec_v4 = jnp.where(s83, pred_v4, cd_v4)
        # inherited MV: the child aliases NEAREST from the mv stack
        cost8 = (lam * rd["nearest"]
                 + jnp.where(skip8, ds8 * sse_s8 + lam * rd["skip1"],
                             ds8 * sse_c8
                             + lam * (rd["skip0"] + cbits8)))
        c_s16 = (cost8.reshape(B * 4, 4).sum(axis=1)
                 + lam * rd["split_bits8"])
        s16f = c_s16 < cost16
        cost16 = jnp.where(s16f, c_s16, cost16)
        s16q = s16f[:, None, None]
        lv_y16 = jnp.where(s16q, unquads(lv_y8, 8), lv_y16)
        lv_u8 = jnp.where(s16q, unquads(lv_u4, 4), lv_u8)
        lv_v8 = jnp.where(s16q, unquads(lv_v4, 4), lv_v8)
        rec_y16 = jnp.where(s16q, unquads(rec_y8, 8), rec_y16)
        rec_u8 = jnp.where(s16q, unquads(rec_u4, 4), rec_u8)
        rec_v8 = jnp.where(s16q, unquads(rec_v4, 4), rec_v8)
        # exactness for filters: a split16 quad reports skip16 = AND
        # of its children (exact per-8 skips travel in skip8_out)
        skip16 = jnp.where(s16f,
                           jnp.all(skip8.reshape(B * 4, 4), axis=1),
                           skip16)
        split16 = s16f.reshape(B, 4)
        skip8_out = skip8.reshape(B, 4, 4)

    cost_split = (cost16.reshape(B, 4).sum(axis=1)
                  + lam * rd["split_bits"])
    split = cost_split < cost32
    sp3 = split[:, None, None]
    split16 = split16 & split[:, None]
    skip8_out = skip8_out & split16[:, :, None]

    # ---- choose + assemble ----
    lv_y = jnp.where(sp3, unquads(lv_y16, 16), lv_y)
    lv_u = jnp.where(sp3, unquads(lv_u8, 8), lv_u)
    lv_v = jnp.where(sp3, unquads(lv_v8, 8), lv_v)
    rec_y = jnp.where(sp3, unquads(rec_y16, 16), rec_y32)
    rec_u = jnp.where(sp3, unquads(rec_u8, 8), rec_u32)
    rec_v = jnp.where(sp3, unquads(rec_v8, 8), rec_v32)
    mv16_out = jnp.where(split[:, None, None],
                         mv16.reshape(B, 4, 2),
                         jnp.repeat(mv8[:, None, :], 4, axis=1))
    skip16_out = jnp.where(split[:, None], skip16.reshape(B, 4),
                           skip[:, None])
    cost_fin = jnp.where(split, cost_split, cost32)

    b64_map = jnp.zeros((((nby + 1) // 2), ((nbx + 1) // 2)), bool)
    b64g = jnp.zeros((B,), bool)
    if b64_rdo and nby % 2 == 0 and nbx % 2 == 0:
        (b64_map, b64g, mv8, rec_y, rec_u, rec_v, lv_y, lv_u, lv_v,
         skip, split, skip16_out, choice, mvb8) = _merge64_pass(
            y, u, v, ryp, rup, rvp, ryp2, rup2, rvp2, rd, lam, code,
            nby, nbx, mv8, rec_y, rec_u, rec_v, lv_y, lv_u, lv_v,
            skip, split, skip16_out, choice, mvb8, cost_fin, bd=bd)
        sp3 = split[:, None, None]

    if intra_rdo:
        # ---- intra-in-inter candidate (rav1e rdo_mode_decision's
        # intra set inside inter frames, src/rdo.rs): DC_PRED 32x32
        # from the UNFILTERED inter recon of neighbors. A block may
        # only flip where its above/left/above-left neighbors keep
        # their inter recon — otherwise its decoder-side edges would
        # change under it. Batched rule: flip only blocks whose
        # above/left/above-left neighbors do not also desire intra
        # (then no flipped block ever contributes edges to another —
        # DC/H/V/SMOOTH/PAETH never read above-right). Earns its keep
        # on newly-revealed content (pans) where MC predicts from
        # edge replication. -----------------------------------------
        from rav1e_tpu.ops.tpu.intra import predict_modes as _pm
        iy = jnp.asarray(np.repeat(np.arange(nby), nbx)
                         .astype(np.int32))
        jx = jnp.asarray(np.tile(np.arange(nbx), nby).astype(np.int32))
        has_a = iy > 0
        has_l = jx > 0

        def _dng(a):
            return jnp.concatenate([a[:1], a[:-1]], 0)

        def _rtg(a):
            return jnp.concatenate([a[:, :1], a[:, :-1]], 1)

        def edges(rec, n):
            g = rec.reshape(nby, nbx, n, n)
            a = _dng(g)[:, :, n - 1, :].reshape(B, n)
            le = _rtg(g)[:, :, :, n - 1].reshape(B, n)
            tl = _rtg(_dng(g))[:, :, n - 1, n - 1].reshape(B)
            return a, le, tl

        ia, il, itl = edges(rec_y, 32)
        pi_y = _pm((PredictionMode.DC_PRED,), ia, il, itl, has_a,
                   has_l, 32, 32)[0]
        ua, ul, utl = edges(rec_u, 16)
        pi_u = _pm((PredictionMode.DC_PRED,), ua, ul, utl, has_a,
                   has_l, 16, 16)[0]
        va, vl, vtl = edges(rec_v, 16)
        pi_v = _pm((PredictionMode.DC_PRED,), va, vl, vtl, has_a,
                   has_l, 16, 16)[0]
        lvi_y, r2i_y = code(blks - pi_y, TxSize.TX_32X32)
        lvi_u, r2i_u = code(ub - pi_u, TxSize.TX_16X16, chroma=True)
        lvi_v, r2i_v = code(vb - pi_v, TxSize.TX_16X16, chroma=True)
        cdi_y = jnp.clip(pi_y + r2i_y, 0, mx)
        cdi_u = jnp.clip(pi_u + r2i_u, 0, mx)
        cdi_v = jnp.clip(pi_v + r2i_v, 0, mx)
        sse_ic = (jnp.sum((cdi_y - blks).astype(jnp.float32) ** 2,
                          (1, 2))
                  + jnp.sum((cdi_u - ub).astype(jnp.float32) ** 2,
                            (1, 2))
                  + jnp.sum((cdi_v - vb).astype(jnp.float32) ** 2,
                            (1, 2)))
        sse_is = (jnp.sum((pi_y - blks).astype(jnp.float32) ** 2,
                          (1, 2))
                  + jnp.sum((pi_u - ub).astype(jnp.float32) ** 2,
                            (1, 2))
                  + jnp.sum((pi_v - vb).astype(jnp.float32) ** 2,
                            (1, 2)))
        cbits_i = (block_bits(lvi_y, rd["y32"])
                   + block_bits(lvi_u, rd["c16"])
                   + block_bits(lvi_v, rd["c16"]))
        skip_i = (ds32 * sse_is + lam * rd["skip1"]
                  <= ds32 * sse_ic + lam * (rd["skip0"] + cbits_i))
        cost_i = (lam * rd["intra32"]
                  + jnp.where(skip_i, ds32 * sse_is + lam * rd["skip1"],
                              ds32 * sse_ic
                              + lam * (rd["skip0"] + cbits_i)))
        desire = (cost_i < cost_fin) & ~b64g
        dg = desire.reshape(nby, nbx)

        def false_dn(a):
            return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], 0)

        def false_rt(a):
            return jnp.concatenate([jnp.zeros_like(a[:, :1]),
                                    a[:, :-1]], 1)

        d_a = false_dn(dg).reshape(B)
        d_l = false_rt(dg).reshape(B)
        d_al = false_rt(false_dn(dg)).reshape(B)
        flip = desire & (~d_a) & (~d_l) & (~d_al)
        f3 = flip[:, None, None]
        s_i3 = skip_i[:, None, None]
        rec_y = jnp.where(f3, jnp.where(s_i3, pi_y, cdi_y), rec_y)
        rec_u = jnp.where(f3, jnp.where(s_i3, pi_u, cdi_u), rec_u)
        rec_v = jnp.where(f3, jnp.where(s_i3, pi_v, cdi_v), rec_v)
        lv_y = jnp.where(f3, jnp.where(s_i3, 0, lvi_y), lv_y)
        lv_u = jnp.where(f3, jnp.where(s_i3, 0, lvi_u), lv_u)
        lv_v = jnp.where(f3, jnp.where(s_i3, 0, lvi_v), lv_v)
        skip = jnp.where(flip, skip_i, skip)
        split = split & ~flip
        sp3 = split[:, None, None]
        skip16_out = jnp.where(flip[:, None], skip_i[:, None],
                               skip16_out)
        choice = jnp.where(flip, 3, choice)   # 3 = INTRA (DC)
        mv8 = jnp.where(flip[:, None], 0, mv8)

    # b64 merge / intra flips may have cleared `split` under a quad
    # that wanted a sub-split: re-mask so the coded tree stays valid
    split16 = split16 & split[:, None]
    skip8_out = skip8_out & split16[:, :, None]
    return _finish_outputs(
        y, u, v, h, tw, nby, nbx, B, rd, cdef_prm, mv8, skip, split,
        sp3, mv16_out, skip16_out, lv_y, lv_u, lv_v, lv_y16, lv_u8,
        lv_v8, rec_y, rec_u, rec_v, deblock_fn, cdef_fn, choice, mvb8,
        b64_map=b64_map,
        split16=split16 if use_split8 else None,
        skip8_out=skip8_out, lv_y8=lv_y8, lv_u4=lv_u4, lv_v4=lv_v4,
        bd=bd)


def _finish_outputs(y, u, v, h, tw, nby, nbx, B, rd, cdef_prm, mv8,
                    skip, split, sp3, mv16_out, skip16_out, lv_y, lv_u,
                    lv_v, lv_y16, lv_u8, lv_v8, rec_y, rec_u, rec_v,
                    deblock_fn, cdef_fn, choice, mvb8, b64_map=None,
                    split16=None, skip8_out=None, lv_y8=None,
                    lv_u4=None, lv_v4=None, bd: int = 8):
    """Common tail of p_frame_body: in-loop filters + compact level
    transfer + output tuple."""
    fry = from_blocks(rec_y, h, tw, 32)
    fru = from_blocks(rec_u, h // 2, tw // 2, 16)
    frv = from_blocks(rec_v, h // 2, tw // 2, 16)
    srcs32 = [y, u.astype(jnp.int32), v.astype(jnp.int32)]
    has8 = split16 is not None
    if not has8:
        split16 = jnp.zeros((B, 4), bool)
        skip8_out = jnp.zeros((B, 4, 4), bool)
    s16g, skip8g = _sub_grids(nby, nbx, split16, skip16_out, skip8_out)
    if deblock_fn is not None:
        # in-loop deblock with level search (rav1e
        # deblock_filter_optimize analog); 16-px edge grid with
        # interior edges gated by the split map, 8-px edges + shorter
        # taps inside 16->8 split quads (sub_map)
        lf_lvl, (fry, fru, frv) = deblock_fn(
            [fry, fru, frv], srcs32, rd["base_lf"],
            split.reshape(nby, nbx),
            jnp.repeat(jnp.repeat(s16g, 2, 0), 2, 1) if has8 else None)
    else:
        lf_lvl = jnp.int32(0)
    if cdef_fn is not None:
        # in-loop CDEF with strength-set search (rdo_loop_decision
        # analog); chosen entry signaled in the frame header. The
        # 8x8-unit skip gate is exact: per-8 skips inside split16
        # quads, the quad's skip elsewhere (decoder parity).
        cdef_idx, (fry, fru, frv) = cdef_fn(
            [fry, fru, frv], srcs32, skip8g, cdef_prm[4])
    else:
        cdef_idx = jnp.zeros(((nby + 1) // 2, (nbx + 1) // 2),
                             jnp.int32)
    # scan-order level line [B, 1536]: y(1024) | u(256) | v(256),
    # split blocks contribute per-sub-TX scans in quadrant order —
    # the nonzero stream (pack_outputs) makes the transfer scale with
    # the actual coefficient content
    sl = scanline(lv_y, lv_u, lv_v, lv_y16, lv_u8, lv_v8, split, B,
                  lv_y8, lv_u4, lv_v4, split16 if has8 else None)
    if b64_map is None:
        b64_map = jnp.zeros(((nby + 1) // 2, (nbx + 1) // 2), bool)
    return (mv8, skip, sl,
            lv_y.astype(jnp.int16), lv_u.astype(jnp.int16),
            lv_v.astype(jnp.int16),
            fry.astype(_pix_dtype(bd)), fru.astype(_pix_dtype(bd)),
            frv.astype(_pix_dtype(bd)), lf_lvl, cdef_idx,
            split, mv16_out.astype(jnp.int32),
            skip16_out, choice.astype(jnp.int32),
            mvb8.astype(jnp.int32), b64_map, split16, skip8_out)


def _sub_grids(nby, nbx, split16, skip16_out, skip8_out):
    """Spatial grids from quad-ordered flags: s16g [2nby, 2nbx] — the
    per-16 sub-split (split16) map; skip8g [4nby, 4nbx] — the exact
    8x8-unit skip map (per-8 inside split16 quads, the 16's skip
    elsewhere)."""
    B = nby * nbx
    s16g = (split16.reshape(nby, nbx, 2, 2)
            .transpose(0, 2, 1, 3).reshape(nby * 2, nbx * 2))
    sk16 = (skip16_out.reshape(nby, nbx, 2, 2)
            .transpose(0, 2, 1, 3).reshape(nby * 2, nbx * 2))
    # [B, 4(quad), 4(sub)] -> [4nby, 4nbx]
    sk8 = (skip8_out.reshape(nby, nbx, 2, 2, 2, 2)
           .transpose(0, 2, 4, 1, 3, 5).reshape(nby * 4, nbx * 4))
    base = jnp.repeat(jnp.repeat(sk16, 2, 0), 2, 1)
    s16x = jnp.repeat(jnp.repeat(s16g, 2, 0), 2, 1)
    return s16g, jnp.where(s16x, sk8, base)


def scanline(lv_y, lv_u, lv_v, lv_y16, lv_u8, lv_v8, split, B,
             lv_y8=None, lv_u4=None, lv_v4=None, split16=None):
    """Device-side [B, 1536] int16 scan-ordered level line (split
    blocks: quadrant-major sub-TX scans; split16 quads: sub-quadrant-
    major 8x8/4x4 scans inside the quad's 256/64-entry region)."""
    scan32, scan16, scan8, scan4 = _scans()
    y_n = jnp.take(lv_y.reshape(B, 1024), jnp.asarray(scan32), axis=1)
    u_n = jnp.take(lv_u.reshape(B, 256), jnp.asarray(scan16), axis=1)
    v_n = jnp.take(lv_v.reshape(B, 256), jnp.asarray(scan16), axis=1)
    y_s = jnp.take(lv_y16.reshape(B, 4, 256),
                   jnp.asarray(scan16), axis=2)         # [B, 4, 256]
    u_s = jnp.take(lv_u8.reshape(B, 4, 64),
                   jnp.asarray(scan8), axis=2)          # [B, 4, 64]
    v_s = jnp.take(lv_v8.reshape(B, 4, 64),
                   jnp.asarray(scan8), axis=2)
    if split16 is not None:
        # note lv_y8/lv_u4/lv_v4 hold the sub-TX levels in (quad, sub)
        # order [16B, n, n]; per-quad select between the 16-scan and
        # the four concatenated sub scans
        y_8 = jnp.take(lv_y8.reshape(B, 4, 4, 64),
                       jnp.asarray(scan8), axis=3).reshape(B, 4, 256)
        u_4 = jnp.take(lv_u4.reshape(B, 4, 4, 16),
                       jnp.asarray(scan4), axis=3).reshape(B, 4, 64)
        v_4 = jnp.take(lv_v4.reshape(B, 4, 4, 16),
                       jnp.asarray(scan4), axis=3).reshape(B, 4, 64)
        sq = split16.reshape(B, 4)[:, :, None]
        y_s = jnp.where(sq, y_8, y_s)
        u_s = jnp.where(sq, u_4, u_s)
        v_s = jnp.where(sq, v_4, v_s)
    y_s = y_s.reshape(B, 1024)
    u_s = u_s.reshape(B, 256)
    v_s = v_s.reshape(B, 256)
    s1 = split[:, None]
    return jnp.concatenate(
        [jnp.where(s1, y_s, y_n), jnp.where(s1, u_s, u_n),
         jnp.where(s1, v_s, v_n)], axis=1).astype(jnp.int16)



# ---- single-buffer host<->device IO --------------------------------
# The tunneled chip's host link charges ~38 ms fixed latency per
# device->host transfer and ~14 MB/s each way (measured 2026-08-17).
# All per-frame decisions therefore ship as ONE int8 buffer, and the
# source planes upload as ONE packed uint8 array.

HDR_BYTES = 35       # per-block control record (mv/flags/choice/sub8)
SL_LEN = 1536        # scan-line length per block (y 1024 + u/v 256)


def _stream_cap(B: int) -> int:
    """Static capacity of the nonzero-coefficient stream (entries).
    64 nonzeros/block average covers busy frames; blocks past the cap
    fall back to the full-precision dense gather."""
    return B * 64


@lru_cache(maxsize=2)
def _stream_maps():
    """Host inverse maps: stream position p (0..1535) -> plane and
    raster (spatial) index within the plane's level array, for the
    NONE-partition, SPLIT, and sub-SPLIT (16->8) layouts, plus the
    quad index of each position (selects the per-quad layout)."""
    scan32, scan16, scan8, scan4 = _scans()
    pl = np.empty(SL_LEN, np.int8)
    pl[:1024] = 0
    pl[1024:1280] = 1
    pl[1280:] = 2
    idx_ns = np.empty(SL_LEN, np.int32)
    idx_ns[:1024] = scan32
    idx_ns[1024:1280] = scan16
    idx_ns[1280:] = scan16
    idx_sp = np.empty(SL_LEN, np.int32)
    idx_s8 = np.empty(SL_LEN, np.int32)
    quad_of = np.empty(SL_LEN, np.int32)
    for p in range(1024):
        q, s = p // 256, scan16[p % 256]
        sr, sc = s // 16, s % 16
        idx_sp[p] = (16 * (q // 2) + sr) * 32 + 16 * (q % 2) + sc
        quad_of[p] = q
        k, s8 = (p % 256) // 64, scan8[p % 64]
        r8, c8 = s8 // 8, s8 % 8
        idx_s8[p] = ((16 * (q // 2) + 8 * (k // 2) + r8) * 32
                     + 16 * (q % 2) + 8 * (k % 2) + c8)
    for base in (1024, 1280):
        for k in range(256):
            q, s = k // 64, scan8[k % 64]
            sr, sc = s // 8, s % 8
            idx_sp[base + k] = (8 * (q // 2) + sr) * 16 + 8 * (q % 2) + sc
            quad_of[base + k] = q
            j, s4 = (k % 64) // 16, scan4[k % 16]
            r4, c4 = s4 // 4, s4 % 4
            idx_s8[base + k] = ((8 * (q // 2) + 4 * (j // 2) + r4) * 16
                                + 8 * (q % 2) + 4 * (j % 2) + c4)
    return pl, idx_ns, idx_sp, idx_s8, quad_of


def nnz_stream(sl, cap):
    """Device-side stream compaction of the scan line: returns
    (counts [B] int32, pos [cap+1] int32, val [cap+1] int32) with the
    nonzero entries of `sl` in FIXED per-block slots of k = cap // B
    entries (block-major, scan order; slot tail zero-padded). Blocks
    with more than k nonzeros overflow (host full-gathers those).

    Formulated as a per-row top_k over position keys — the previous
    global-cumsum scatter lowered to two 14.5 ms scatter fusions at
    1080p (2/3 of the pack dispatch); top_k + one aligned gather is
    dense work. The global-budget semantics are gone: overflow is now
    per block (> k nonzeros), which is also better behaved — one busy
    region no longer spills every later block to the dense path."""
    B, L = sl.shape
    k = cap // B
    sl32 = sl.astype(jnp.int32)
    nz = sl32 != 0
    counts = jnp.sum(nz.astype(jnp.int32), axis=1)
    # key: earlier scan positions get larger keys; zeros get 0
    key = jnp.where(nz, L - jnp.arange(L, dtype=jnp.int32)[None, :], 0)
    topv = jax.lax.top_k(key, k)[0]              # [B, k] descending
    live = topv > 0
    pos = jnp.where(live, L - topv, 0)           # ascending scan pos
    val = jnp.where(live, jnp.take_along_axis(sl32, pos, axis=1), 0)
    pad = jnp.zeros((1,), jnp.int32)
    return (counts, jnp.concatenate([pos.reshape(-1), pad]),
            jnp.concatenate([val.reshape(-1), pad]))


def _i16_hi_lo(x):
    """int16 -> (hi int8, lo int8) lanes (arithmetic-shift encoding;
    host rebuilds hi*256 + lo)."""
    x = x.astype(jnp.int32)
    return (x >> 8).astype(jnp.int8), (x & 255).astype(jnp.uint8)


def pack_outputs(o):
    """Device-side: p_frame_body outputs -> ONE flat int8 buffer:
    [B+1 header rows | counts int16[B] | pos int16[cap+1] |
    val int16[cap+1]].

    Header row (HDR_BYTES): mv8 hi/lo int16[2] | mv16 int16[4,2] |
    7 flag bytes (skip, 0, split, skip16[4]) | mvb8 hi/lo int16[2] |
    ref choice | split16 nibble | skip8 bits lo/hi (16 sub-skips in
    (quad, sub) order). Tail header row: [lf_lvl, cdef_idx].

    Levels travel as a stream of (scan position, value) pairs for the
    NONZERO coefficients only (nnz_stream), so the transfer scales
    with the frame's actual coefficient content instead of a fixed
    per-block budget — the tunneled chip link is ~17 MB/s."""
    mv8, skip, sl = o[0], o[1], o[2]
    lf, cdef_idx = o[9], o[10]
    split, mv16, skip16 = o[11], o[12], o[13]
    choice, mvb8 = o[14], o[15]
    b64_map = o[16]
    split16, skip8 = o[17], o[18]
    B = mv8.shape[0]
    cap = _stream_cap(B)

    def words(x):
        hi, lo = _i16_hi_lo(x.reshape(B, -1))
        return jnp.stack([hi, lo.astype(jnp.int8)], -1).reshape(B, -1)

    def bits(x):
        # [B, k<=8] bool -> one packed byte column
        k = x.shape[1]
        w = jnp.sum(x.astype(jnp.int32)
                    << jnp.arange(k, dtype=jnp.int32)[None], axis=1)
        return w.astype(jnp.int8)[:, None]

    zero = jnp.zeros((B, 1), jnp.int8)
    flags = jnp.concatenate(
        [skip[:, None].astype(jnp.int8), zero,
         split[:, None].astype(jnp.int8),
         skip16.astype(jnp.int8)], axis=1)
    sk8f = skip8.reshape(B, 16)
    hdr = jnp.concatenate([words(mv8), words(mv16), flags,
                           words(mvb8),
                           choice[:, None].astype(jnp.int8),
                           bits(split16.reshape(B, 4)),
                           bits(sk8f[:, :8]), bits(sk8f[:, 8:])],
                          axis=1)
    tail = jnp.zeros((1, HDR_BYTES), jnp.int8)
    tail = tail.at[0, 0].set(lf.astype(jnp.int8))
    hdr = jnp.concatenate([hdr, tail], axis=0)

    counts, pos, val = nnz_stream(sl, cap)

    def words1(x):
        x = x.astype(jnp.int32)
        return jnp.stack([(x >> 8).astype(jnp.int8),
                          (x & 255).astype(jnp.int8)], -1).reshape(-1)

    return jnp.concatenate([hdr.reshape(-1), words1(counts),
                            words1(pos), words1(val),
                            cdef_idx.reshape(-1).astype(jnp.int8),
                            b64_map.reshape(-1).astype(jnp.int8)])


def unpack_outputs(buf: np.ndarray, nby: int, nbx: int):
    """Host-side twin of pack_outputs. Returns (mv8, skip, split,
    mv16, skip16, choice, mvb8, lf_lvl, cdef_map, counts, pos, val)
    — the caller (_fetch_packed / unpack_stream) scatters the stream
    back into per-block level arrays."""
    buf = np.asarray(buf)
    total = buf.shape[0]
    B = nby * nbx
    nsb = ((nby + 1) // 2) * ((nbx + 1) // 2)
    assert (B + 1) * HDR_BYTES + 2 * B + 4 * (_stream_cap(B) + 1) \
        + 2 * nsb == total, total
    cap = _stream_cap(B)
    o0 = (B + 1) * HDR_BYTES
    hdr = buf[:o0].reshape(B + 1, HDR_BYTES)
    body, tail = hdr[:-1], hdr[-1]

    def unw(raw):
        w = raw.reshape(-1, 2).astype(np.int32)
        return w[:, 0] * 256 + (w[:, 1] & 0xFF)

    counts = unw(buf[o0:o0 + 2 * B])
    o1 = o0 + 2 * B
    pos = unw(buf[o1:o1 + 2 * (cap + 1)])
    o2 = o1 + 2 * (cap + 1)
    val = unw(buf[o2:o2 + 2 * (cap + 1)]).astype(np.int16)
    o3 = o2 + 2 * (cap + 1)
    cdef_map = (buf[o3:o3 + nsb].astype(np.uint8)
                .reshape((nby + 1) // 2, (nbx + 1) // 2))
    b64_map = (buf[o3 + nsb:] != 0).reshape((nby + 1) // 2,
                                            (nbx + 1) // 2)

    def unwords(cols, shape):
        w = body[:, cols].reshape(B, -1, 2).astype(np.int16)
        return (w[:, :, 0] * 256 + (w[:, :, 1] & 0xFF)).reshape(shape)

    mv8 = unwords(slice(0, 4), (B, 2)).astype(np.int32)
    mv16 = unwords(slice(4, 20), (B, 4, 2)).astype(np.int32)
    flags = body[:, 20:27] != 0
    skip, split = flags[:, 0], flags[:, 2]
    skip16 = flags[:, 3:7]
    mvb8 = unwords(slice(27, 31), (B, 2)).astype(np.int32)
    choice = body[:, 31].astype(np.int32)

    def unbits(col, k):
        w = body[:, col].astype(np.int32) & 0xFF
        return (w[:, None] >> np.arange(k)[None]) & 1 != 0

    split16 = unbits(32, 4)                        # [B, 4]
    skip8 = np.concatenate([unbits(33, 8), unbits(34, 8)],
                           axis=1).reshape(B, 4, 4)
    return (mv8, skip, split, mv16, skip16, choice, mvb8,
            int(tail[0]), cdef_map, counts, pos, val, b64_map,
            split16, skip8)


def unpack_stream(counts, pos, val, split, cap=None, split16=None):
    """Scatter the nonzero stream back into per-block level arrays
    (lv_y [B,32,32], lv_u/lv_v [B,16,16] int16). Returns the arrays
    plus `over` — blocks whose entries ran past the stream capacity
    (caller full-gathers those). split16 [B, 4] selects the sub-split
    (8x8/4x4 scan) layout per quad."""
    B = counts.shape[0]
    if cap is None:
        cap = _stream_cap(B)
    k = cap // B
    kc = np.minimum(counts, k)
    over = counts > k
    lv_y = np.zeros((B, 1024), np.int16)
    lv_u = np.zeros((B, 256), np.int16)
    lv_v = np.zeros((B, 256), np.int16)
    n = int(kc.sum())
    if n:
        # fixed per-block slots: block b's entries at [b*k, b*k+kc[b])
        mask = np.arange(k)[None, :] < kc[:, None]
        blk, slot = np.nonzero(mask)
        posr = pos[:B * k].reshape(B, k)
        valr = val[:B * k].reshape(B, k)
        p = posr[blk, slot]
        v = valr[blk, slot]
        pl, idx_ns, idx_sp, idx_s8, quad_of = _stream_maps()
        plane = pl[p]
        sidx = np.where(split[blk], idx_sp[p], idx_ns[p])
        if split16 is not None and split16.any():
            sub = split[blk] & split16[blk, quad_of[p]]
            sidx = np.where(sub, idx_s8[p], sidx)
        m = plane == 0
        lv_y[blk[m], sidx[m]] = v[m]
        m = plane == 1
        lv_u[blk[m], sidx[m]] = v[m]
        m = plane == 2
        lv_v[blk[m], sidx[m]] = v[m]
    return (lv_y.reshape(B, 32, 32), lv_u.reshape(B, 16, 16),
            lv_v.reshape(B, 16, 16), over)


def _pix_dtype(bd: int):
    return jnp.uint8 if bd == 8 else jnp.uint16


def pack_src(planes, bd: int = 8) -> np.ndarray:
    """Host-side: [y, u, v] 4:2:0 -> one [3h/2, w] array (u|v side
    by side under y) for a single upload; uint8 at 8-bit, uint16
    above."""
    dt = np.uint8 if bd == 8 else np.uint16
    y, u, v = (np.asarray(p, dt) for p in planes)
    return np.concatenate([y, np.concatenate([u, v], axis=1)], axis=0)


def _unpack_src(buf, h, w):
    y = buf[:h].astype(jnp.int32)
    u = buf[h:, :w // 2].astype(jnp.int32)
    v = buf[h:, w // 2:].astype(jnp.int32)
    return y, u, v


@lru_cache(maxsize=8)
def _core(h: int, w: int, use_cdef: bool = False,
          use_deblock: bool = True, use_split: bool = True,
          two_ref: bool = False, use_satd: bool = False,
          refine16: bool = True, fwd2: bool = False,
          intra_rdo: bool = False, b64_rdo: bool = False,
          search: int = SEARCH, subpel: bool = True,
          use_split8: bool = False, bd: int = 8):
    """Single-chip batched P-frame step for an h x w frame. qindex
    enters as a traced argument (dcq/acq scalars) so rate control
    never triggers a recompile. Takes the packed source buffer and
    returns (packed decisions, full-precision levels (device-resident,
    gathered only for dense blocks), recon planes).

    two_ref=True builds the B-frame step: the source searches both a
    forward and a backward reference and each block picks single-fwd /
    single-bwd / COMPOUND_AVERAGE by RD (split RDO unsupported)."""
    nby, nbx = h // 32, w // 32
    by = (np.repeat(np.arange(nby), nbx) * 32).astype(np.int32)
    bx = (np.tile(np.arange(nbx), nby) * 32).astype(np.int32)
    # two_ref + use_split: the cheap {parent, LAST-zero} per-16 split
    # (refine16 and 16->8 depth stay single-ref)

    def pad3(ry, ru, rv):
        return (jnp.pad(ry.astype(jnp.int32), PAD, mode="edge"),
                jnp.pad(ru.astype(jnp.int32), PAD // 2, mode="edge"),
                jnp.pad(rv.astype(jnp.int32), PAD // 2, mode="edge"))

    # The in-loop filter searches run as a SEPARATE dispatch chained
    # on device: fused into the decision program they degraded XLA's
    # schedule (~+320 ms/frame at 1080p for a 3 ms CDEF search);
    # standalone they cost what they compute.
    @jax.jit
    def filt(src, fry, fru, frv, base_lf, cdef_prm, split, skip16,
             b64m, lam, split16, skip8q):
        y, u, v = _unpack_src(src, h, w)
        srcs32 = [y, u.astype(jnp.int32), v.astype(jnp.int32)]
        planes = [fry.astype(jnp.int32), fru.astype(jnp.int32),
                  frv.astype(jnp.int32)]
        s16g, skip8 = _sub_grids(nby, nbx, split16, skip16, skip8q)
        lf_lvl = jnp.int32(0)
        if use_deblock:
            from rav1e_tpu.ops.tpu.deblock import deblock_search
            lf_lvl, planes = deblock_search(
                planes, srcs32, base_lf, block_y=16, block_c=8,
                bd=bd, split_map=split.reshape(nby, nbx),
                merge_map=b64m if b64_rdo else None,
                sub_map=(jnp.repeat(jnp.repeat(s16g, 2, 0), 2, 1)
                         if use_split8 else None))
        if use_cdef:
            # per-64x64-SB strength-index RDO over the 8-entry ladder
            # (rav1e rdo_loop_decision per-SB index, cdef_bits=3);
            # skip gate exact at 8x8 units (per-8 inside split16)
            from rav1e_tpu.ops.tpu.cdef import cdef_search_persb_jax
            cdef_idx, planes = cdef_search_persb_jax(
                planes, srcs32, skip8, cdef_prm[4], lam=lam, bd=bd)
        else:
            cdef_idx = jnp.zeros(((nby + 1) // 2, (nbx + 1) // 2),
                                 jnp.int32)
        dt = _pix_dtype(bd)
        return (lf_lvl, cdef_idx, planes[0].astype(dt),
                planes[1].astype(dt), planes[2].astype(dt))

    @jax.jit
    def pack(o, lf_lvl, cdef_idx):
        o = list(o)
        o[9], o[10] = lf_lvl, cdef_idx
        return pack_outputs(o)

    if two_ref:
        @jax.jit
        def core(src, ry, ru, rv, ry2, ru2, rv2, dcq, acq, cdef_prm,
                 rd, ds):
            y, u, v = _unpack_src(src, h, w)
            ryp, rup, rvp = pad3(ry, ru, rv)
            ryp2, rup2, rvp2 = pad3(ry2, ru2, rv2)
            return p_frame_body(y, u, v, ryp, rup, rvp, dcq, acq,
                                cdef_prm, rd, jnp.asarray(by),
                                jnp.asarray(bx), nby, nbx, None,
                                None, use_split, ryp2, rup2, rvp2,
                                ds16=ds, use_satd=use_satd, fwd2=fwd2,
                                search=search, subpel=subpel, bd=bd)

        def step(src, ry, ru, rv, ry2, ru2, rv2, dcq, acq, cdef_prm,
                 rd, ds):
            o = core(src, ry, ru, rv, ry2, ru2, rv2, dcq, acq,
                     cdef_prm, rd, ds)
            if not (use_deblock or use_cdef):
                return (pack(o, o[9], o[10]), o[3], o[4], o[5],
                        o[6], o[7], o[8])
            lf_lvl, cdef_idx, fry, fru, frv = filt(
                src, o[6], o[7], o[8], rd["base_lf"], cdef_prm,
                o[11], o[13], o[16], rd["lam"], o[17], o[18])
            return (pack(o, lf_lvl, cdef_idx), o[3], o[4], o[5],
                    fry, fru, frv)
    else:
        @jax.jit
        def core(src, ry, ru, rv, dcq, acq, cdef_prm, rd, ds):
            y, u, v = _unpack_src(src, h, w)
            ryp, rup, rvp = pad3(ry, ru, rv)
            return p_frame_body(y, u, v, ryp, rup, rvp, dcq, acq,
                                cdef_prm, rd, jnp.asarray(by),
                                jnp.asarray(bx), nby, nbx, None,
                                None, use_split, ds16=ds,
                                use_satd=use_satd, refine16=refine16,
                                intra_rdo=intra_rdo, b64_rdo=b64_rdo,
                                search=search, subpel=subpel,
                                use_split8=use_split8 and use_split,
                                bd=bd)

        def step(src, ry, ru, rv, dcq, acq, cdef_prm, rd, ds):
            o = core(src, ry, ru, rv, dcq, acq, cdef_prm, rd, ds)
            if not (use_deblock or use_cdef):
                return (pack(o, o[9], o[10]), o[3], o[4], o[5],
                        o[6], o[7], o[8])
            lf_lvl, cdef_idx, fry, fru, frv = filt(
                src, o[6], o[7], o[8], rd["base_lf"], cdef_prm,
                o[11], o[13], o[16], rd["lam"], o[17], o[18])
            return (pack(o, lf_lvl, cdef_idx), o[3], o[4], o[5],
                    fry, fru, frv)

        # profiling handles (tools/profile_gop.py stage split)
        step.core = core
        step.filt = filt if (use_deblock or use_cdef) else None
        step.pack = pack

    @jax.jit
    def gather_dense(lv_y, lv_u, lv_v, idx):
        """ONE transfer for all dense blocks' full-precision levels:
        [D, 1024+256+256] int16."""
        return jnp.concatenate(
            [jnp.take(lv_y, idx, 0).reshape(idx.shape[0], -1),
             jnp.take(lv_u, idx, 0).reshape(idx.shape[0], -1),
             jnp.take(lv_v, idx, 0).reshape(idx.shape[0], -1)], axis=1)

    return step, (nby, nbx), gather_dense


def _fetch_outputs(o):
    """Pull one frame's RAW p_frame_body outputs to host (tile-
    parallel path: outputs are already sharded small). Scatters the
    scan line back to spatial level arrays.

    Returns (mv8, skip32, lv_y, lv_u, lv_v, split, mv16, skip16);
    for split blocks the level arrays hold the four sub-TX blocks in
    quadrant layout."""
    mv8 = np.asarray(o[0])
    skip = np.asarray(o[1])
    split = np.asarray(o[11])
    mv16 = np.asarray(o[12])
    skip16 = np.asarray(o[13])
    sl = np.asarray(o[2])
    B = mv8.shape[0]
    pl, idx_ns, idx_sp, _idx_s8, _q = _stream_maps()
    lv_y = np.zeros((B, 1024), np.int16)
    lv_u = np.zeros((B, 256), np.int16)
    lv_v = np.zeros((B, 256), np.int16)
    blk, p = np.nonzero(sl)
    v = sl[blk, p]
    plane = pl[p]
    sidx = np.where(split[blk], idx_sp[p], idx_ns[p])
    for pi, lv in ((0, lv_y), (1, lv_u), (2, lv_v)):
        m = plane == pi
        lv[blk[m], sidx[m]] = v[m]
    return (mv8, skip, lv_y.reshape(B, 32, 32),
            lv_u.reshape(B, 16, 16), lv_v.reshape(B, 16, 16),
            split, mv16, skip16)


def _fetch_packed(o, gather_dense, nby, nbx, packed=None):
    """Pull one frame's decisions to host: ONE transfer of the packed
    buffer + (rarely) one batched gather for stream-overflow blocks.
    `packed` supplies an already-fetched host copy of o[0] (the GOP
    loop fetches every frame's buffer in one batched transfer).

    Returns (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16,
    lf_lvl, cdef_idx, choice, mvb8, b64_map, split16, skip8)."""
    (mv8, skip, split, mv16, skip16, choice, mvb8, lf, cdef_map,
     counts, pos, val, b64_map, split16, skip8) = unpack_outputs(
        o[0] if packed is None else packed, nby, nbx)
    lv_y, lv_u, lv_v, over = unpack_stream(counts, pos, val, split,
                                           split16=split16)
    didx = np.nonzero(over)[0]
    if len(didx):
        g = np.asarray(gather_dense(o[1], o[2], o[3],
                                    jnp.asarray(didx)))
        lv_y[didx] = g[:, :1024].reshape(-1, 32, 32)
        lv_u[didx] = g[:, 1024:1280].reshape(-1, 16, 16)
        lv_v[didx] = g[:, 1280:].reshape(-1, 16, 16)
    return (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16,
            lf, cdef_map, choice, mvb8, b64_map, split16, skip8)


def _pack_pframe(h, w, qindex, order_hint, mv8, skip, lv_y, lv_u, lv_v,
                 use_native=True, cdef=None, film_grain=None,
                 render_size=None, lf_level=0, split=None, mv16=None,
                 skip16=None, refresh_flags=0x01, ref_slot=0,
                 show_frame=True, choice=None, b64_map=None,
                 lr_ctx=None, split16=None, skip8=None,
                 bit_depth: int = 8, tile_grid: tuple | None = None):
    """Entropy-pack one P frame from batched pipeline outputs.

    lr_ctx: optional (recon_planes, source_planes) — search + apply
    loop restoration on the post-CDEF recon (mutating it in place, so
    the caller's recon becomes the in-loop LR'd reference) and code
    the per-unit params in the tile (rav1e src/lrf.rs; only the
    python writer codes LR units, so this forces use_native=False).

    split/mv16/skip16 (optional) describe PARTITION_SPLIT 32-blocks:
    four 16x16 sub-blocks with their own MVs and TX16/TX8 residuals
    stored in quadrant layout inside lv_*.

    split16/skip8 (optional) describe a further 16->8 PARTITION_SPLIT
    ([B,4] / [B,4,4] in quad, sub-quad order): each split 16 codes
    four 8x8 children inheriting the parent quad's MV, with TX_8X8
    luma + TX_4X4 chroma levels stored spatially inside lv_*.

    cdef: None, a 5-tuple (single frame-wide strength), or
    ((base5, damping...), idx_map) — the per-SB form signals the
    8-entry ladder in the header (cdef_bits=3) and a literal index
    per 64x64 SB in the tile (spec read_cdef)."""
    cdef_map = None
    if cdef is not None and isinstance(cdef[1], np.ndarray):
        cdef, cdef_map = cdef
    seq = Sequence(width=w, height=h, enable_cdef=cdef is not None,
                   bit_depth=bit_depth,
                   film_grain_params_present=film_grain is not None)
    lf = int(lf_level)
    fp = FrameParams(frame_type=FrameType.INTER, base_q_idx=qindex,
                     render_size=render_size,
                     loop_filter_levels=(lf, lf, lf, lf))
    fp.film_grain = film_grain
    from rav1e_tpu.ops.ref.quant import chroma_dq as _cdq
    fp.delta_q_u_dc = fp.delta_q_u_ac = _cdq(qindex)
    cdef_bits = 0
    if cdef_map is not None:
        from rav1e_tpu.ops.tpu.cdef import compact_ladder
        fp.cdef_damping = cdef[4]
        (fp.cdef_strengths, cdef_bits,
         cdef_map) = compact_ladder(cdef_map)
    elif cdef is not None:
        (fp.cdef_y_pri, fp.cdef_y_sec, fp.cdef_uv_pri,
         fp.cdef_uv_sec, fp.cdef_damping) = cdef
    ti = TileInfo(seq)
    mi_rows, mi_cols = h >> 2, w >> 2
    nbx = w // 32
    intra_map = (np.asarray(choice) == 3) if choice is not None else None
    if intra_map is not None and not intra_map.any():
        intra_map = None
    if b64_map is not None and not np.asarray(b64_map).any():
        b64_map = None
    if split16 is not None and not np.asarray(split16).any():
        split16 = skip8 = None
    mvq8 = None
    if split16 is not None:
        # 8x8 children inherit the parent 16's MV (the writer
        # NEAREST-aliases a stack-matching MV to ~2 bits)
        mvq8 = np.repeat(np.asarray(mv16)[:, :, None, :], 4, axis=2)
    if lr_ctx is not None:
        use_native = False
    if tile_grid is not None:
        # multi-tile frame: whole-frame decisions, per-tile entropy
        # states (AV1 tiles are independent by spec; the TPU pipeline
        # searched the whole frame — inter prediction and the in-loop
        # filters legally cross tile boundaries).  C++ packer per
        # tile, packed concurrently (it releases the GIL).
        from concurrent.futures import ThreadPoolExecutor

        from rav1e_tpu.entropy.native import NativeTileWriter
        ti = TileInfo(seq, tile_grid[0], tile_grid[1])
        B = mv8.shape[0]
        nbx = w // 32
        if split is None:
            split = np.zeros(B, bool)
            mv16 = np.repeat(mv8[:, None, :], 4, axis=1)
            skip16 = np.repeat(
                np.asarray(skip).reshape(B, 1), 4, axis=1)

        def pack_tile(tc):
            tr, tcol = tc
            rs, re = ti.row_starts[tr], ti.row_starts[tr + 1]
            cs, ce = ti.col_starts[tcol], ti.col_starts[tcol + 1]
            brow = np.arange(rs * 2, min(re * 2, h // 32))
            bcol = np.arange(cs * 2, min(ce * 2, w // 32))
            bidx = (brow[:, None] * nbx + bcol[None, :]).reshape(-1)
            tw_t = NativeTileWriter(
                min(re * 16, mi_rows) - rs * 16,
                min(ce * 16, mi_cols) - cs * 16,
                qindex, inter_frame=True)
            cmap_t = (cdef_map[rs:re, cs:ce]
                      if cdef_map is not None else None)
            b64_t = (b64_map[rs:re, cs:ce]
                     if b64_map is not None else None)
            return tw_t.write_inter_tile_fast2(
                split[bidx], mv8[bidx], skip[bidx], mv16[bidx],
                skip16[bidx], lv_y[bidx], lv_u[bidx], lv_v[bidx],
                cdef_idx=cmap_t, cdef_bits=cdef_bits,
                intra32=intra_map[bidx] if intra_map is not None
                else None,
                b64=b64_t,
                split16=split16[bidx] if split16 is not None else None,
                mvq8=mvq8[bidx] if mvq8 is not None else None,
                skip8=skip8[bidx] if skip8 is not None else None)

        coords = [(tr, tcol) for tr in range(ti.n_rows)
                  for tcol in range(ti.n_cols)]
        with ThreadPoolExecutor(min(len(coords), 8)) as ex:
            tiles = list(ex.map(pack_tile, coords))
        return interframe_packet(seq, fp, ti, tiles, order_hint,
                                 refresh_flags=refresh_flags,
                                 ref_idx=[ref_slot] * 7,
                                 show_frame=show_frame)
    if use_native:
        try:
            from rav1e_tpu.entropy.native import NativeTileWriter
            tw = NativeTileWriter(mi_rows, mi_cols, qindex,
                                  inter_frame=True)
            if (split is None and cdef_bits == 0
                    and intra_map is None and b64_map is None
                    and split16 is None):
                tile = tw.write_inter_tile_fast(mv8, skip, lv_y, lv_u,
                                                lv_v)
            else:
                B = mv8.shape[0]
                if split is None:
                    split = np.zeros(B, bool)
                    mv16 = np.repeat(mv8[:, None, :], 4, axis=1)
                    skip16 = np.repeat(
                        np.asarray(skip).reshape(B, 1), 4, axis=1)
                tile = tw.write_inter_tile_fast2(
                    split, mv8, skip, mv16, skip16, lv_y, lv_u, lv_v,
                    cdef_idx=cdef_map, cdef_bits=cdef_bits,
                    intra32=intra_map, b64=b64_map,
                    split16=split16, mvq8=mvq8, skip8=skip8)
            return interframe_packet(seq, fp, ti, [tile], order_hint,
                                     refresh_flags=refresh_flags,
                                     ref_idx=[ref_slot] * 7,
                                     show_frame=show_frame)
        except Exception:
            pass
    tw = TileWriter(mi_rows, mi_cols, qindex, inter_frame=True)
    if cdef_bits:
        tw.cdef_bits = cdef_bits
        tw.cdef_idx_map = cdef_map
    if lr_ctx is not None:
        # must run before write_tile: LR unit params are coded
        # interleaved at superblock starts (spec decode_lr)
        from rav1e_tpu.pipeline.lr import apply_lr_frame
        seq.enable_restoration = True
        fp.lr_types = apply_lr_frame(lr_ctx[0], lr_ctx[1], tw, 8, 1, 1)
    partitions: dict = {}
    blocks: dict = {}

    def inter_block(mv, sk, yl, ul, vl):
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
        if b64_map is not None and b64_map[by // 64, bx // 64]:
            if by % 64 or bx % 64:
                continue              # covered by the TL 64-block
            # PARTITION_NONE at 64: TX_64X64 luma (retained 32x32
            # levels in the TL child slot) + TX_32X32 chroma
            # reassembled from the four children's quadrant slots
            partitions[(r, c, int(BlockSize.B64X64))] = \
                PartitionType.NONE
            lv64 = np.zeros((64, 64), np.int64)
            lv64[:32, :32] = lv_y[b]
            cu = np.zeros((32, 32), np.int64)
            cv = np.zeros((32, 32), np.int64)
            for q, (dr, dc) in enumerate(
                    ((0, 0), (0, 16), (16, 0), (16, 16))):
                child = b + (q >> 1) * nbx + (q & 1)
                cu[dr: dr + 16, dc: dc + 16] = lv_u[child]
                cv[dr: dr + 16, dc: dc + 16] = lv_v[child]
            mv = (int(mv8[b, 0]), int(mv8[b, 1]))
            d = BlockDecision(
                y_mode=(PredictionMode.GLOBALMV if mv == (0, 0)
                        else PredictionMode.NEWMV),
                uv_mode=PredictionMode.DC_PRED,
                skip=bool(skip[b]), mv=mv)
            if not d.skip:
                d.coeffs = {0: lv64, 1: cu, 2: cv}
            blocks[(r, c)] = d
            continue
        partitions[(r, c, int(BlockSize.B64X64))] = PartitionType.SPLIT
        if intra_map is not None and intra_map[b]:
            # intra-in-inter block (spec inter_frame_mode_info with
            # is_inter = 0): DC luma + DC chroma
            d = BlockDecision(y_mode=PredictionMode.DC_PRED,
                              uv_mode=PredictionMode.DC_PRED,
                              skip=bool(skip[b]), ref=0)
            if not d.skip:
                d.coeffs = {0: lv_y[b], 1: lv_u[b], 2: lv_v[b]}
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.NONE
            blocks[(r, c)] = d
            continue
        if split is not None and split[b]:
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.SPLIT
            for q, (dr, dc) in enumerate(
                    ((0, 0), (0, 4), (4, 0), (4, 4))):
                py, px = dr * 4, dc * 4
                cy, cx = dr * 2, dc * 2
                if split16 is not None and split16[b, q]:
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
                        blocks[(r + dr + sr, c + dc + sc)] = \
                            inter_block(
                                mvq8[b, q, s], skip8[b, q, s],
                                lv_y[b][sy: sy + 8, sx: sx + 8],
                                lv_u[b][scy: scy + 4, scx: scx + 4],
                                lv_v[b][scy: scy + 4, scx: scx + 4])
                    continue
                partitions[(r + dr, c + dc, int(BlockSize.B16X16))] = \
                    PartitionType.NONE
                blocks[(r + dr, c + dc)] = inter_block(
                    mv16[b, q], skip16[b, q],
                    lv_y[b][py: py + 16, px: px + 16],
                    lv_u[b][cy: cy + 8, cx: cx + 8],
                    lv_v[b][cy: cy + 8, cx: cx + 8])
            continue
        partitions[(r, c, int(BlockSize.B32X32))] = PartitionType.NONE
        blocks[(r, c)] = inter_block(mv8[b], skip[b], lv_y[b],
                                     lv_u[b], lv_v[b])
    tile = tw.write_tile(partitions, blocks)
    return interframe_packet(seq, fp, ti, [tile], order_hint,
                             refresh_flags=refresh_flags,
                             ref_idx=[ref_slot] * 7,
                             show_frame=show_frame)


def _ds16_quads(dscale, nby: int, nbx: int):
    """Per-16 distortion-scale grid [2*nby, 2*nbx] -> [B,4] in the
    quad (TL,TR,BL,BR) order p_frame_body expects; ones if None."""
    if dscale is None:
        return jnp.ones((nby * nbx, 4), jnp.float32)
    g = np.asarray(dscale, np.float32)
    assert g.shape == (2 * nby, 2 * nbx), (g.shape, nby, nbx)
    return jnp.asarray(
        g.reshape(nby, 2, nbx, 2).transpose(0, 2, 1, 3)
        .reshape(nby * nbx, 4))


def encode_pframe_tpu(planes, ref_planes, qindex: int = 100,
                      order_hint: int = 1, use_native: bool = True,
                      ref_dev=None, return_device: bool = False,
                      cdef: tuple | None = None, film_grain=None,
                      render_size: tuple | None = None,
                      use_split: bool = True,
                      refresh_flags: int = 0x01, ref_slot: int = 0,
                      show_frame: bool = True, dscale=None,
                      src_dev=None, use_satd: bool = False,
                      refine16: bool = True, intra_rdo: bool = False,
                      b64_rdo: bool = False, lr: bool = False,
                      search: int = SEARCH, subpel: bool = True,
                      use_split8: bool = False, bit_depth: int = 8,
                      tile_grid: tuple | None = None):
    """TPU-batched P frame. Same bitstream contract as encode_pframe.

    ref_dev: optional device-resident reference planes (from a prior
    call with return_device=True) — skips the host->device upload.
    src_dev: optional device-resident packed source (pack_src output
    uploaded earlier, e.g. at send_frame time) — same purpose.
    dscale: optional per-16x16 distortion-scale grid [h/16, w/16]
    (lookahead importance / activity masking, rav1e DistortionScale).
    search/subpel: SpeedSettings.search_px / .subpel."""
    y, u, v = planes
    h, w = y.shape[0], y.shape[1]
    assert h % 32 == 0 and w % 32 == 0
    step, (nby, nbx), gather_dense = _core(h, w, cdef is not None,
                                           use_split=use_split,
                                           use_satd=use_satd,
                                           refine16=refine16,
                                           intra_rdo=intra_rdo,
                                           b64_rdo=b64_rdo,
                                           search=search, subpel=subpel,
                                           use_split8=use_split8,
                                           bd=bit_depth)
    np_pix = np.uint8 if bit_depth == 8 else np.uint16
    if ref_dev is None:
        ref_dev = tuple(jnp.asarray(np.asarray(p, np_pix))
                        for p in ref_planes)
    cdef_prm = jnp.asarray(
        list(cdef) if cdef is not None else [0, 0, 0, 0, 3], jnp.int32)
    if src_dev is None:
        src_dev = jnp.asarray(pack_src(planes, bd=bit_depth))
    outs = step(src_dev, *ref_dev,
                jnp.int32(dc_q_lut(qindex, 0, bit_depth)),
                jnp.int32(ac_q_lut(qindex, 0, bit_depth)),
                cdef_prm, build_rd_inter(qindex, bit_depth),
                _ds16_quads(dscale, nby, nbx))
    rec_dev = outs[4:7]
    (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16, lf_lvl,
     cdef_map, choice, _, b64_map, split16,
     skip8) = _fetch_packed(outs, gather_dense, nby, nbx)
    rec_y, rec_u, rec_v = [np.asarray(o) for o in rec_dev]
    rec = [rec_y.astype(np.int32), rec_u.astype(np.int32),
           rec_v.astype(np.int32)]
    pkt = _pack_pframe(h, w, qindex, order_hint, mv8, skip,
                       lv_y, lv_u, lv_v, use_native,
                       (cdef, cdef_map) if cdef is not None else None,
                       film_grain, render_size,
                       lf_lvl, split, mv16, skip16,
                       refresh_flags, ref_slot, show_frame,
                       choice=choice if intra_rdo else None,
                       b64_map=b64_map if b64_rdo else None,
                       lr_ctx=(rec, [np.asarray(y), np.asarray(u),
                                     np.asarray(v)]) if lr else None,
                       split16=split16 if use_split8 else None,
                       skip8=skip8 if use_split8 else None,
                       bit_depth=bit_depth, tile_grid=tile_grid)
    if return_device:
        # LR mutates the host recon after the device copy was taken:
        # the device-resident planes would be a stale (pre-LR) ref
        assert not lr, "return_device is incompatible with lr"
        return pkt, rec, rec_dev
    return pkt, rec


def _pack_pframe_mref(h, w, qindex, order_hint, mv8, choice, skip,
                      lv_y, lv_u, lv_v, cdef=None, lf_level=0,
                      film_grain=None, render_size=None,
                      slot_last=0, slot_golden=1, golden_hint=0,
                      refresh_flags=0x01, bit_depth: int = 8):
    """Entropy-pack a multi-ref P frame: choice[b] 0 = LAST,
    1 = GOLDEN (both forward, single prediction — spec
    read_ref_frames single path p1/p3/p4/p5). rav1e's multi-ref
    rdo_mode_decision loop (SURVEY §2.2 ME/RDO) restructured as two
    fixed candidates per block."""
    cdef_map = None
    if cdef is not None and isinstance(cdef[1], np.ndarray):
        cdef, cdef_map = cdef
    seq = Sequence(width=w, height=h, enable_cdef=cdef is not None,
                   bit_depth=bit_depth,
                   film_grain_params_present=film_grain is not None)
    lf = int(lf_level)
    fp = FrameParams(frame_type=FrameType.INTER, base_q_idx=qindex,
                     render_size=render_size,
                     loop_filter_levels=(lf, lf, lf, lf))
    fp.film_grain = film_grain
    from rav1e_tpu.ops.ref.quant import chroma_dq as _cdq
    fp.delta_q_u_dc = fp.delta_q_u_ac = _cdq(qindex)
    if cdef_map is not None:
        from rav1e_tpu.ops.tpu.cdef import compact_ladder
        fp.cdef_damping = cdef[4]
        fp.cdef_strengths, _cbits, cdef_map = compact_ladder(cdef_map)
    elif cdef is not None:
        (fp.cdef_y_pri, fp.cdef_y_sec, fp.cdef_uv_pri,
         fp.cdef_uv_sec, fp.cdef_damping) = cdef
    ti = TileInfo(seq)
    mi_rows, mi_cols = h >> 2, w >> 2
    nbx = w // 32
    tw = TileWriter(mi_rows, mi_cols, qindex, inter_frame=True,
                    ref_sign_bias={1: False, 4: False})
    if cdef_map is not None and _cbits:
        tw.cdef_bits = _cbits
        tw.cdef_idx_map = cdef_map
    partitions: dict = {}
    blocks: dict = {}
    for b in range(mv8.shape[0]):
        by, bx = (b // nbx) * 32, (b % nbx) * 32
        r, c = by >> 2, bx >> 2
        partitions[(r, c, int(BlockSize.B64X64))] = PartitionType.SPLIT
        partitions[(r, c, int(BlockSize.B32X32))] = PartitionType.NONE
        mv = (int(mv8[b, 0]), int(mv8[b, 1]))
        mode = (PredictionMode.GLOBALMV if mv == (0, 0)
                else PredictionMode.NEWMV)
        d = BlockDecision(y_mode=mode,
                          uv_mode=PredictionMode.DC_PRED,
                          skip=bool(skip[b]), mv=mv,
                          ref=1 if int(choice[b]) == 0 else 4)
        if not d.skip:
            d.coeffs = {0: lv_y[b], 1: lv_u[b], 2: lv_v[b]}
        blocks[(r, c)] = d
    tile = tw.write_tile(partitions, blocks)
    ref_idx = [slot_last] * 7
    ref_idx[3] = slot_golden
    fp.ref_order_hints = [0] * 7
    fp.ref_order_hints[3] = golden_hint
    return interframe_packet(seq, fp, ti, [tile], order_hint,
                             refresh_flags=refresh_flags,
                             ref_idx=ref_idx)


def encode_pframe2_tpu(planes, ref_last, ref_golden, qindex: int = 100,
                       order_hint: int = 1, cdef: tuple | None = None,
                       slot_last: int = 0, slot_golden: int = 1,
                       golden_hint: int = 0, dscale=None,
                       use_satd: bool = False,
                       render_size: tuple | None = None,
                       refresh_flags: int = 0x01):
    """Multi-ref P frame: every block RD-picks LAST vs GOLDEN (rav1e
    multi-ref; the GOLDEN slot typically holds the GOP's keyframe).
    Split RDO is not yet combined with multi-ref."""
    y = planes[0]
    h, w = y.shape[0], y.shape[1]
    assert h % 32 == 0 and w % 32 == 0
    step, (nby, nbx), gather_dense = _core(
        h, w, cdef is not None, use_split=False, two_ref=True,
        use_satd=use_satd, fwd2=True)
    refd = tuple(jnp.asarray(np.asarray(p, np.uint8))
                 for p in ref_last)
    refg = tuple(jnp.asarray(np.asarray(p, np.uint8))
                 for p in ref_golden)
    cdef_prm = jnp.asarray(
        list(cdef) if cdef is not None else [0, 0, 0, 0, 3], jnp.int32)
    outs = step(jnp.asarray(pack_src(planes)), *refd, *refg,
                jnp.int32(dc_q_lut(qindex)), jnp.int32(ac_q_lut(qindex)),
                cdef_prm, build_rd_inter(qindex),
                _ds16_quads(dscale, nby, nbx))
    (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16, lf_lvl,
     cdef_map, choice, _, _b64, _s16, _sk8) = _fetch_packed(
        outs, gather_dense, nby, nbx)
    pkt = _pack_pframe_mref(
        h, w, qindex, order_hint, mv8, choice, skip, lv_y, lv_u, lv_v,
        cdef=(cdef, cdef_map) if cdef is not None else None,
        lf_level=lf_lvl, render_size=render_size,
        slot_last=slot_last, slot_golden=slot_golden,
        golden_hint=golden_hint, refresh_flags=refresh_flags)
    rec = [np.asarray(o).astype(np.int32) for o in outs[4:7]]
    return pkt, rec


def _pack_bframe(h, w, qindex, order_hint, mv8, mvb8, choice, skip,
                 lv_y, lv_u, lv_v, cdef=None, film_grain=None,
                 render_size=None, lf_level=0, slot_fwd=0, slot_bwd=1,
                 ref_hints=None, refresh_flags=0, show_frame=True,
                 b64_map=None, lr_ctx=None, bit_depth: int = 8,
                 split=None, mv16=None, skip16=None,
                 tile_grid: tuple | None = None):
    """Entropy-pack one B frame from batched two-ref pipeline outputs.

    choice[b] in {0: single-LAST(fwd), 1: single-ALTREF(bwd),
    2: COMPOUND_AVERAGE (LAST, ALTREF)}; mv8 is the primary MV
    (fwd for 0/2, bwd for 1), mvb8 the backward MV when compound.
    Bitstream contract matches pipeline/inter.py::encode_bframe
    (rav1e reordered InterConfig path, src/api/internal.rs)."""
    cdef_map = None
    if cdef is not None and isinstance(cdef[1], np.ndarray):
        cdef, cdef_map = cdef
    seq = Sequence(width=w, height=h, enable_cdef=cdef is not None,
                   bit_depth=bit_depth,
                   film_grain_params_present=film_grain is not None)
    lf = int(lf_level)
    fp = FrameParams(frame_type=FrameType.INTER, base_q_idx=qindex,
                     render_size=render_size,
                     loop_filter_levels=(lf, lf, lf, lf))
    fp.film_grain = film_grain
    from rav1e_tpu.ops.ref.quant import chroma_dq as _cdq
    fp.delta_q_u_dc = fp.delta_q_u_ac = _cdq(qindex)
    if cdef_map is not None:
        from rav1e_tpu.ops.tpu.cdef import compact_ladder
        fp.cdef_damping = cdef[4]
        fp.cdef_strengths, _cbits, cdef_map = compact_ladder(cdef_map)
    elif cdef is not None:
        (fp.cdef_y_pri, fp.cdef_y_sec, fp.cdef_uv_pri,
         fp.cdef_uv_sec, fp.cdef_damping) = cdef
    ti = TileInfo(seq)
    mi_rows, mi_cols = h >> 2, w >> 2
    nbx = w // 32
    tw = TileWriter(mi_rows, mi_cols, qindex, inter_frame=True,
                    ref_sign_bias={1: False, 7: True},
                    reference_select=True)
    if cdef_map is not None and _cbits:
        tw.cdef_bits = _cbits
        tw.cdef_idx_map = cdef_map
    if lr_ctx is not None:
        from rav1e_tpu.pipeline.lr import apply_lr_frame
        seq.enable_restoration = True
        fp.lr_types = apply_lr_frame(lr_ctx[0], lr_ctx[1], tw, 8, 1, 1)
    partitions: dict = {}
    blocks: dict = {}
    for b in range(mv8.shape[0]):
        by, bx = (b // nbx) * 32, (b % nbx) * 32
        r, c = by >> 2, bx >> 2
        if b64_map is not None and b64_map[by // 64, bx // 64]:
            if by % 64 or bx % 64:
                continue              # covered by the TL 64-block
            partitions[(r, c, int(BlockSize.B64X64))] = \
                PartitionType.NONE
            lv64 = np.zeros((64, 64), np.int64)
            lv64[:32, :32] = lv_y[b]
            cu = np.zeros((32, 32), np.int64)
            cv = np.zeros((32, 32), np.int64)
            for q, (dr, dc) in enumerate(
                    ((0, 0), (0, 16), (16, 0), (16, 16))):
                child = b + (q >> 1) * nbx + (q & 1)
                cu[dr: dr + 16, dc: dc + 16] = lv_u[child]
                cv[dr: dr + 16, dc: dc + 16] = lv_v[child]
            mv = (int(mv8[b, 0]), int(mv8[b, 1]))
            d = BlockDecision(
                y_mode=(PredictionMode.GLOBALMV if mv == (0, 0)
                        else PredictionMode.NEWMV),
                uv_mode=PredictionMode.DC_PRED,
                skip=bool(skip[b]), mv=mv,
                ref=1 if int(choice[b]) == 0 else 7)
            if not d.skip:
                d.coeffs = {0: lv64, 1: cu, 2: cv}
            blocks[(r, c)] = d
            continue
        partitions[(r, c, int(BlockSize.B64X64))] = PartitionType.SPLIT
        if split is not None and split[b]:
            # cheap per-16 split: each child is either the parent's
            # (ref-choice, MV/MV-pair) or a single-LAST GLOBALMV-zero
            # block (mv16 == 0 selects the latter; device forces the
            # zero child when a non-fwd parent has zero MV)
            partitions[(r, c, int(BlockSize.B32X32))] = \
                PartitionType.SPLIT
            chp = int(choice[b])
            for q, (dr, dc) in enumerate(
                    ((0, 0), (0, 4), (4, 0), (4, 4))):
                py, px = dr * 4, dc * 4
                cy, cx = dr * 2, dc * 2
                partitions[(r + dr, c + dc, int(BlockSize.B16X16))] = \
                    PartitionType.NONE
                cmv = (int(mv16[b, q, 0]), int(mv16[b, q, 1]))
                if cmv == (0, 0):
                    d = BlockDecision(y_mode=PredictionMode.GLOBALMV,
                                      uv_mode=PredictionMode.DC_PRED,
                                      skip=bool(skip16[b, q]),
                                      mv=(0, 0), ref=1)
                elif chp == 2:
                    mv2 = (int(mvb8[b, 0]), int(mvb8[b, 1]))
                    mode = (PredictionMode.GLOBAL_GLOBALMV
                            if cmv == (0, 0) and mv2 == (0, 0)
                            else PredictionMode.NEW_NEWMV)
                    d = BlockDecision(y_mode=mode,
                                      uv_mode=PredictionMode.DC_PRED,
                                      skip=bool(skip16[b, q]),
                                      mv=cmv, ref=1)
                    d.ref2 = 7
                    d.mv2 = mv2
                else:
                    mode = (PredictionMode.GLOBALMV if cmv == (0, 0)
                            else PredictionMode.NEWMV)
                    d = BlockDecision(y_mode=mode,
                                      uv_mode=PredictionMode.DC_PRED,
                                      skip=bool(skip16[b, q]),
                                      mv=cmv,
                                      ref=1 if chp == 0 else 7)
                if not d.skip:
                    d.coeffs = {
                        0: lv_y[b][py: py + 16, px: px + 16],
                        1: lv_u[b][cy: cy + 8, cx: cx + 8],
                        2: lv_v[b][cy: cy + 8, cx: cx + 8]}
                blocks[(r + dr, c + dc)] = d
            continue
        partitions[(r, c, int(BlockSize.B32X32))] = PartitionType.NONE
        ch = int(choice[b])
        mv = (int(mv8[b, 0]), int(mv8[b, 1]))
        if ch == 2:
            mv2 = (int(mvb8[b, 0]), int(mvb8[b, 1]))
            mode = (PredictionMode.GLOBAL_GLOBALMV
                    if mv == (0, 0) and mv2 == (0, 0)
                    else PredictionMode.NEW_NEWMV)
            d = BlockDecision(y_mode=mode,
                              uv_mode=PredictionMode.DC_PRED,
                              skip=bool(skip[b]), mv=mv, ref=1)
            d.ref2 = 7
            d.mv2 = mv2
        else:
            mode = (PredictionMode.GLOBALMV if mv == (0, 0)
                    else PredictionMode.NEWMV)
            d = BlockDecision(y_mode=mode,
                              uv_mode=PredictionMode.DC_PRED,
                              skip=bool(skip[b]), mv=mv,
                              ref=1 if ch == 0 else 7)
        if not d.skip:
            d.coeffs = {0: lv_y[b], 1: lv_u[b], 2: lv_v[b]}
        blocks[(r, c)] = d
    if tile_grid is not None:
        # per-tile writers with tile-local coords (entropy state is
        # tile-independent per spec; the decisions are frame-global)
        ti = TileInfo(seq, tile_grid[0], tile_grid[1])
        tiles = []
        for t_r in range(ti.n_rows):
            for t_c in range(ti.n_cols):
                r0 = min(ti.row_starts[t_r] * 16, mi_rows)
                r1 = min(ti.row_starts[t_r + 1] * 16, mi_rows)
                c0 = min(ti.col_starts[t_c] * 16, mi_cols)
                c1 = min(ti.col_starts[t_c + 1] * 16, mi_cols)
                tw_t = TileWriter(r1 - r0, c1 - c0, qindex,
                                  inter_frame=True,
                                  ref_sign_bias={1: False, 7: True},
                                  reference_select=True)
                if cdef_map is not None and _cbits:
                    tw_t.cdef_bits = _cbits
                    tw_t.cdef_idx_map = cdef_map[
                        ti.row_starts[t_r]:ti.row_starts[t_r + 1],
                        ti.col_starts[t_c]:ti.col_starts[t_c + 1]]
                tparts = {(r - r0, c - c0, bs): p
                          for (r, c, bs), p in partitions.items()
                          if r0 <= r < r1 and c0 <= c < c1}
                tblocks = {(r - r0, c - c0): d
                           for (r, c), d in blocks.items()
                           if r0 <= r < r1 and c0 <= c < c1}
                tiles.append(tw_t.write_tile(tparts, tblocks))
    else:
        tiles = [tw.write_tile(partitions, blocks)]
    fp.reference_select = True
    ref_idx = [slot_fwd] * 6 + [slot_bwd]
    fh, bh2 = ref_hints or (0, order_hint + 1)
    fp.ref_order_hints = [fh] * 6 + [bh2]
    return interframe_packet(seq, fp, ti, tiles, order_hint,
                             refresh_flags=refresh_flags,
                             ref_idx=ref_idx, show_frame=show_frame)


def encode_bframe_tpu(planes, ref_fwd, ref_bwd, qindex: int = 100,
                      order_hint: int = 1,
                      ref_dev_fwd=None, ref_dev_bwd=None,
                      cdef: tuple | None = None, film_grain=None,
                      slot_fwd: int = 0, slot_bwd: int = 1,
                      ref_hints: tuple | None = None,
                      render_size: tuple | None = None,
                      dscale=None, src_dev=None,
                      refresh_flags: int = 0, show_frame: bool = True,
                      b64_rdo: bool = False, lr: bool = False,
                      search: int = SEARCH, subpel: bool = True,
                      bit_depth: int = 8, use_split: bool = False,
                      tile_grid: tuple | None = None):
    """TPU-batched B frame: both references searched on-device, each
    block picks single-fwd / single-bwd / COMPOUND_AVERAGE by RD.
    Same bitstream contract as pipeline/inter.py::encode_bframe.

    ref_dev_fwd/ref_dev_bwd: optional device-resident uint8 reference
    planes — skip the host->device uploads."""
    y, u, v = planes
    h, w = y.shape[0], y.shape[1]
    assert h % 32 == 0 and w % 32 == 0
    step, (nby, nbx), gather_dense = _core(h, w, cdef is not None,
                                           use_split=use_split,
                                           two_ref=True,
                                           b64_rdo=b64_rdo,
                                           search=search, subpel=subpel,
                                           bd=bit_depth)
    np_pix = np.uint8 if bit_depth == 8 else np.uint16
    if ref_dev_fwd is None:
        ref_dev_fwd = tuple(jnp.asarray(np.asarray(p, np_pix))
                            for p in ref_fwd)
    if ref_dev_bwd is None:
        ref_dev_bwd = tuple(jnp.asarray(np.asarray(p, np_pix))
                            for p in ref_bwd)
    cdef_prm = jnp.asarray(
        list(cdef) if cdef is not None else [0, 0, 0, 0, 3], jnp.int32)
    if src_dev is None:
        src_dev = jnp.asarray(pack_src(planes, bd=bit_depth))
    outs = step(src_dev, *ref_dev_fwd,
                *ref_dev_bwd,
                jnp.int32(dc_q_lut(qindex, 0, bit_depth)),
                jnp.int32(ac_q_lut(qindex, 0, bit_depth)), cdef_prm,
                build_rd_inter(qindex, bit_depth),
                _ds16_quads(dscale, nby, nbx))
    (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16, lf_lvl,
     cdef_map, choice, mvb8, b64m, _s16, _sk8) = _fetch_packed(
        outs, gather_dense, nby, nbx)
    rec = [np.asarray(o).astype(np.int32) for o in outs[4:7]]
    pkt = _pack_bframe(h, w, qindex, order_hint, mv8, mvb8, choice,
                       skip, lv_y, lv_u, lv_v,
                       (cdef, cdef_map) if cdef is not None else None,
                       film_grain,
                       render_size, lf_lvl, slot_fwd, slot_bwd,
                       ref_hints, refresh_flags, show_frame,
                       b64_map=b64m if b64_rdo else None,
                       lr_ctx=(rec, [np.asarray(y), np.asarray(u),
                                     np.asarray(v)]) if lr else None,
                       bit_depth=bit_depth,
                       split=split if use_split else None,
                       mv16=mv16, skip16=skip16, tile_grid=tile_grid)
    return pkt, rec


def encode_gop_tpu(frames, qindex: int = 100, speed: int = 8,
                   cdef: tuple | None = None):
    """KEY + P chain with the TPU-batched pipelines.

    IO schedule (tunnel-measured): per-frame uploads issued inside the
    dispatch loop overlap transfer(i+1) with compute(i); per-frame
    fetches in a second loop overlap fetch(i) with compute(i+1..).
    One whole-GOP upload / one stacked fetch were tried and LOSE —
    the tunnel serializes a large H2D ahead of all later dispatches
    (keyframe phase1 0.24 s -> 1.18 s) and chunks large D2H at
    ~65 ms per row (batched fetch 1.1 s vs 15 overlapped 52 ms)."""
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    pkts, recs = [], []
    if len(frames) == 1:
        pkt, rec = encode_keyframe_tpu(frames[0], qindex=qindex,
                                       speed=speed, cdef=cdef)
        return [pkt], [rec]
    # deferred keyframe: the device phases run now and hand back the
    # DEVICE recon; the host fetch+unpack+entropy-pack (~250 ms at
    # 1080p) runs on a worker thread overlapped with the P frames'
    # device compute
    kf_finish, kf_rec_dev = encode_keyframe_tpu(
        frames[0], qindex=qindex, speed=speed, cdef=cdef,
        deferred=True)
    h, w = frames[0][0].shape
    # SpeedSettings drives the toolset: partition_split_rdo (presets
    # >7 drop the 32->16 split candidate set; XLA dead-code-eliminates
    # it), satd_subpel (Hadamard subpel metric), search_px, subpel
    from rav1e_tpu.api.speed import SpeedSettings
    ss = SpeedSettings.from_preset(speed)
    step, _, gather_dense = _core(h, w, cdef is not None,
                                  use_split=ss.partition_split_rdo,
                                  use_satd=ss.satd_subpel,
                                  refine16=ss.mv_refine_16,
                                  intra_rdo=ss.intra_in_inter,
                                  b64_rdo=ss.b64_merge,
                                  search=ss.search_px,
                                  subpel=ss.subpel,
                                  use_split8=ss.partition_split8)
    dcq = jnp.int32(dc_q_lut(qindex))
    acq = jnp.int32(ac_q_lut(qindex))
    rd = build_rd_inter(qindex)
    cdef_prm = jnp.asarray(
        list(cdef) if cdef is not None else [0, 0, 0, 0, 3], jnp.int32)
    # dispatch every P step up front (jax async dispatch): the device
    # crunches frame i+1 while the host transfers + entropy-packs
    # frame i; each frame's IO is one packed upload + one packed fetch
    # (the tunnel charges ~38 ms latency per transfer)
    ref_dev = kf_rec_dev          # device-resident, no re-upload
    ones = _ds16_quads(None, h // 32, w // 32)
    import os as _os
    import time as _time
    from concurrent.futures import ThreadPoolExecutor
    _timing = bool(_os.environ.get("RAV1E_TPU_TIMING"))
    _t0 = _time.time()

    def tail(i, o):
        """Fetch one frame's packed buffer and entropy-pack it.
        Independent per frame (the packed buffer holds every
        decision); the C++ packer releases the GIL and the jax
        device_get transfers overlap with neighbor frames' packing."""
        (mv8, skip, lv_y, lv_u, lv_v, split, mv16, skip16, lf_lvl,
         cdef_map, choice, _, b64m, split16, skip8) = _fetch_packed(
            o, gather_dense, h // 32, w // 32)
        return _pack_pframe(
            h, w, qindex, i, mv8, skip, lv_y, lv_u, lv_v,
            cdef=(cdef, cdef_map) if cdef is not None else None,
            lf_level=lf_lvl, split=split, mv16=mv16, skip16=skip16,
            choice=choice if speed <= 6 else None,
            b64_map=b64m if speed <= 6 else None,
            split16=split16 if ss.partition_split8 else None,
            skip8=skip8 if ss.partition_split8 else None)

    with ThreadPoolExecutor(4) as ex:
        # host-side source packing runs ahead on worker threads while
        # the main thread streams uploads + dispatches in order; the
        # keyframe's host half packs concurrently on another worker
        kf_fut = ex.submit(kf_finish)
        src_futs = [ex.submit(pack_src, f) for f in frames[1:]]
        outs = []
        pkt_futs = []
        for i, sf in enumerate(src_futs, start=1):
            o = step(jnp.asarray(sf.result()), *ref_dev,
                     dcq, acq, cdef_prm, rd, ones)
            ref_dev = o[4:7]
            outs.append(o)
            # fetch+pack of earlier frames proceeds concurrently with
            # later frames' uploads and device compute
            pkt_futs.append(ex.submit(tail, i, o))
        if _timing:
            print(f"# gop dispatch {_time.time()-_t0:.3f}s")
        kf_pkt, kf_rec = kf_fut.result()
        pkts.append(kf_pkt)
        recs.append(kf_rec)
        for o, pf in zip(outs, pkt_futs):
            pkts.append(pf.result())
            # recons stay device-resident (uint8); consumers that need
            # them host-side (conformance checks) convert lazily
            recs.append([o[4], o[5], o[6]])
    if _timing:
        print(f"# gop total {_time.time()-_t0:.3f}s")
    return pkts, recs
