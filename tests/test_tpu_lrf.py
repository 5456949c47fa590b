"""TPU loop-restoration search (ops/tpu/lrf.py): apply twins must be
bit-exact vs the numpy reference, and the full pipeline with the
device search must stay conformant on both oracles."""

import numpy as np
import pytest

from rav1e_tpu.ops.ref.lrf import (sgr_filter_unit, wiener_filter_unit)


def _plane(h, w, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.normal(0, 60, (h, w)), 1.2)
    return (128 + base).clip(0, 255).astype(np.int32)


def test_wiener_apply_batch_bit_exact():
    """_wiener_apply2 on gathered stripe-piece patches == the
    reference wiener_filter_unit for every unit of a plane, for
    random in-range taps."""
    import jax.numpy as jnp

    from rav1e_tpu.ops.ref.lrf import (WIENER_TAPS_MAX,
                                       WIENER_TAPS_MIN, count_units)
    from rav1e_tpu.ops.tpu.lrf import (_gather_maps, _gather_patches,
                                       _wiener_apply2)

    rng = np.random.default_rng(1)
    ph, pw = 136, 168          # irregular: last units merge
    rec = _plane(ph, pw, 2)
    g, rows, cols, hmask, wmask, meta = _gather_maps(ph, pw, 0, 3)
    P = rows.shape[0]
    vt = np.stack([rng.integers(WIENER_TAPS_MIN[i],
                                WIENER_TAPS_MAX[i] + 1, P)
                   for i in range(3)], 1).astype(np.int32)
    ht = np.stack([rng.integers(WIENER_TAPS_MIN[i],
                                WIENER_TAPS_MAX[i] + 1, P)
                   for i in range(3)], 1).astype(np.int32)
    patches = np.asarray(_gather_patches(jnp.asarray(rec),
                                         jnp.asarray(rows),
                                         jnp.asarray(cols)))
    out = np.asarray(_wiener_apply2(jnp.asarray(patches),
                                    jnp.asarray(vt), jnp.asarray(ht),
                                    8))
    for k, (ur, uc, y0, h, x0, w) in enumerate(meta):
        ref = wiener_filter_unit(rec, y0, x0, h, w, tuple(vt[k]),
                                 tuple(ht[k]), bd=8)
        assert np.array_equal(out[k, :h, :w], ref), (k, ur, uc)


@pytest.mark.parametrize("sset", [0, 6, 11, 14])
def test_sgr_apply_batch_bit_exact(sset):
    """The device SGR pass outputs combined with quantized weights ==
    the reference sgr_filter_unit, per stripe piece."""
    import jax.numpy as jnp

    from rav1e_tpu.ops.ref.lrf import SGR_PARAMS_S, sgr_weights
    from rav1e_tpu.ops.tpu.lrf import (_gather_maps, _gather_patches,
                                       _sgr_flt_batch)

    rng = np.random.default_rng(3)
    ph, pw = 136, 168
    rec = _plane(ph, pw, 4)
    g, rows4, cols4, hmask, wmask, meta = _gather_maps(ph, pw, 0, 4)
    _, rows3, cols3, _, _, _ = _gather_maps(ph, pw, 0, 3)
    H, W = g["max_h"], g["max_w"]
    P = rows4.shape[0]
    row_par = np.zeros((P, H), np.int32)
    for k, (ur, uc, y0, h, x0, w) in enumerate(meta):
        row_par[k, :h] = np.arange(h) & 1
    p4 = np.asarray(_gather_patches(jnp.asarray(rec),
                                    jnp.asarray(rows4),
                                    jnp.asarray(cols4)))
    p3 = np.asarray(_gather_patches(jnp.asarray(rec),
                                    jnp.asarray(rows3),
                                    jnp.asarray(cols3)))
    tgt = p3[:, 3: 3 + H, 3: 3 + W]
    u = tgt.astype(np.int64) << 4
    s0, s1 = SGR_PARAMS_S[sset]
    x0q = int(rng.integers(-32, 32)) if s0 else 0
    x1q = int(rng.integers(-16, 64))
    w0, w1, w2 = sgr_weights(sset, x0q, x1q)
    f0 = (np.asarray(_sgr_flt_batch(
        jnp.asarray(p4[:, 1:-1, 1:-1]), jnp.asarray(tgt), 2, s0, 8,
        jnp.asarray(row_par))) if s0 else u)
    f1 = (np.asarray(_sgr_flt_batch(
        jnp.asarray(p4[:, 2:-2, 2:-2]), jnp.asarray(tgt), 1, s1, 8,
        jnp.asarray(row_par))) if s1 else u)
    acc = w1 * u + w0 * f0 + w2 * f1
    dev = np.clip((acc + (1 << 10)) >> 11, 0, 255)
    for k, (ur, uc, y0, h, x0, w) in enumerate(meta):
        # reference computes whole units; restrict to single-piece
        # units (the piece == the unit there)
        y0u, y1u = g["ubands"][ur]
        if (y0, h) != (y0u, y1u - y0u):
            continue
        ref = sgr_filter_unit(rec, y0, x0, h, w, sset, x0q, x1q, bd=8)
        assert np.array_equal(dev[k, :h, :w], ref), (k, ur, uc)


def test_search_lr_plane_tpu_contract():
    """The device search returns a (grid, filtered, used) triple whose
    filtered plane is exactly the reference apply of the chosen params
    and whose SSE never regresses the unfiltered recon."""
    from rav1e_tpu.ops.ref.lrf import count_units
    from rav1e_tpu.ops.tpu.lrf import search_lr_plane_tpu

    rng = np.random.default_rng(5)
    ph, pw = 136, 168
    src = _plane(ph, pw, 6).astype(np.int64)
    # recon: source + structured noise so restoration has work to do
    rec = (src + rng.normal(0, 6, src.shape)).clip(0, 255)\
        .astype(np.int32)
    grid, filtered, used = search_lr_plane_tpu(rec, src, bd=8, ss=0)
    assert used, "no unit chose a filter on noisy recon"
    n_ur, n_uc = count_units(ph, 64), count_units(pw, 64)
    base = ((rec.astype(np.int64) - src) ** 2).sum()
    got = ((filtered.astype(np.int64) - src) ** 2).sum()
    assert got < base
    # re-apply the grid with the reference filters: must reproduce
    # `filtered` bit-exactly (the bitstream codes exactly this grid)
    out = rec.copy()
    for ur in range(n_ur):
        y0 = 0 if ur == 0 else ur * 64 - 8
        y1 = ph if ur == n_ur - 1 else (ur + 1) * 64 - 8
        for uc in range(n_uc):
            x0 = uc * 64
            x1 = pw if uc == n_uc - 1 else (uc + 1) * 64
            kind = grid[ur][uc]
            if kind is None:
                continue
            if kind[0] == "W":
                f = wiener_filter_unit(rec, y0, x0, y1 - y0, x1 - x0,
                                       kind[1], kind[2], bd=8)
            else:
                f = sgr_filter_unit(rec, y0, x0, y1 - y0, x1 - x0,
                                    kind[1], kind[2], kind[3], bd=8)
            out[y0:y1, x0:x1] = f
    assert np.array_equal(out, filtered)


def test_lr_pipeline_conformance_tpu_search():
    """End-to-end: keyframe + P with the DEVICE LR search, bit-exact
    on both oracles (same contract as test_tpu_path_loop_restoration
    but through ops/tpu/lrf.py)."""
    from rav1e_tpu.conform import aom, dav1d
    from rav1e_tpu.pipeline import tpu_inter as TI
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    rng = np.random.default_rng(7)
    h, w = 96, 128
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.normal(0, 55, (h + 16, w + 16)), 1.0)

    def fr(t):
        y = (128 + base[t:t + h, 2 * t:2 * t + w]).clip(0, 255)
        return [y.astype(np.uint8),
                np.full((h // 2, w // 2), 120, np.uint8),
                np.full((h // 2, w // 2), 133, np.uint8)]

    q = 150
    pk, rk = encode_keyframe_tpu(fr(0), qindex=q, speed=6, lr=True)
    pp, rp = TI.encode_pframe_tpu(fr(1), rk, qindex=q, order_hint=1,
                                  lr=True)
    d = dav1d.decode_all([pk, pp])
    a = aom.decode_all([pk, pp])
    for i, rec in enumerate([rk, rp]):
        for j in range(3):
            assert np.array_equal(d[i].planes[j], rec[j]), (i, j)
            assert np.array_equal(a[i][j], rec[j]), (i, j)
