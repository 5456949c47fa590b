"""Lookahead analysis: per-block ME stats, intra-cost estimates, and
backward importance propagation over the lookahead window.

Reference parity: rav1e src/api/lookahead.rs (compute_motion_vectors,
estimate_intra_costs, estimate_importance_block_difference) and
src/api/internal.rs::compute_block_importances /
src/rdo.rs::DistortionScale — redesigned as batched JAX passes: one
grouped-conv dispatch evaluates every block's full-pel search for a
whole frame pair (the reference loops blocks under rayon), and the
backward propagation walks the window on host (tiny grids).

Block granularity is 16x16 (IMPORTANCE_BLOCK_SIZE in rav1e is 8; we
use 16 to match the inter pipeline's sub-block unit — half the grid,
same propagation semantics).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

BLK = 16         # importance block size (px)
SEARCH = 8       # full-pel lookahead search radius (px)


@lru_cache(maxsize=4)
def _pair_stats_fn(h: int, w: int):
    """Jitted (cur, prev) -> (mv [nby,nbx,2], inter_cost, intra_cost)
    per 16x16 block. inter_cost = min-SAD-like SSD of the best full-pel
    match; intra_cost = SSD of the DC (mean) prediction residual
    (estimate_intra_costs analog — a real intra trial would use the
    full edge rules; the DC proxy matches its role: an upper bound on
    what intra coding must spend where inter prediction fails)."""
    import jax
    import jax.numpy as jnp

    nby, nbx = h // BLK, w // BLK
    B = nby * nbx
    win = 2 * SEARCH + BLK

    @jax.jit
    def stats(cur, prev):
        cur = cur.astype(jnp.float32)
        prev = prev.astype(jnp.float32)
        blks = (cur.reshape(nby, BLK, nbx, BLK)
                .transpose(0, 2, 1, 3).reshape(B, BLK, BLK))
        pp = jnp.pad(prev, SEARCH, mode="edge")
        sq = jax.lax.reduce_window(pp * pp, 0.0, jax.lax.add,
                                   (BLK, BLK), (1, 1), "valid")
        by = jnp.repeat(jnp.arange(nby), nbx) * BLK
        bx = jnp.tile(jnp.arange(nbx), nby) * BLK

        def win_one(r0, c0):
            return jax.lax.dynamic_slice(pp, (r0, c0), (win, win))

        def sq_one(r0, c0):
            return jax.lax.dynamic_slice(
                sq, (r0, c0), (2 * SEARCH + 1, 2 * SEARCH + 1))

        wins = jax.vmap(win_one)(by, bx)
        wsq = jax.vmap(sq_one)(by, bx)
        corr = jax.lax.conv_general_dilated(
            wins[None], blks[:, None], (1, 1), "VALID",
            feature_group_count=B,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
        ssd = wsq - 2.0 * corr + jnp.sum(blks * blks, (1, 2))[:, None,
                                                             None]
        flat = jnp.argmin(ssd.reshape(B, -1), axis=1)
        span = 2 * SEARCH + 1
        mv = jnp.stack([flat // span - SEARCH, flat % span - SEARCH], 1)
        inter = jnp.min(ssd.reshape(B, -1), axis=1)
        mean = jnp.mean(blks, (1, 2), keepdims=True)
        intra = jnp.sum((blks - mean) ** 2, (1, 2))
        return (mv.reshape(nby, nbx, 2),
                inter.reshape(nby, nbx),
                intra.reshape(nby, nbx))

    return stats


def pair_stats(cur_y: np.ndarray, prev_y: np.ndarray):
    """Per-16x16 ME stats of cur vs prev (host-side numpy results)."""
    h, w = cur_y.shape
    ch, cw = h // BLK * BLK, w // BLK * BLK
    mv, inter, intra = _pair_stats_fn(ch, cw)(
        np.asarray(cur_y[:ch, :cw]), np.asarray(prev_y[:ch, :cw]))
    return np.asarray(mv), np.asarray(inter), np.asarray(intra)


def compute_importances(stats: list) -> np.ndarray:
    """Backward importance propagation over the lookahead window.

    stats[i] = (mv, inter_cost, intra_cost) of frame i+1 vs frame i
    (i = 0 is the frame about to be encoded). Walks the window from
    the future back: each block's accumulated importance (plus one
    unit for the block itself) flows to the area of the previous frame
    its motion vector references, weighted by how much of the block's
    signal inter prediction actually explains
    (compute_block_importances in rav1e src/api/internal.rs).
    Returns the importance grid for frame 0."""
    if not stats:
        raise ValueError("need at least one frame pair")
    nby, nbx = stats[0][1].shape
    imp = np.zeros((nby, nbx), np.float64)
    for mv, inter, intra in reversed(stats):
        nxt = np.zeros((nby, nbx), np.float64)
        # propagation fraction: how predictable the block was
        frac = np.clip(1.0 - inter / (intra + 1.0), 0.0, 1.0)
        flow = (imp + 1.0) * frac
        # scatter each block's flow to the up-to-4 blocks its
        # motion-projected footprint overlaps in the previous frame
        for by in range(nby):
            for bx in range(nbx):
                f = flow[by, bx]
                if f <= 0:
                    continue
                py = by * BLK + int(mv[by, bx, 0])
                px = bx * BLK + int(mv[by, bx, 1])
                py = min(max(py, 0), (nby - 1) * BLK)
                px = min(max(px, 0), (nbx - 1) * BLK)
                b0y, oy = divmod(py, BLK)
                b0x, ox = divmod(px, BLK)
                for (dy, wy) in ((0, BLK - oy), (1, oy)):
                    for (dx, wx) in ((0, BLK - ox), (1, ox)):
                        if wy and wx and b0y + dy < nby and b0x + dx < nbx:
                            nxt[b0y + dy, b0x + dx] += \
                                f * (wy * wx) / (BLK * BLK)
        imp = nxt
    return imp


def distortion_scales(imp: np.ndarray, strength: float = 1.0
                      ) -> np.ndarray:
    """Importance grid -> per-block RD distortion weights.

    rav1e's DistortionScale maps propagated importance to a multiplier
    on distortion in every RD decision (important blocks get more
    bits). Normalized so the frame-mean log-scale is 0 — total rate
    stays put, allocation shifts."""
    s = np.power(1.0 + imp, 0.5 * strength)
    s /= np.exp(np.mean(np.log(s)))
    return np.clip(s, 0.25, 4.0).astype(np.float32)


def activity_scales(y: np.ndarray, strength: float = 0.5) -> np.ndarray:
    """Per-16x16 activity masking scales (rav1e src/activity.rs,
    Tune::Psychovisual): low-variance (flat/dark) areas are
    perceptually fragile -> weight their distortion up; high-texture
    areas mask error -> weight down."""
    h, w = y.shape
    ch, cw = h // BLK * BLK, w // BLK * BLK
    b = (np.asarray(y[:ch, :cw], np.float64)
         .reshape(ch // BLK, BLK, cw // BLK, BLK)
         .transpose(0, 2, 1, 3))
    var = b.var(axis=(2, 3)) + 1.0
    s = np.power(var / np.exp(np.mean(np.log(var))), -0.25 * strength)
    return np.clip(s, 0.25, 4.0).astype(np.float32)


class Lookahead:
    """Sliding lookahead window over input frames.

    Holds up to `depth` future frames of per-pair ME stats; `scales()`
    returns the distortion-scale grid for the oldest frame (the next
    to encode). Usage from the session: push frames as they arrive,
    pop as they encode."""

    def __init__(self, depth: int = 8, tune: str = "psnr"):
        self.depth = depth
        self.tune = tune
        self._frames: list[np.ndarray] = []   # luma planes
        self._stats: list = []                # stats[i]: f[i+1] vs f[i]

    def push(self, y: np.ndarray):
        self._frames.append(np.asarray(y))
        if len(self._frames) >= 2:
            self._stats.append(pair_stats(self._frames[-1],
                                          self._frames[-2]))
        while len(self._frames) > self.depth + 1:
            self.pop()

    def pop(self):
        if self._frames:
            self._frames.pop(0)
        if self._stats:
            self._stats.pop(0)

    def reset(self):
        self._frames.clear()
        self._stats.clear()

    def scales(self) -> np.ndarray | None:
        """Distortion-scale grid (16x16 units) for the next frame."""
        if not self._frames:
            return None
        s = None
        if self._stats:
            s = distortion_scales(compute_importances(self._stats))
        if self.tune == "psychovisual":
            a = activity_scales(self._frames[0])
            s = a if s is None else (s * a).astype(np.float32)
        return s
