"""Context(tiles>1) on the TPU fast path: frame-global decisions,
per-tile entropy packing (VERDICT r4 #5 — tiles must not silently
fall back to the numpy pipelines).

Reference parity: rav1e TilingInfo::from_target_tiles + per-tile
entropy state (SURVEY §2.1 tiling row). Keyframes of tiled sessions
code as a single tile (tile_info is per-frame, spec 5.9.15); inter
frames carry the requested grid.
"""

import numpy as np

from rav1e_tpu.api.context import Config
from rav1e_tpu.conform import aom, dav1d


def _frames(W=256, H=128, N=6, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 200, (H, W)).astype(np.uint8)
    return [[np.roll(base, t * 3, axis=1),
             np.full((H // 2, W // 2), 120, np.uint8),
             np.full((H // 2, W // 2), 135, np.uint8)]
            for t in range(N)]


def _drain(ctx, frames):
    for f in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        _, p = ctx.receive_packet()
        if p is None:
            break
        pkts.append(p)
    return pkts


def test_tiled_context_inter_fast_path(monkeypatch):
    """tiles=4 stays on the TPU pipelines (numpy fallback would be a
    silent perf cliff) and decodes bit-exact against both oracles."""
    import rav1e_tpu.pipeline.inter as np_inter

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("tiles>1 fell back to the numpy pipeline")

    monkeypatch.setattr(np_inter, "encode_pframe", boom)
    monkeypatch.setattr(np_inter, "encode_bframe", boom)
    frames = _frames()
    for ll in (True, False):
        ctx = Config(width=256, height=128, quantizer=110, tiles=4,
                     low_latency=ll).new_context()
        assert ctx._tile_cols_log2 + ctx._tile_rows_log2 == 2
        pkts = _drain(ctx, frames)
        d = dav1d.decode_all([p.data for p in pkts])
        a = aom.decode_all([p.data for p in pkts])
        assert len(d) == len(frames) and len(a) == len(frames)
        for i in range(len(frames)):
            for j in range(3):
                assert np.array_equal(d[i].planes[j], a[i][j]), (ll, i, j)
            err = np.abs(d[i].planes[0].astype(int)
                         - frames[i][0].astype(int)).mean()
            assert err < 10, (ll, i, err)


def test_tiled_vs_untiled_same_decisions():
    """The tiled stream re-codes the SAME frame-global decisions —
    decoded output must match the untiled session's except for
    entropy-state effects (none: per-tile CDFs restart but decode to
    identical symbols), so the recons are identical."""
    frames = _frames(N=4)
    outs = []
    for tiles in (1, 4):
        ctx = Config(width=256, height=128, quantizer=110, tiles=tiles,
                     speed=7, low_latency=True).new_context()
        pkts = _drain(ctx, frames)
        outs.append(dav1d.decode_all([p.data for p in pkts]))
    for i in range(len(frames)):
        for j in range(3):
            assert np.array_equal(outs[0][i].planes[j],
                                  outs[1][i].planes[j]), (i, j)
