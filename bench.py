"""Driver benchmark: 1080p intra encode fps on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against librav1e 0.5.1 measured locally at 1080p
speed 6 (bench/baseline_rav1e.json; see bench/baseline_rav1e.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))


def synth_1080p(n=4, seed=3):
    rng = np.random.default_rng(seed)
    w, h = 1920, 1088  # coded size (32-aligned) for 1080p content
    yy, xx = np.mgrid[0:h, 0:w]
    base = 100 + 50 * np.sin(xx / 37) + 40 * np.cos(yy / 23)
    frames = []
    for t in range(n):
        y = (base + 20 * np.sin((xx + 5 * t) / 29)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin((xx[::2, ::2] + 2 * t) / 31)).clip(0, 255).astype(np.uint8)
        v = (128 - 25 * np.cos((yy[::2, ::2] + t) / 27)).clip(0, 255).astype(np.uint8)
        frames.append([y, u, v])
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
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu
    from rav1e_tpu.conform import dav1d

    frames = synth_1080p(n=3)
    # warmup/compile (excluded; persistent cache hides this across runs)
    t0 = time.time()
    pkt, rec = encode_keyframe_tpu(frames[0], qindex=100)
    warm = time.time() - t0
    # conformance spot check
    fr = dav1d.decode_all([pkt])
    ok = all(np.array_equal(fr[0].planes[i], rec[i]) for i in range(3))
    print(f"# warmup {warm:.1f}s, conformance {'OK' if ok else 'FAIL'}",
          file=sys.stderr)
    t0 = time.time()
    total_bytes = 0
    for f in frames:
        p, _ = encode_keyframe_tpu(f, qindex=100)
        total_bytes += len(p)
    dt = time.time() - t0
    fps = len(frames) / dt
    base = baseline_fps()
    print(f"# {fps:.3f} fps end-to-end, {total_bytes // len(frames)} "
          f"bytes/frame, baseline rav1e s6 {base:.3f} fps", file=sys.stderr)
    if not ok:
        fps = 0.0
    print(json.dumps({
        "metric": "1080p_intra_fps_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 4) if base else None,
    }))


if __name__ == "__main__":
    main()
