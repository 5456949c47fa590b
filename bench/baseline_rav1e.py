"""Measure the reference encoder (librav1e 0.5.1) locally.

BASELINE.md rows 5-6: rav1e fps + bytes at 1080p for speeds {6, 10},
threads {1, N}. Run: python bench/baseline_rav1e.py [--frames N]
Writes bench/baseline_rav1e.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rav1e_tpu.conform import rav1e_ref  # noqa: E402


def synth_video(w, h, n, seed=1):
    """Moving synthetic content (gradients + noise + motion)."""
    rng = np.random.default_rng(seed)
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


def measure(frames, speed, threads, quantizer=100):
    h, w = frames[0][0].shape
    enc = rav1e_ref.RefEncoder(w, h, speed=speed, quantizer=quantizer,
                               threads=threads, low_latency=True)
    t0 = time.time()
    nbytes = 0
    npkts = 0
    for f in frames:
        enc.send(f)
        for p in enc.receive_all():
            nbytes += len(p)
            npkts += 1
    enc.flush_signal()
    for p in enc.receive_all():
        nbytes += len(p)
        npkts += 1
    dt = time.time() - t0
    enc.close()
    return {"fps": len(frames) / dt, "bytes": nbytes, "packets": npkts,
            "speed": speed, "threads": threads, "seconds": dt}


def main():
    n = 32
    if "--frames" in sys.argv:
        n = int(sys.argv[sys.argv.index("--frames") + 1])
    ncpu = os.cpu_count() or 1
    out = {"width": 1920, "height": 1080, "frames": n, "cpus": ncpu,
           "runs": []}
    frames = synth_video(1920, 1080, n)
    for speed in (10, 6):
        for threads in (1, ncpu):
            r = measure(frames, speed, threads)
            print(f"rav1e 1080p speed={speed} threads={threads}: "
                  f"{r['fps']:.2f} fps, {r['bytes']} bytes")
            out["runs"].append(r)
    path = Path(__file__).parent / "baseline_rav1e.json"
    path.write_text(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
