"""BD-rate harness: this encoder vs librav1e v0.5.1 (BASELINE.md row 2).

Encodes the same clips at several quantizers with both encoders,
decodes every stream with the dav1d shim, computes sequence PSNR and
bitrate, and reports the Bjontegaard delta-rate. Negative = we need
fewer bits than rav1e at equal PSNR.

Usage:
    python tools/bdrate_vs_rav1e.py [--frames N] [--size WxH]
        [--speed S] [--qs 60,100,140,180] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_clips(w, h, n, seed=11):
    """Synthetic content family: moving smooth texture + noise detail
    (same family as bench/baseline_rav1e.py so numbers line up)."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    clips = {}
    # 'pan': smooth textured field, global pan
    tex = gaussian_filter(rng.normal(0, 48, (h + 128, w + 128)), 3.0)
    frames = []
    for t in range(n):
        oy, ox = 40 + 2 * t, 40 + 3 * t
        y = (128 + tex[oy:oy + h, ox:ox + w]).clip(0, 255)
        u = (120 + tex[oy // 2:oy // 2 + h // 2,
                       ox // 2:ox // 2 + w // 2] * 0.5).clip(0, 255)
        v = (135 - tex[oy // 2:oy // 2 + h // 2,
                       ox // 2:ox // 2 + w // 2] * 0.5).clip(0, 255)
        frames.append([y.astype(np.uint8), u.astype(np.uint8),
                       v.astype(np.uint8)])
    clips["pan"] = frames
    # 'detail': high-frequency detail with local motion
    base = rng.integers(40, 215, (h + 64, w + 64)).astype(np.float64)
    base = gaussian_filter(base, 1.0)
    frames = []
    for t in range(n):
        y = base[t:t + h, 2 * t:2 * t + w].clip(0, 255)
        frames.append([y.astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 118, np.uint8)])
    clips["detail"] = frames
    return clips


def encode_ours(frames, q, speed):
    from rav1e_tpu.api.context import Config, EncoderStatus
    h, w = frames[0][0].shape
    ctx = Config(width=w, height=h, quantizer=q, speed=speed).new_context()
    pkts = []
    for f in frames:
        ctx.send_frame(f)
        while True:
            st, p = ctx.receive_packet()
            if st != EncoderStatus.SUCCESS:
                break
            pkts.append(p.data)
    ctx.flush()
    while True:
        st, p = ctx.receive_packet()
        if st != EncoderStatus.SUCCESS:
            break
        pkts.append(p.data)
    return pkts


def encode_rav1e(frames, q, speed):
    from rav1e_tpu.conform import rav1e_ref
    return rav1e_ref.encode_frames(frames, speed=speed, quantizer=q,
                                   threads=4)


def rd_point(frames, pkts):
    from rav1e_tpu.analysis.quality import seq_psnr
    from rav1e_tpu.conform import dav1d
    dec = dav1d.decode_all(pkts)
    assert len(dec) == len(frames), (len(dec), len(frames))
    recs = [[d.planes[0], d.planes[1], d.planes[2]] for d in dec]
    p = seq_psnr(frames, recs)
    bits = sum(len(x) for x in pkts) * 8
    return bits / len(frames), p["yuv"], p["y"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--speed", type=int, default=6)
    ap.add_argument("--qs", default="60,100,140,180")
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    qs = [int(x) for x in args.qs.split(",")]
    from rav1e_tpu.analysis.quality import bd_rate

    clips = make_clips(w, h, args.frames)
    report = {"size": args.size, "frames": args.frames,
              "speed": args.speed, "qs": qs, "clips": {}}
    bd_all = []
    for name, frames in clips.items():
        ours, ref = [], []
        for q in qs:
            t0 = time.time()
            p_ours = encode_ours(frames, q, args.speed)
            t_ours = time.time() - t0
            t0 = time.time()
            p_ref = encode_rav1e(frames, q, args.speed)
            t_ref = time.time() - t0
            ro = rd_point(frames, p_ours)
            rr = rd_point(frames, p_ref)
            ours.append(ro)
            ref.append(rr)
            print(f"  {name} q={q}: ours {ro[0]/8:.0f} B/f "
                  f"{ro[1]:.2f} dB ({t_ours:.1f}s) | rav1e "
                  f"{rr[0]/8:.0f} B/f {rr[1]:.2f} dB ({t_ref:.1f}s)",
                  file=sys.stderr)
        bd = bd_rate([r[0] for r in ref], [r[1] for r in ref],
                     [o[0] for o in ours], [o[1] for o in ours])
        bd_y = bd_rate([r[0] for r in ref], [r[2] for r in ref],
                       [o[0] for o in ours], [o[2] for o in ours])
        report["clips"][name] = {
            "ours": ours, "rav1e": ref,
            "bd_rate_yuv_pct": round(bd, 2),
            "bd_rate_y_pct": round(bd_y, 2)}
        bd_all.append(bd)
        print(f"{name}: BD-rate (YUV) {bd:+.2f}% vs rav1e s{args.speed}"
              f" (negative = we win)", file=sys.stderr)
    report["bd_rate_mean_pct"] = round(float(np.mean(bd_all)), 2)
    print(json.dumps({"bd_rate_mean_pct": report["bd_rate_mean_pct"],
                      "per_clip": {k: v["bd_rate_yuv_pct"]
                                   for k, v in report["clips"].items()}}))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
