"""Scene-change detection.

Reference parity: rav1e src/scenechange/mod.rs
`SceneChangeDetector::analyze_next_frame`. Two modes there: fast
(downscaled inter-frame SAD against an adaptive threshold) and
standard (intra-cost vs inter-cost comparison). This implements the
fast mode: luma is box-downscaled so the longer edge is <= 128 px
(rav1e downscales by powers of two), and the mean absolute difference
against the previous frame is compared to a threshold scaled like
rav1e's FAST_THRESHOLD.

Detection is an encoder-side decision only - no bitstream conformance
surface - so the contract is behavioral: cuts on real discontinuities,
quiet on translating/noisy content (see tests).
"""

from __future__ import annotations

import numpy as np

FAST_THRESHOLD = 18.0  # mean-abs-diff per pixel at 8-bit, like rav1e


class SceneChangeDetector:
    def __init__(self, bit_depth: int = 8,
                 min_kf_interval: int = 12,
                 max_kf_interval: int = 240):
        self.bit_depth = bit_depth
        self.min_kf = min_kf_interval
        self.max_kf = max_kf_interval
        self._prev_small: np.ndarray | None = None
        self._since_kf = 0
        self._recent: list[float] = []  # rolling deltas for spikes

    @staticmethod
    def _downscale(y: np.ndarray) -> np.ndarray:
        h, w = y.shape
        factor = 1
        while max(h, w) // (factor * 2) >= 128:
            factor *= 2
        if factor == 1:
            return y.astype(np.float32)
        hh, ww = h - h % factor, w - w % factor
        return (y[:hh, :ww].astype(np.float32)
                .reshape(hh // factor, factor, ww // factor, factor)
                .mean(axis=(1, 3)))

    def frame_delta(self, y: np.ndarray) -> float | None:
        """Mean abs diff vs previous frame on the downscaled luma
        (None for the first frame)."""
        small = self._downscale(np.asarray(y))
        prev = self._prev_small
        self._prev_small = small
        if prev is None or prev.shape != small.shape:
            return None
        return float(np.abs(small - prev).mean())

    def analyze_next_frame(self, y: np.ndarray) -> bool:
        """True if this frame should start a new GOP (keyframe)."""
        delta = self.frame_delta(y)
        self._since_kf += 1
        if delta is None:
            self._since_kf = 0
            return True  # first frame
        scaled_thresh = FAST_THRESHOLD * (1 << (self.bit_depth - 8))
        cut = delta > scaled_thresh
        # relative spike: a delta far above the recent motion level is
        # a cut even when its absolute value is modest (rav1e's
        # standard mode compares against neighboring frame costs)
        if not cut and len(self._recent) >= 3:
            base = float(np.median(self._recent))
            cut = delta > max(2.2 * base, 2.0)
        self._recent.append(delta)
        if len(self._recent) > 8:
            self._recent.pop(0)
        if self._since_kf >= self.max_kf or (
                cut and self._since_kf >= self.min_kf):
            self._since_kf = 0
            self._recent.clear()
            return True
        return False
