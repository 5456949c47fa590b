"""Rate control.

Reference parity: rav1e src/rate.rs `RCState`/`select_qi`: log-domain
quantizer scale per frame subtype with a bit reservoir. This is a
compact re-derivation, not a port: qindex moves in the log-bitrate
domain using the spec ac_q lookup as the quantizer scale, with a
reservoir that tracks how far delivered bits lag the target and a
per-subtype offset (keyframes get a lower q than P frames, like
rav1e's I/P scale factors).

Constant-quality mode (target_bitrate == 0) returns the configured
qindex untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rav1e_tpu.ops.ref.quant import ac_q


@dataclass
class RCConfig:
    target_bitrate: int = 0       # bits/sec; 0 => constant quality
    framerate: float = 30.0
    quantizer: int = 100          # CQ qindex when target_bitrate == 0
    reservoir_frame_delay: int = 25  # rav1e default lookahead-ish window
    keyframe_q_boost: float = 0.82   # qscale multiplier for KEY frames


class RCState:
    """Per-session rate control state (single pass)."""

    def __init__(self, cfg: RCConfig):
        self.cfg = cfg
        self.target_per_frame = (cfg.target_bitrate / cfg.framerate
                                 if cfg.target_bitrate else 0.0)
        self.reservoir = 0.0      # bits of headroom (+ = under budget)
        self.reservoir_cap = self.target_per_frame * cfg.reservoir_frame_delay
        self._log_scale = None    # running estimate of log2(bits*q)
        self._qi = cfg.quantizer

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _qi_for_scale(scale: float) -> int:
        """Smallest qindex whose ac quantizer >= scale."""
        lo, hi = 1, 255
        while lo < hi:
            mid = (lo + hi) // 2
            if ac_q(mid) < scale:
                lo = mid + 1
            else:
                hi = mid
        return lo

    # -- api ----------------------------------------------------------------

    def select_qi(self, frame_type: str) -> int:
        if not self.cfg.target_bitrate:
            return self.cfg.quantizer
        qi = self._qi
        if self._log_scale is not None:
            # bits ~ K / q  =>  to hit target bits, q = K / target.
            # Bias by the reservoir state: ahead of budget -> lower q.
            fullness = (self.reservoir / self.reservoir_cap
                        if self.reservoir_cap else 0.0)
            target = self.target_per_frame * (1.0 + 0.5 * fullness)
            target = max(target, 1.0)
            q = (2.0 ** self._log_scale) / target
            qi = self._qi_for_scale(q)
        if frame_type == "KEY":
            qi = self._qi_for_scale(
                ac_q(int(np.clip(qi, 1, 255))) * self.cfg.keyframe_q_boost)
        return int(np.clip(qi, 1, 255))

    def update(self, frame_type: str, qi: int, bits: int):
        if not self.cfg.target_bitrate:
            return
        self.reservoir += self.target_per_frame - bits
        self.reservoir = float(np.clip(
            self.reservoir, -self.reservoir_cap, self.reservoir_cap))
        log_scale = np.log2(max(bits, 1) * float(ac_q(qi)))
        if self._log_scale is None:
            self._log_scale = log_scale
        else:
            # exponential moving average in the log domain
            w = 0.5 if frame_type == "KEY" else 0.8
            self._log_scale = w * self._log_scale + (1 - w) * log_scale
        self._qi = qi
