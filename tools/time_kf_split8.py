"""Time the 1080p keyframe phases with kf_split8 on vs off (TPU)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import rav1e_tpu.api.speed as spd
    from rav1e_tpu.pipeline.tpu_intra import encode_keyframe_tpu

    rng = np.random.default_rng(3)
    w, h = 1920, 1088
    yy, xx = np.mgrid[0:h, 0:w]
    base = 100 + 50 * np.sin(xx / 37) + 40 * np.cos(yy / 23)
    y = (base + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 31)).clip(0, 255).astype(np.uint8)
    v = (128 - 25 * np.cos(yy[::2, ::2] / 27)).clip(0, 255).astype(np.uint8)

    orig_fp = spd.SpeedSettings.from_preset.__func__
    for s8 in (False, True):
        def fp(cls, s, _s8=s8):
            st = orig_fp(cls, s)
            st.kf_split8 = _s8
            return st

        spd.SpeedSettings.from_preset = classmethod(fp)
        for it in range(3):
            t0 = time.time()
            pkt, rec = encode_keyframe_tpu([y, u, v], qindex=100,
                                           speed=6, cdef=(0, 0, 0, 0, 3))
            dt = time.time() - t0
            print(f"split8={s8} iter{it}: {dt:.3f}s  {len(pkt)}B")
    spd.SpeedSettings.from_preset = classmethod(orig_fp)


if __name__ == "__main__":
    main()
