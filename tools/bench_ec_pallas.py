"""Measure the on-TPU Pallas od_ec packer's throughput (symbols/s).

Decides SURVEY §7.2 Plan A (host C++ packer) vs Plan B (device
packer): the device is worth it if symbols/s approaches the C++
packer's (~10-50 M/s) without burning the host."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from rav1e_tpu.entropy.ec import PROB_TOP
    from rav1e_tpu.entropy.ec_pallas import (
        RecordingEncoder,
        finish,
        pack_ir,
        pack_symbols,
    )

    rng = np.random.default_rng(5)

    def make_cdf(n):
        cuts = sorted(rng.integers(1, PROB_TOP, n - 1).tolist(),
                      reverse=True)
        return list(cuts) + [0, 0]

    for n_sym in (10_000, 100_000, 500_000):
        cdfs = [make_cdf(n) for n in (2, 3, 5, 8, 13, 16)]
        rec = RecordingEncoder()
        for i in range(n_sym):
            which = rng.integers(0, len(cdfs))
            n = len(cdfs[which]) - 2
            rec.encode_symbol(int(rng.integers(0, n)), cdfs[which])
        ir = np.asarray(rec.ir, np.int32)
        # compile + correctness
        out = pack_symbols(ir)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            chunks, low, nbits, flushed = pack_ir(ir)
        dt = (time.time() - t0) / reps
        print(f"{n_sym:>8} symbols: {dt*1e3:8.2f} ms "
              f"({n_sym/dt/1e6:6.2f} Msym/s), {len(out)} bytes, "
              f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
