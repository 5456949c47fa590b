"""Raw tunnel characterization: host<->device transfer latency and
bandwidth vs buffer size, plus device dispatch overhead. Run on the
real TPU (no JAX_PLATFORMS override)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    @jax.jit
    def bump(x):
        return x + 1

    # dispatch overhead: tiny op round trip
    x = jnp.zeros((8, 128), jnp.int32)
    jax.block_until_ready(bump(x))
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(bump(x))
    print(f"tiny dispatch+sync: {(time.time()-t0)/20*1e3:.1f} ms")

    for mb in (0.01, 0.1, 0.5, 1, 4, 16):
        n = int(mb * 1e6)
        a = np.zeros(n, np.int8)
        # host -> device
        t0 = time.time()
        d = jax.device_put(a)
        jax.block_until_ready(d)
        up = time.time() - t0
        d2 = jax.block_until_ready(bump(jnp.zeros((max(n // 4, 1),),
                                                  jnp.int32)))
        big = jax.block_until_ready((d.astype(jnp.int32) + 1)
                                    .astype(jnp.int8))
        # device -> host
        t0 = time.time()
        _ = np.asarray(big)
        down = time.time() - t0
        print(f"{mb:6.2f} MB  up {up*1e3:7.1f} ms ({mb/max(up,1e-9):6.1f}"
              f" MB/s)   down {down*1e3:7.1f} ms "
              f"({mb/max(down,1e-9):6.1f} MB/s)")

    # many small fetches (latency test)
    small = jax.block_until_ready(bump(jnp.zeros((256,), jnp.int32)))
    t0 = time.time()
    for _ in range(10):
        np.asarray(small)
    print(f"1KB fetch x10: {(time.time()-t0)/10*1e3:.1f} ms each")


if __name__ == "__main__":
    main()
