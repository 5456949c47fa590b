"""Quick real-chip timing of the s6 P step's three dispatches."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from rav1e_tpu.api.speed import SpeedSettings
from rav1e_tpu.pipeline import tpu_inter as TI

rng = np.random.default_rng(3)
w, h = 1920, 1088
yy, xx = np.mgrid[0:h, 0:w]
base = (100 + 50 * np.sin(xx / 37) + 40 * np.cos(yy / 23)
        + rng.normal(0, 5, (h, w)))
f0 = [base.clip(0, 255).astype(np.uint8),
      np.full((h // 2, w // 2), 128, np.uint8),
      np.full((h // 2, w // 2), 128, np.uint8)]
f1 = [np.roll(f0[0], (2, 5), (0, 1)), f0[1], f0[2]]
ss = SpeedSettings.from_preset(6)
step, (nby, nbx), gd = TI._core(
    h, w, True, use_split=ss.partition_split_rdo,
    use_satd=ss.satd_subpel, refine16=ss.mv_refine_16,
    intra_rdo=ss.intra_in_inter, b64_rdo=ss.b64_merge,
    search=ss.search_px, subpel=ss.subpel,
    use_split8=ss.partition_split8)
rd = TI.build_rd_inter(100)
dcq, acq = jnp.int32(TI.dc_q_lut(100)), jnp.int32(TI.ac_q_lut(100))
cdef_prm = jnp.asarray([0, 0, 0, 0, 3], jnp.int32)
ref = tuple(jnp.asarray(np.asarray(p, np.uint8)) for p in f0)
src = jnp.asarray(TI.pack_src(f1))
ds = TI._ds16_quads(None, h // 32, w // 32)
core, filt, pack = step.core, step.filt, step.pack


def t(fn):
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        ts.append((time.time() - t0) * 1e3)
    return f"{min(ts):.0f}ms"


o = core(src, *ref, dcq, acq, cdef_prm, rd, ds)
jax.block_until_ready(o)
print("core:", t(lambda: core(src, *ref, dcq, acq, cdef_prm, rd, ds)))
fargs = (src, o[6], o[7], o[8], rd["base_lf"], cdef_prm, o[11], o[13],
         o[16], rd["lam"], o[17], o[18])
fo = filt(*fargs)
jax.block_until_ready(fo)
print("filt:", t(lambda: filt(*fargs)))
po = pack(o, fo[0], fo[1])
jax.block_until_ready(po)
print("pack:", t(lambda: pack(o, fo[0], fo[1])))
o2 = step(src, *ref, dcq, acq, cdef_prm, rd, ds)
jax.block_until_ready(o2)
print("full step:", t(lambda: step(src, *ref, dcq, acq, cdef_prm,
                                   rd, ds)))
