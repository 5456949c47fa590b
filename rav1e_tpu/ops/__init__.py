"""Coding-tool ops: numpy spec-reference implementations (ops.ref) and
TPU Pallas/XLA kernels (ops.pallas) validated against them.

Reference parity: rav1e src/transform/, src/predict.rs, src/mc.rs,
src/quantize.rs, src/dist.rs, src/cdef.rs, src/lrf.rs, src/deblock.rs,
with the SIMD layer (src/asm/) replaced by batched TPU kernels.
"""
