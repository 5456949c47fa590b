"""TPU (JAX/XLA/Pallas) kernels, batched over blocks.

Replaces the reference's SIMD layer (rav1e src/asm/): every kernel is
validated bit-exact against ops.ref (the check_asm discipline).
Compute style: int32 vector math on [batch, n]-shaped lanes; matmuls
(forward transforms, SATD) ride the MXU in float32.
"""
