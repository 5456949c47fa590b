"""rav1e_tpu — a TPU-native AV1 encoder (JAX / Pallas / shard_map).

A from-scratch AV1 encoder with the capability surface of rav1e
(reference: rav1e v0.5.1; see SURVEY.md), re-architected TPU-first:

- per-block compute (transforms, prediction, MC, distortion, in-loop
  filters) batched across superblocks as Pallas/XLA kernels,
- frame passes sharded over tiles across chips (ICI halo exchange),
- GOPs distributed across hosts (DCN),
- the serial per-tile entropy pack split behind a symbol-stream IR
  with host C++ and pure-Python packers.

Conformance is defined by dav1d: every bitstream must decode to exactly
the encoder's predicted reconstruction.
"""

__version__ = "0.1.0"
