"""Multi-chip/multi-host parallelism (SURVEY §5.8).

Axes (replacing rayon thread parallelism in the reference):
- 'gop': GOP/frame data-parallelism across hosts (DCN)
- 'tile': AV1 tiles across chips (ICI); tiles are spec-independent
  coding units, so per-tile state needs no cross-talk until the
  in-loop filters exchange halos (ppermute, later milestone).
"""
