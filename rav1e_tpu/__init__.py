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

import os as _os


def _setup_jax_cache():
    """Persistent XLA compilation cache: TPU compiles of the big int32
    transform graphs take minutes; cache them across processes."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "RAV1E_TPU_JAX_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "rav1e_tpu_jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _setup_platform():
    """Honor RAV1E_TPU_PLATFORM=cpu even when a TPU plugin is present
    (the env var JAX_PLATFORMS alone is ignored once the plugin
    registers)."""
    import os as _os
    plat = (_os.environ.get("RAV1E_TPU_PLATFORM")
            or _os.environ.get("JAX_PLATFORMS"))
    if plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


_setup_jax_cache()
_setup_platform()
