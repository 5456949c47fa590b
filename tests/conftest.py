"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing real codepaths at small
sizes (SURVEY §4): multi-chip logic runs on virtual CPU devices; the
real TPU is exercised by bench.py and the driver's compile checks.
Set RAV1E_TPU_TEST_TPU=1 to run tests against the real chip instead.
"""

import os

if not os.environ.get("RAV1E_TPU_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # the axon plugin can override JAX_PLATFORMS at registration;
    # rav1e_tpu._setup_platform re-asserts this one (and it keeps
    # collection alive when the tunneled TPU is unreachable)
    os.environ.setdefault("RAV1E_TPU_PLATFORM", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
