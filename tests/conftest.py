"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware.

Note: the session's sitecustomize registers the remote 'axon' TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so we must override via
jax.config *after* import — env vars alone are not enough.
"""

import os

if os.environ.get("YOLORT_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
# YOLORT_TPU_TESTS=1 leaves the session backend (e.g. the axon TPU) active
# so the TPU-only tests (test_pallas_tpu.py) actually run on hardware.
