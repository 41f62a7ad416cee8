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
    # persistent compile cache: cuts individual XLA compiles ~60% (5.9 ->
    # 2.2 s measured) but the suite is trace-bound, so the wall-clock win on
    # warm reruns is small; kept because it is free and helps the heaviest
    # compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("YOLORT_JAX_CACHE", "/tmp/yolort_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# YOLORT_TPU_TESTS=1 leaves the session backend (e.g. the axon TPU) active
# so the TPU-only tests (test_pallas_tpu.py) actually run on hardware.
