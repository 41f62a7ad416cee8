"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware.

Note: the session's sitecustomize registers the remote 'axon' TPU backend at
interpreter start and pins JAX_PLATFORMS=axon, so we must override via
jax.config *after* import — env vars alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
