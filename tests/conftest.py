"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (the standard JAX fake-backend recipe).

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon, so setting the env var alone is not enough — we also
update jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
