"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-chip hardware is unavailable in CI; we validate sharding/collectives on
a host-platform mesh (`--xla_force_host_platform_device_count=8`), the
standard JAX pattern for testing `Mesh`/`shard_map` code single-host.
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to the (single)
# TPU tunnel; tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The ambient environment registers a single-chip TPU tunnel backend and
# force-selects it via jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start (sitecustomize), so the env var alone is not enough —
# override the config too, before any jax computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
