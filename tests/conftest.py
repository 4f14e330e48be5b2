"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (8 host devices), the
strategy the reference never needs (it is single-threaded) but our
distributed layer requires. f64 is enabled to meet the reference tolerances
(property tests at 5e-9, polynomial exactness at 1e-12 — reference
``src/algorithms/mod.rs:360``, ``tests/correctness.rs:42-51``).

Note: the ambient environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU
backend) and imports jax from sitecustomize, so plain env vars here are too
late — but JAX backends initialize lazily, so ``jax.config.update`` before
first device use still wins.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
