"""Test harness: force an 8-virtual-device CPU platform (SURVEY.md §4.4).

The image boots with an `axon` TPU platform pre-registered by sitecustomize,
so plain env vars are not enough — we also update jax.config before any
backend is initialized. This must run before any test module imports heavy
deps, which pytest guarantees for conftest at collection time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cudasbmp_tpu.config import KGMTConfig, Scenario  # noqa: E402


@pytest.fixture(scope="session")
def demo_scenario() -> Scenario:
    return Scenario.demo()


@pytest.fixture(scope="session")
def small_config() -> KGMTConfig:
    """A scaled-down config that solves fast on CPU."""
    return KGMTConfig(
        num_iterations=100,
        max_tree_size=16384,
        rollouts_per_iter=2048,
        seed=0,
    )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
