"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
CPU platform with 8 virtual devices (the pattern recommended in
SURVEY.md §4).  XLA_FLAGS must be set before the CPU backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image registers itself unconditionally and
# wins platform selection over the JAX_PLATFORMS env var; the config knob
# still takes priority.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
