"""Test configuration: force an 8-virtual-device CPU mesh before JAX import.

Real TPU hardware is single-chip in this environment; sharding/mesh tests run
against XLA's host platform with 8 virtual devices, which exercises the same
pjit/shard_map partitioning logic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# (forced-CPU runs get NO persistent compile cache — XLA:CPU
# executable.serialize() can abort the process; audiotabs_tpu/__init__.py)

# The axon sitecustomize registers the TPU plugin and force-selects it via
# jax.config, so the env var alone is not enough — override the config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sine_wave():
    """1 s of 440 Hz at 22050 Hz — the canonical tiny fixture."""
    sr = 22050
    t = np.arange(sr) / sr
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32), sr
