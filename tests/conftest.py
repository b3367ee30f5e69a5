"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The reference has no distributed tests (SURVEY.md §4); we use the standard JAX
"multi-node without a cluster" fake backend — 8 virtual CPU devices — so mesh /
sharding tests run anywhere. Real-TPU benchmarks live in bench.py, not tests.

NOTE (axon environments): the TPU plugin may override ``JAX_PLATFORMS`` from
sitecustomize, so the env var alone is not enough — we must also call
``jax.config.update('jax_platforms', 'cpu')`` before any backend is touched.
Without this, every jit in the test suite compiles remotely over the TPU
tunnel (minutes per compile).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles dozens of small programs
# (trainings at several tiny configs); reruns skip all of it.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
