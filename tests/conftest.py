"""Test fixtures mirroring the reference suite (reference: tests/conftest.py).

Tests run on a *virtual 8-device CPU mesh* so multi-chip sharding logic is
exercised without TPU hardware; the benchmark path runs on the real chip.
These environment variables must be set before jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# jax may already be imported by a pytest plugin, in which case it captured
# JAX_PLATFORMS at import time — override through the config as well.
jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# XLA:CPU AOT cache entries are machine-feature-specific and a poisoned
# entry silently produces WRONG numerics (observed: shard-invariance test
# failing only under a stale cache). The TPU bench path enables it safely.

import numpy as np
import pytest
from scipy import sparse

SEED = 189212  # same fixed seed as the reference suite


@pytest.fixture
def seed():
    return SEED


@pytest.fixture
def spatial_data():
    rng = np.random.RandomState(SEED)
    data = rng.randn(10, 20).astype(np.float32)
    # zero-vector corner cases, as in the reference fixture
    return np.vstack([data, np.zeros((2, 20), dtype=np.float32)])


@pytest.fixture
def binary_data():
    rng = np.random.RandomState(SEED)
    return rng.choice(a=[False, True], size=(10, 20), p=[0.66, 1 - 0.66])


@pytest.fixture
def sparse_spatial_data(spatial_data, binary_data):
    return sparse.csr_matrix(spatial_data * binary_data.astype(np.float32))


@pytest.fixture
def sparse_binary_data(binary_data):
    return sparse.csr_matrix(binary_data)


@pytest.fixture
def nn_data():
    rng = np.random.RandomState(SEED)
    data = rng.uniform(0, 1, size=(1000, 5)).astype(np.float32)
    return np.vstack([data, np.zeros((2, 5), dtype=np.float32)])


@pytest.fixture
def sparse_nn_data():
    rng = np.random.RandomState(SEED)
    dense = rng.uniform(0, 1, size=(1000, 50)).astype(np.float32)
    mask = rng.uniform(0, 1, size=dense.shape) >= 0.5
    return sparse.csr_matrix(dense * mask)


@pytest.fixture
def small_data():
    rng = np.random.RandomState(SEED)
    return rng.uniform(0, 1, size=(32, 5)).astype(np.float32)
