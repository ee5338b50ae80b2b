"""Deterministic counter-based PRNG plumbing.

The reference threads a mutable 3-word Tausworthe state through every kernel,
with per-thread streams made by offsetting the state with the thread id
(reference: utils.py:11-57, 261-262). On TPU the idiomatic equivalent is
JAX's stateless threefry keys: every (phase, iteration, role) derives its own
key via ``fold_in``, so results are bit-identical regardless of device count
or scheduling — the determinism contract the reference tests demand
(tests/test_pynndescent_.py:279-292) holds *by construction*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Stable role tags so key derivation never depends on call order.
ROLE_FOREST = 1
ROLE_DESCENT_INIT = 2
ROLE_DESCENT_ITER = 3
ROLE_SEARCH = 4
ROLE_UPDATE = 5
ROLE_QUANTIZE = 6


def state_from_seed(seed) -> jax.Array:
    """Build a root key from an int seed or numpy RandomState (matching the
    reference's check_random_state-based seeding, pynndescent_.py:1105)."""
    if isinstance(seed, np.random.RandomState):
        seed = int(seed.randint(0, np.iinfo(np.int32).max))
    elif seed is None:
        seed = int(np.random.randint(0, np.iinfo(np.int32).max))
    return jax.random.PRNGKey(int(seed))


def derive(key: jax.Array, *tags: int) -> jax.Array:
    """Derive a subkey from a stable tuple of integer tags."""
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def uniform(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype)


def randint(key, shape, minval, maxval):
    return jax.random.randint(key, shape, minval, maxval, dtype=jnp.int32)
