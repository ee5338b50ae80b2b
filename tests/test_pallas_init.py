"""Pallas leaf all-pairs init kernel: correctness in interpreter mode.

The compiled kernel runs on TPU only (gated by _pallas_init_ok); these tests
exercise the same kernel code through the Pallas interpreter on the CPU mesh
and compare against the gather-based XLA init path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops import pallas_init as pi
from pynndescent_tpu.ops import rp_trees
from pynndescent_tpu.ops.neighbors import make_neighbor_state


@pytest.fixture(scope="module")
def small_forest():
    n, d = 600, 16
    rs = np.random.RandomState(0)
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))
    seeds = jnp.arange(2, dtype=jnp.uint32)
    orders, starts, sizes = rp_trees.build_forest_orders(
        X, seeds, 30, rp_trees.forest_depth(n, 30)
    )
    return X, orders, starts, sizes


def test_leaf_allpairs_matches_oracle(small_forest):
    X, orders, starts, sizes = small_forest
    n = X.shape[0]
    ls, lz, ovf = pi.leaf_tables_from_orders(starts, sizes, n, 64)
    assert not bool(np.asarray(ovf).any())
    t = 0
    X_t = X[orders[t]]
    D = np.asarray(
        pi.leaf_allpairs(X_t, ls[t], lz[t], cap=64, metric="sqeuclidean", interpret=True)
    )
    on = np.asarray(orders[t])
    st_ = np.asarray(starts[t])
    sz_ = np.asarray(sizes[t])
    Xn = np.asarray(X)
    rs = np.random.RandomState(1)
    for p in rs.choice(n, 40, replace=False):
        s0 = st_[p]
        if p - s0 >= 64:
            continue
        w = min(sz_[p], 64)
        want = ((Xn[on[p]][None] - Xn[on[s0 : s0 + w]]) ** 2).sum(-1)
        np.testing.assert_allclose(D[p][:w], want, rtol=1e-4, atol=1e-4)
        assert np.all(np.isinf(D[p][w:]))


@pytest.mark.parametrize("metric", ["sqeuclidean", "alternative_cosine"])
def test_pallas_forest_init_matches_xla(small_forest, metric):
    X, orders, starts, sizes = small_forest
    n = X.shape[0]
    state0 = make_neighbor_state(n, 8)
    st_p = nnd_ops.pallas_forest_init(
        state0, X, orders, starts, sizes, metric=metric, leaf_cap=30, interpret=True
    )
    dr = nnd_ops._resolve_rowwise_metric(metric, None)
    # the kernel windows whole leaves (cap 64 >= leaf_size); compare against
    # the gather path at the same window width
    st_x = nnd_ops._jit_forest_init(
        state0, X, orders, starts, sizes, dist_rowwise=dr, leaf_cap=64
    )
    agree = (np.asarray(st_p.idx) == np.asarray(st_x.idx)).mean()
    assert agree > 0.999, f"row agreement {agree}"
    pd, xd = np.asarray(st_p.dist), np.asarray(st_x.dist)
    both = np.isfinite(pd) & np.isfinite(xd) & (np.asarray(st_p.idx) == np.asarray(st_x.idx))
    np.testing.assert_allclose(pd[both], xd[both], rtol=1e-4, atol=1e-4)


def test_oversized_leaf_rows_fall_back(small_forest):
    """Positions past start+cap of a fat leaf must yield empty rows (merged
    later by random init), never garbage."""
    X, orders, starts, sizes = small_forest
    n = X.shape[0]
    # fake one fat leaf covering everything
    orders1 = orders[:1]
    starts1 = jnp.zeros((1, n), jnp.int32)
    sizes1 = jnp.full((1, n), n, jnp.int32)
    state0 = make_neighbor_state(n, 4)
    st = nnd_ops.pallas_forest_init(
        state0, X, orders1, starts1, sizes1, metric="sqeuclidean", leaf_cap=30,
        interpret=True,
    )
    idx = np.asarray(st.idx)
    on = np.asarray(orders1[0])
    # rows whose tree position is >= cap are uncovered -> empty
    pos_of = np.empty(n, np.int64)
    pos_of[on] = np.arange(n)
    uncovered = pos_of >= 64
    assert np.all(idx[uncovered] == -1)
    assert np.all(idx[~uncovered] >= 0)
