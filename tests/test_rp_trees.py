"""RP-tree invariants (mirrors reference tests/test_hub_trees.py split
invariants and rp_trees behavior)."""

import numpy as np
import pytest

from pynndescent_tpu.ops.rp_trees import (
    build_tree_order,
    leaf_arrays_from_order,
    make_forest_leaves,
    forest_depth,
)
from pynndescent_tpu.utils import rng


@pytest.mark.parametrize("angular", [False, True])
def test_tree_is_partition(nn_data, angular):
    n = nn_data.shape[0]
    order, start, size = build_tree_order(
        nn_data, np.uint32(12345), leaf_size=30, max_depth=forest_depth(n, 30), angular=angular
    )
    order = np.asarray(order)
    start = np.asarray(start)
    size = np.asarray(size)
    # order is a permutation
    assert sorted(order.tolist()) == list(range(n))
    # every leaf slice is consistent and within leaf_size
    heads = np.nonzero(np.arange(n) == start)[0]
    covered = 0
    for h in heads:
        s = size[h]
        assert s <= 30
        assert np.all(start[h : h + s] == h)
        assert np.all(size[h : h + s] == s)
        covered += s
    assert covered == n


def test_tree_leaves_are_spatially_local(nn_data):
    n = nn_data.shape[0]
    order, start, size = build_tree_order(
        nn_data, np.uint32(7), leaf_size=50, max_depth=forest_depth(n, 50)
    )
    leaves = leaf_arrays_from_order(order, start, size)
    # leaf-mate mean distance should be well below global mean distance
    rs = np.random.RandomState(0)
    global_pairs = nn_data[rs.randint(0, n, 2000)] - nn_data[rs.randint(0, n, 2000)]
    global_mean = np.mean(np.linalg.norm(global_pairs, axis=1))
    leaf = leaves[0]
    members = leaf[leaf >= 0]
    diffs = nn_data[members][:, None, :] - nn_data[members][None, :, :]
    leaf_mean = np.mean(np.linalg.norm(diffs, axis=-1))
    assert leaf_mean < 0.7 * global_mean


def test_duplicate_data_does_not_hang():
    # reference regression: duplicate rows blow up recursion
    # (tests/test_pynndescent_.py:299-369, cosine_hang.npy)
    data = np.ones((500, 8), np.float32)
    order, start, size = build_tree_order(
        data, np.uint32(3), leaf_size=30, max_depth=forest_depth(500, 30)
    )
    assert sorted(np.asarray(order).tolist()) == list(range(500))
    assert int(np.asarray(size).max()) <= 64  # random fallback keeps it balanced


def test_zero_vectors_angular():
    data = np.zeros((100, 4), np.float32)
    order, start, size = build_tree_order(
        data, np.uint32(5), leaf_size=25, max_depth=forest_depth(100, 25), angular=True
    )
    assert sorted(np.asarray(order).tolist()) == list(range(100))


def test_forest_determinism(nn_data):
    key = rng.state_from_seed(11)
    l1 = make_forest_leaves(nn_data, n_trees=3, leaf_size=40, key=key)
    l2 = make_forest_leaves(nn_data, n_trees=3, leaf_size=40, key=key)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)


def test_small_data_single_leaf(small_data):
    # leaf_size > n: tree never splits (reference tests :715-747)
    n = small_data.shape[0]
    order, start, size = build_tree_order(
        small_data, np.uint32(1), leaf_size=64, max_depth=4
    )
    assert int(np.asarray(size)[0]) == n
    leaves = leaf_arrays_from_order(order, start, size)
    assert leaves.shape[0] == 1


def test_flat_tree_descent_consistency(nn_data):
    """Descending a training point through the flattened tree must land in
    the leaf that contains it — verifies the host flattening mirrors the
    device build exactly (hash functions, split boundaries, anchors)."""
    import jax.numpy as jnp
    from pynndescent_tpu.ops.rp_trees import flatten_search_tree, descend_tree

    tree = flatten_search_tree(nn_data, seed=97, leaf_size=40)
    arrays = tree.to_arrays()
    order = arrays["tree_order"]
    pos_of = np.empty(len(order), np.int64)
    pos_of[order] = np.arange(len(order))
    tree_dev = {
        k: jnp.asarray(v) for k, v in arrays.items() if k not in ("depth", "angular", "leaf_size")
    }
    queries = jnp.asarray(nn_data[:256])
    coins = jnp.zeros(256, jnp.uint32)
    lo, hi = descend_tree(tree_dev, jnp.asarray(nn_data), queries, coins, arrays["depth"])
    lo, hi = np.asarray(lo), np.asarray(hi)
    ok = 0
    for i in range(256):
        p = pos_of[i]
        ok += int(lo[i] <= p < hi[i])
    # margin==0 coin flips can diverge between build and query for points on
    # a splitting hyperplane; require near-total agreement
    assert ok >= 250, f"only {ok}/256 points landed in their own leaf"


def test_score_tree(nn_data):
    from sklearn.neighbors import NearestNeighbors

    from pynndescent_tpu.ops.rp_trees import build_tree_order, score_tree

    n = nn_data.shape[0]
    order, start, size = build_tree_order(
        nn_data, np.uint32(3), leaf_size=60, max_depth=forest_depth(n, 60)
    )
    nn = NearestNeighbors(n_neighbors=5).fit(nn_data)
    true_idx = nn.kneighbors(nn_data, 5, return_distance=False)
    s = score_tree(order, start, size, true_idx)
    # a sane RP tree keeps a decent share of neighbors in-leaf; random
    # assignment would score ~leaf_size/n ~ 0.06
    assert 0.2 < s <= 1.0
