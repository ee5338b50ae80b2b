"""Hub (graph-informed) search tree tests
(mirrors reference tests/test_hub_trees.py:60-388)."""

import numpy as np
import jax.numpy as jnp

from pynndescent_tpu import NNDescent
from pynndescent_tpu.ops.rp_trees import flatten_search_tree, descend_tree, forest_depth


def test_hub_split_is_partition(nn_data):
    degrees = np.random.RandomState(0).randint(1, 40, len(nn_data))
    tree = flatten_search_tree(nn_data, seed=5, leaf_size=30, degrees=degrees)
    a = tree.to_arrays()
    # leaves tile [0, n) exactly
    leaf_mask = a["leaf_lo"] >= 0
    spans = sorted(zip(a["leaf_lo"][leaf_mask], a["leaf_hi"][leaf_mask]))
    covered = 0
    prev_end = 0
    for lo, hi in spans:
        assert lo == prev_end
        assert hi > lo
        prev_end = hi
        covered += hi - lo
    assert covered == len(nn_data)
    # order is a permutation
    assert sorted(a["tree_order"].tolist()) == list(range(len(nn_data)))


def test_hub_tree_query_recall(nn_data):
    """The full index uses the hub search tree; reference floor is 0.90
    (tests/test_hub_trees.py:216-217)."""
    from sklearn.neighbors import NearestNeighbors

    train = nn_data[200:]
    queries = nn_data[:200]
    index = NNDescent(train, n_neighbors=10, random_state=42)
    idx, _ = index.query(queries, k=10, epsilon=0.2)
    nn = NearestNeighbors(n_neighbors=10).fit(train)
    true_idx = nn.kneighbors(queries, 10, return_distance=False)
    recall = np.mean(
        [len(np.intersect1d(idx[i, :10], true_idx[i])) / 10 for i in range(200)]
    )
    assert recall >= 0.90, f"hub-tree query recall {recall}"


def test_scored_hub_splits_balance(nn_data):
    """Scored hub splits keep the best-balanced of the 3 hub-pair hyperplanes
    and bail to a leaf below MIN_SPLIT_BALANCE (reference rp_trees.py:798-933):
    every *internal* node's children must both hold >= 10% of its members."""
    degrees = np.random.RandomState(0).randint(1, 40, len(nn_data))
    tree = flatten_search_tree(nn_data, seed=7, leaf_size=30, degrees=degrees)
    a = tree.to_arrays()
    child = a["child"]
    # recover per-node sizes: leaves know theirs; internal = sum of children
    n_nodes = len(child)
    sizes = np.where(a["leaf_lo"] >= 0, a["leaf_hi"] - a["leaf_lo"], -1)
    for _ in range(64):  # bottom-up fixpoint over the shallow tree
        undone = sizes < 0
        if not undone.any():
            break
        l, r = child[:, 0], child[:, 1]
        ready = undone & (sizes[l] >= 0) & (sizes[r] >= 0)
        sizes = np.where(ready, sizes[l] + sizes[r], sizes)
    internal = a["leaf_lo"] < 0
    l_sz = sizes[child[internal, 0]].astype(float)
    r_sz = sizes[child[internal, 1]].astype(float)
    balance = np.minimum(l_sz, r_sz) / (l_sz + r_sz)
    assert balance.min() >= 0.1 - 1e-6, f"unbalanced internal node: {balance.min()}"


def test_n_search_trees_selection(nn_data):
    """n_search_trees candidate trees are scored and the best is kept
    (reference pynndescent_.py:1353-1373); more candidates never hurt
    tree quality by construction."""
    from pynndescent_tpu.ops import rp_trees

    index = NNDescent(nn_data, n_neighbors=10, random_state=42, n_search_trees=3)
    index.prepare()
    score3 = rp_trees.score_linked_tree(index._search_tree, index._neighbor_graph[0])
    assert score3 > 0.1  # leaves actually capture neighbor structure


def test_hub_tree_self_query(nn_data):
    """Self-queries must find the point itself (reference
    tests/test_hub_trees.py:327-388)."""
    index = NNDescent(nn_data[:500], n_neighbors=10, random_state=42)
    idx, dist = index.query(nn_data[:100], k=1, epsilon=0.1)
    assert np.mean(idx[:, 0] == np.arange(100)) >= 0.99
    # matmul-form sqeuclidean has ~1e-7 cancellation noise -> ~5e-4 after sqrt
    assert np.allclose(dist[:100, 0], 0.0, atol=2e-3)
