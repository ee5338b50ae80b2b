"""Neighbor-state merge invariants (the heap-replacement layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops.neighbors import (
    make_neighbor_state,
    merge_candidates,
    sort_by_distance,
    state_from_graph,
)


def test_merge_basic_topk():
    st = make_neighbor_state(2, 3)
    cand_idx = jnp.array([[5, 7, 9, 11], [1, 2, 3, 4]], jnp.int32)
    cand_dist = jnp.array([[0.5, 0.1, 0.9, 0.3], [4.0, 3.0, 2.0, 1.0]], jnp.float32)
    st, changes = merge_candidates(st, cand_idx, cand_dist)
    np.testing.assert_array_equal(np.asarray(st.idx), [[7, 11, 5], [4, 3, 2]])
    np.testing.assert_allclose(np.asarray(st.dist), [[0.1, 0.3, 0.5], [1.0, 2.0, 3.0]])
    assert bool(np.all(np.asarray(st.flag)))
    assert int(changes) == 6


def test_merge_dedup_duplicate_candidates():
    st = make_neighbor_state(1, 4)
    cand_idx = jnp.array([[3, 3, 3, 5, 5, 2]], jnp.int32)
    cand_dist = jnp.array([[1.0, 1.0, 2.0, 0.5, 0.5, 4.0]], jnp.float32)
    st, _ = merge_candidates(st, cand_idx, cand_dist)
    idx = np.asarray(st.idx[0])
    # duplicate-free row, reference invariant (test_pynndescent_.py:311-314)
    valid = idx[idx >= 0]
    assert len(np.unique(valid)) == len(valid)
    np.testing.assert_array_equal(idx[:3], [5, 3, 2])


def test_merge_keeps_incumbent_flag_on_duplicate():
    st = make_neighbor_state(1, 3)
    st, _ = merge_candidates(
        st, jnp.array([[4]], jnp.int32), jnp.array([[1.0]], jnp.float32)
    )
    st = st._replace(flag=jnp.zeros_like(st.flag))  # mark as old
    st2, changes = merge_candidates(
        st, jnp.array([[4]], jnp.int32), jnp.array([[1.0]], jnp.float32)
    )
    assert int(changes) == 0
    assert not bool(st2.flag[0, 0])  # incumbent survived, stays old


def test_merge_invalid_candidates_ignored():
    st = make_neighbor_state(1, 2)
    st, changes = merge_candidates(
        st, jnp.array([[-1, -1]], jnp.int32), jnp.array([[0.1, 0.2]], jnp.float32)
    )
    assert int(changes) == 0
    assert np.all(np.asarray(st.idx) == -1)
    assert np.all(np.isinf(np.asarray(st.dist)))


def test_merge_better_distance_replaces():
    st = state_from_graph(
        jnp.array([[1, 2, 3]], jnp.int32), jnp.array([[1.0, 2.0, 3.0]], jnp.float32)
    )
    st2, changes = merge_candidates(
        st, jnp.array([[9]], jnp.int32), jnp.array([[0.5]], jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(st2.idx), [[9, 1, 2]])
    assert int(changes) >= 1


def test_sort_by_distance_invalid_last():
    idx = jnp.array([[3, -1, 5]], jnp.int32)
    dist = jnp.array([[2.0, 0.1, 1.0]], jnp.float32)
    s_idx, s_dist = sort_by_distance(idx, dist)
    np.testing.assert_array_equal(np.asarray(s_idx), [[5, 3, -1]])
    assert np.isinf(np.asarray(s_dist)[0, 2])


def test_dedup_stable_variant_semantics_identical():
    """The 2-key stable dedup sort must produce identical merges to the
    3-key (id, dist, age) sort — incl. exact ties and duplicates."""
    import pynndescent_tpu.ops.neighbors as nb

    rs = np.random.RandomState(7)
    n, k, m = 64, 8, 24
    idx = rs.randint(0, 40, (n, k)).astype(np.int32)  # forced duplicate ids
    dist = np.round(rs.uniform(0, 4, (n, k)), 1).astype(np.float32)  # forced ties
    flag = rs.rand(n, k) < 0.5
    order = np.argsort(dist, 1)
    state = nb.NeighborState(
        jnp.asarray(np.take_along_axis(idx, order, 1)),
        jnp.asarray(np.take_along_axis(dist, order, 1)),
        jnp.asarray(np.take_along_axis(flag, order, 1)),
    )
    cand = jnp.asarray(rs.randint(-1, 40, (n, m)).astype(np.int32))
    cd = jnp.asarray(np.round(rs.uniform(0, 4, (n, m)), 1).astype(np.float32))
    outs = []
    old = nb.DEDUP_STABLE
    try:
        for mode in (False, True):
            nb.DEDUP_STABLE = mode
            merged, ch = jax.jit(nb.merge_candidates)(state, cand, cd)
            outs.append((np.asarray(merged.idx), np.asarray(merged.dist),
                         np.asarray(merged.flag), int(ch)))
    finally:
        nb.DEDUP_STABLE = old
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
    assert outs[0][3] == outs[1][3]
