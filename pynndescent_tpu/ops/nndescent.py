"""NN-Descent graph construction — TPU-native formulation.

Capability parity with the reference driver (``pynndescent_.py:73-366`` dense,
``sparse_nndescent.py`` sparse) but a different algorithmic shape, chosen for
the hardware:

The reference's inner loop is a *pair-emitting local join*: for each vertex it
enumerates candidate x candidate pairs, thresholds them against two heaps, and
scatters (p, q, d) update triples to both endpoints through owner-computes
thread blocks (utils.py:536-733). That shape is scatter-dominated — poison on
TPU, where scatters serialise and matmuls are nearly free.

Here the join is **row-local**: every vertex i gathers a fixed-width candidate
pool built from

  * its sampled *new* forward neighbors and *new* reverse neighbors (1-hop),
  * sampled neighbors of those new hops, and new-flagged neighbors of its
    *old* hops (2-hop),

computes all distances d(x_i, pool) as one batched MXU/VPU tile, and merges
the result into its own sorted neighbor row. No update ever crosses rows, so
the whole iteration is embarrassingly row-parallel: the only scatter left is
the O(n*k) reverse-neighbor sampling, done once per iteration with a
min-priority slot reservoir.

Why this is equivalent: the reference evaluates pair (q1, q2) when both are
candidates of a common vertex i and at least one is new. Viewed from q1's
side, that is exactly "q2 is a neighbor of a vertex i adjacent to q1, through
a new edge" — i.e. a 2-hop neighbor through a new hop. The set of pairs
explored per iteration is the same family, sampled at the same fixed budget,
with updates delivered to q1 by its own gather instead of a remote scatter.

Multi-device: the row-local shape shards trivially — vertices are sharded
across the mesh, the candidate-pool gathers of X become all-gathers of point
blocks, and the single reverse-sampling scatter becomes an all-to-all of
(edge, priority) tuples (see pynndescent_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops import distances as dst
from pynndescent_tpu.ops.neighbors import (
    NeighborState,
    make_neighbor_state,
    merge_candidates,
    sort_by_distance,
)
from pynndescent_tpu.utils import rng

DEFAULT_BLOCK_ROWS = 4096


def _resolve_rowwise_metric(metric, metric_kwds) -> Callable:
    """Return fn(Q [b, d], C [b, m, d]) -> [b, m] distances."""
    if callable(metric):
        fn = metric
        if metric_kwds:
            fn = functools.partial(fn, **metric_kwds)
        return lambda Q, C: fn(Q[:, None, :], C)
    kwds = metric_kwds or {}
    return lambda Q, C: dst.pairwise_rowwise(metric, Q, C, **kwds)


# ---------------------------------------------------------------------------
# Candidate sampling
# ---------------------------------------------------------------------------


def _forward_sample(idx, pri, mask, c):
    """Per row, pick the (up to) c masked entries with smallest priority.
    Returns (candidate ids [n, c], selected positions [n, c], valid [n, c])."""
    masked_pri = jnp.where(mask, pri, jnp.inf)
    neg_top, pos = jax.lax.top_k(-masked_pri, c)
    valid = jnp.isfinite(neg_top)
    cand = jnp.where(valid, jnp.take_along_axis(idx, pos, axis=-1), -1)
    return cand, pos, valid


def _reverse_sample(idx, pri, slot, mask, n, c):
    """Slot-reservoir reverse sampling: each directed edge (i -> idx[i, l])
    bids for a random slot in its *target's* candidate row with a random
    priority; the minimum-priority bid per slot wins.

    This is the TPU replacement for the reference's owner-computes reverse
    candidate pass (utils.py:259-306): one scatter-min + one gather instead
    of every thread scanning all edges.

    Returns (reverse candidates [n, c], per-edge win mask [n, k]).
    """
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], idx.shape)
    tgt = jnp.where(mask, idx, n)  # dump masked edges on a padding row
    pri = jnp.where(mask, pri, jnp.inf)

    buf = jnp.full((n + 1, c), jnp.inf, jnp.float32)
    buf = buf.at[tgt, slot].min(pri)
    won = (pri == buf[tgt, slot]) & mask
    rcand = jnp.full((n + 1, c), -1, jnp.int32)
    rcand = rcand.at[tgt, slot].max(jnp.where(won, src, -1))
    return rcand[:n], won


class CandidateSample(NamedTuple):
    hop_new: jax.Array  # [n, 2c] new 1-hop candidates (fwd + rev)
    hop_old: jax.Array  # [n, 2c] old 1-hop candidates (fwd + rev)
    flag: jax.Array  # [n, k] updated (cleared) new-flags


def build_candidates(state: NeighborState, key, max_candidates: int) -> CandidateSample:
    """Sample new/old forward + reverse candidates and clear the sampled
    new-flags (reference: new_build_candidates, utils.py:221-320)."""
    n, k = state.idx.shape
    c = max_candidates
    valid = state.idx >= 0
    k_f, k_rn, k_ro, k_slot_n, k_slot_o = jax.random.split(key, 5)

    pri = jax.random.uniform(k_f, (n, k))
    new_mask = valid & state.flag
    old_mask = valid & ~state.flag

    fwd_new, pos_new, sel_new = _forward_sample(state.idx, pri, new_mask, c)
    fwd_old, _, _ = _forward_sample(state.idx, pri, old_mask, c)

    rpri_n = jax.random.uniform(k_rn, (n, k))
    rpri_o = jax.random.uniform(k_ro, (n, k))
    slot_n = jax.random.randint(k_slot_n, (n, k), 0, c, dtype=jnp.int32)
    slot_o = jax.random.randint(k_slot_o, (n, k), 0, c, dtype=jnp.int32)
    rev_new, won_new = _reverse_sample(state.idx, rpri_n, slot_n, new_mask, n, c)
    rev_old, _ = _reverse_sample(state.idx, rpri_o, slot_o, old_mask, n, c)

    # Clear flags of new edges consumed this round: forward-sampled ones and
    # reverse winners (reference clears on priority match, utils.py:285-306).
    flag = state.flag
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], pos_new.shape)
    flag = flag.at[rows, pos_new].set(
        jnp.where(sel_new, False, flag[rows, pos_new])
    )
    flag = flag & ~won_new

    hop_new = jnp.concatenate([fwd_new, rev_new], axis=-1)
    hop_old = jnp.concatenate([fwd_old, rev_old], axis=-1)
    return CandidateSample(hop_new, hop_old, flag)


# ---------------------------------------------------------------------------
# Row-local join
# ---------------------------------------------------------------------------


def _subsample_hop2(nbr_idx, nbr_ok, key, t):
    """nbr_idx [b, h, k] neighbor rows of each hop; pick t random valid
    columns per hop. Returns [b, h*t] candidate ids."""
    b, h, k = nbr_idx.shape
    pos = jax.random.randint(key, (b, h, t), 0, k, dtype=jnp.int32)
    picked = jnp.take_along_axis(nbr_idx, pos, axis=-1)
    ok = jnp.take_along_axis(nbr_ok, pos, axis=-1)
    return jnp.where(ok, picked, -1).reshape(b, h * t)


def _join_block(
    row_ids,  # [b]
    hop_new,  # [b, 2c]
    hop_old,  # [b, 2c]
    cand_new,  # [n, 2c] full new candidate table (for 2-hop gathers)
    cand_all,  # [n, 4c] full new+old candidate table
    X,  # [n, d]
    key,
    dist_rowwise,
    hop2_new_samples: int,
    hop2_old_samples: int,
):
    """Build the candidate pool for a block of rows and compute distances.

    The 2-hop expansion goes through the *candidate tables*, which are
    approximately symmetric (h in cand(p) <=> p in cand(h) up to reservoir
    sampling). This makes the receive-form join cover exactly the pair family
    of the reference's local join (pynndescent_.py:217, utils.py:536-733):
    for any common vertex i with p, q in cand(i), p finds q by expanding
    cand(i) through its own hop h = i — including rev x rev co-parent pairs.
    Pairs must involve at least one new edge, so new hops expand the full
    table while old hops expand only the new half.

    Returns (pool ids [b, P], pool distances [b, P])."""
    k1, k2 = jax.random.split(key)

    hn = jnp.maximum(hop_new, 0)
    exp_new = cand_all[hn]  # [b, 2c, 4c]
    ok_new = (exp_new >= 0) & (hop_new >= 0)[:, :, None]
    hop2_new = _subsample_hop2(exp_new, ok_new, k1, hop2_new_samples)

    ho = jnp.maximum(hop_old, 0)
    exp_old = cand_new[ho]  # [b, 2c, 2c]
    ok_old = (exp_old >= 0) & (hop_old >= 0)[:, :, None]
    hop2_old = _subsample_hop2(exp_old, ok_old, k2, hop2_old_samples)

    pool = jnp.concatenate([hop_new, hop2_new, hop2_old], axis=-1)  # [b, P]

    Q = X[row_ids]
    C = X[jnp.maximum(pool, 0)]
    d = dist_rowwise(Q, C)
    d = jnp.where(pool < 0, jnp.inf, d)
    return pool, d


# ---------------------------------------------------------------------------
# Iteration + driver
# ---------------------------------------------------------------------------


def _descent_iteration(
    state: NeighborState,
    X,
    key,
    *,
    max_candidates: int,
    dist_rowwise,
    block_rows: int,
    hop2_new_samples: int,
    hop2_old_samples: int,
):
    n = X.shape[0]
    k_cand, k_join = jax.random.split(key)
    sample = build_candidates(state, k_cand, max_candidates)
    state = state._replace(flag=sample.flag)

    cand_new = sample.hop_new
    cand_all = jnp.concatenate([sample.hop_new, sample.hop_old], axis=-1)

    b = min(block_rows, n)
    n_blocks = -(-n // b)

    def body(blk, carry):
        st, changes = carry
        start = jnp.minimum(blk * b, n - b)
        rows = start + jnp.arange(b, dtype=jnp.int32)
        pool, d = _join_block(
            rows,
            jax.lax.dynamic_slice_in_dim(sample.hop_new, start, b),
            jax.lax.dynamic_slice_in_dim(sample.hop_old, start, b),
            cand_new,
            cand_all,
            X,
            jax.random.fold_in(k_join, blk),
            dist_rowwise,
            hop2_new_samples,
            hop2_old_samples,
        )
        blk_state = NeighborState(
            jax.lax.dynamic_slice_in_dim(st.idx, start, b),
            jax.lax.dynamic_slice_in_dim(st.dist, start, b),
            jax.lax.dynamic_slice_in_dim(st.flag, start, b),
        )
        merged, n_changed = merge_candidates(blk_state, pool, d)
        st = NeighborState(
            jax.lax.dynamic_update_slice_in_dim(st.idx, merged.idx, start, 0),
            jax.lax.dynamic_update_slice_in_dim(st.dist, merged.dist, start, 0),
            jax.lax.dynamic_update_slice_in_dim(st.flag, merged.flag, start, 0),
        )
        return st, changes + n_changed

    state, changes = jax.lax.fori_loop(0, n_blocks, body, (state, jnp.int32(0)))
    return state, changes


def init_random(state: NeighborState, X, key, n_extra: int, dist_rowwise):
    """Random-fill initialisation (reference: init_random, pynndescent_.py:193)."""
    n = X.shape[0]
    cand = jax.random.randint(key, (n, n_extra), 0, n, dtype=jnp.int32)
    # the reference convention keeps each point as its own first neighbor
    # (distance 0); seed it explicitly
    self_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    cand = jnp.concatenate([self_ids, cand], axis=-1)
    d = dist_rowwise(X, X[jnp.maximum(cand, 0)])
    d = jnp.where(cand < 0, jnp.inf, d)
    d = jnp.where(cand == self_ids, 0.0, d)
    state, _ = merge_candidates(state, cand, d)
    return state


def init_from_leaf_array(state: NeighborState, X, leaf_array, dist_rowwise, block_rows=512):
    """Seed the graph from RP-forest leaves: every point merges distances to
    its leaf-mates (reference: init_rp_tree / generate_leaf_updates,
    pynndescent_.py:73-185 — reshaped from leaf-pair scatters to row-local
    merges over a [n, trees * leaf_size] co-member table)."""
    n = X.shape[0]
    # leaf_array: [n_leaves, leaf_max] padded with -1. Build per-point list of
    # leaf-mates by inverting: point -> (tree leaf row). Each point appears in
    # at most n_trees leaves.
    leaf_array = jnp.asarray(leaf_array, jnp.int32)
    n_leaves, leaf_max = leaf_array.shape
    # membership[point, t] = leaf row containing point in tree t; build by scatter.
    flat = leaf_array.reshape(-1)
    rows = jnp.repeat(jnp.arange(n_leaves, dtype=jnp.int32), leaf_max)
    # Count how many leaves each point belongs to (== n_trees, but padded):
    # scatter leaf-row ids into per-point slots via a cumulative-slot trick.
    # Simpler: for every leaf, all members are candidates of all members.
    # Process leaf blocks and merge rows via slot-reservoir staging, or just
    # expand to per-point candidate table when n_trees is small:
    # order points by leaf and use the leaf rows directly.
    # Per-point table: [n, max_membership * leaf_max] would be large; instead
    # iterate leaves blockwise, each pass merging leaf members' rows.
    lb = min(block_rows, n_leaves)
    n_blocks = -(-n_leaves // lb)

    def body(blk, st):
        start = jnp.minimum(blk * lb, n_leaves - lb)
        leaves = jax.lax.dynamic_slice_in_dim(leaf_array, start, lb)  # [lb, L]
        members = jnp.maximum(leaves, 0)
        V = X[members]  # [lb, L, d]
        # pairwise within leaf: [lb, L, L]
        D = _leaf_pairwise(V, dist_rowwise)
        valid = leaves >= 0
        pair_ok = valid[:, :, None] & valid[:, None, :]
        eye = jnp.eye(leaf_max, dtype=bool)
        D = jnp.where(pair_ok & ~eye, D, jnp.inf)
        cand_idx = jnp.broadcast_to(leaves[:, None, :], D.shape)
        cand_idx = jnp.where(jnp.isfinite(D), cand_idx, -1)
        # merge member rows: flatten leaf block to rows
        tgt = members.reshape(-1)  # [lb*L]
        ci = cand_idx.reshape(lb * leaf_max, leaf_max)
        cd = D.reshape(lb * leaf_max, leaf_max)
        # gather target rows, merge, scatter back (duplicate targets across
        # different leaves in the same block are rare; collisions lose one
        # leaf's contribution for that point in this block only — later
        # blocks/iterations recover it).
        row_state = NeighborState(st.idx[tgt], st.dist[tgt], st.flag[tgt])
        merged, _ = merge_candidates(row_state, ci, cd)
        ok = (jax.lax.dynamic_slice_in_dim(leaf_array, start, lb).reshape(-1)) >= 0
        tgt_safe = jnp.where(ok, tgt, n)
        idx_new = jnp.zeros((n + 1, st.idx.shape[1]), st.idx.dtype).at[tgt_safe].set(merged.idx)[:n]
        dist_new = jnp.zeros((n + 1, st.dist.shape[1]), st.dist.dtype).at[tgt_safe].set(merged.dist)[:n]
        flag_new = jnp.zeros((n + 1, st.flag.shape[1]), st.flag.dtype).at[tgt_safe].set(merged.flag)[:n]
        written = jnp.zeros((n + 1,), bool).at[tgt_safe].set(True)[:n]
        return NeighborState(
            jnp.where(written[:, None], idx_new, st.idx),
            jnp.where(written[:, None], dist_new, st.dist),
            jnp.where(written[:, None], flag_new, st.flag),
        )

    return jax.lax.fori_loop(0, n_blocks, body, state)


def _leaf_pairwise(V, dist_rowwise):
    """All-pairs distances within each leaf tile: V [lb, L, d] -> [lb, L, L]."""
    lb, L, d = V.shape
    Q = V.reshape(lb * L, d)
    C = jnp.broadcast_to(V[:, None, :, :], (lb, L, L, d)).reshape(lb * L, L, d)
    return dist_rowwise(Q, C).reshape(lb, L, L)


def nn_descent(
    X,
    n_neighbors: int,
    key,
    *,
    metric="euclidean",
    metric_kwds=None,
    n_iters: int | None = None,
    delta: float = 0.001,
    max_candidates: int | None = None,
    init_graph: NeighborState | None = None,
    leaf_array=None,
    rp_tree_init: bool = True,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    hop2_new_samples: int | None = None,
    hop2_old_samples: int | None = None,
    verbose: bool = False,
):
    """Full NN-descent driver (reference: nn_descent, pynndescent_.py:324).

    Returns (indices i32[n, k], distances f32[n, k]) sorted ascending.
    """
    X = jnp.asarray(X)
    n = X.shape[0]
    k = n_neighbors
    if n_iters is None:
        n_iters = max(5, int(round(np.log2(max(n, 2)))))
    if max_candidates is None:
        max_candidates = min(60, n_neighbors)
    # two-hop budget: expanding ~max_candidates entries of each hop's table
    # matches the reference local join's O(c^2)-pairs-per-row exploration
    if hop2_new_samples is None:
        hop2_new_samples = max_candidates
    if hop2_old_samples is None:
        hop2_old_samples = max(1, max_candidates // 2)

    dist_rowwise = _resolve_rowwise_metric(metric, metric_kwds)

    state = init_graph if init_graph is not None else make_neighbor_state(n, k)
    if leaf_array is not None and rp_tree_init:
        leaf_array = np.asarray(leaf_array)
        if leaf_array.ndim == 2:
            leaf_array = leaf_array[None]
        leaf_init = jax.jit(
            lambda st, la: init_from_leaf_array(st, X, la, dist_rowwise)
        )
        for t in range(leaf_array.shape[0]):  # one compile, reused per tree
            state = leaf_init(state, jnp.asarray(leaf_array[t]))
    state = init_random(
        state, X, rng.derive(key, rng.ROLE_DESCENT_INIT), n_extra=k, dist_rowwise=dist_rowwise
    )

    iteration = jax.jit(
        functools.partial(
            _descent_iteration,
            max_candidates=max_candidates,
            dist_rowwise=dist_rowwise,
            block_rows=block_rows,
            hop2_new_samples=hop2_new_samples,
            hop2_old_samples=hop2_old_samples,
        )
    )

    stop_count = delta * k * n
    for it in range(n_iters):
        state, changes = iteration(state, X, rng.derive(key, rng.ROLE_DESCENT_ITER, it))
        if verbose:
            print(f"\t{it + 1}  /  {n_iters}  (changes: {int(changes)})")
        if int(changes) <= stop_count:
            if verbose:
                print(f"\tStopping threshold met -- exiting after {it + 1} iterations")
            break

    idx, dist = sort_by_distance(state.idx, state.dist)
    return idx, dist
