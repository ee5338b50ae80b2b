"""Random-projection trees — level-synchronous, TPU-native construction.

Capability parity with the reference's RP-forest layer (``rp_trees.py``:
random euclidean/angular splits :323/:60, recursive builders :2173-2641,
forest orchestration :2815, leaf arrays :2918) with a completely different
construction shape:

The reference builds each tree by *recursion*, one node at a time, splitting a
typed-list of point indices. Here a whole tree is built **level by level with
no recursion and no per-node control flow**, using a node-location encoding
(the idea sketched in the reference's vestigial ``threaded_rp_trees.py:6-9``
but taken to its TPU-native conclusion):

* points live in a permutation ``order[n]`` where every tree node owns a
  contiguous slice; each *position* carries its node's ``(start, size)``;
* the two random split points of a node are chosen by a counter-based integer
  hash of ``(seed, level, start)`` — every member of a node derives the same
  choice with zero communication;
* one fused pass computes all margins for all nodes at a level (gather the
  two anchor points, elementwise dot on the VPU), and a segmented
  cumulative-sum partitions every node in place.

A whole forest is ``vmap`` of this over per-tree seeds. Degenerate splits
(all points on one side — duplicates/zero vectors) fall back to random side
assignment exactly like the reference (rp_trees.py:144-155), which also
bounds the depth at ~log2(n/leaf_size) + slack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Reference default: leaf_size = max(60, min(256, 5*k)) (rp_trees.py:2845)


def default_leaf_size(n_neighbors: int) -> int:
    return max(60, min(256, 5 * n_neighbors))


def default_n_trees(n: int) -> int:
    # reference: max(3, min(12, round(2 * log10(n)))) (pynndescent_.py:1009)
    return max(3, min(12, int(round(2.0 * np.log10(max(n, 10))))))


def forest_depth(n: int, leaf_size: int) -> int:
    return int(np.ceil(np.log2(max(n / max(leaf_size, 1), 1.0)))) + 8


# ---------------------------------------------------------------------------
# Counter-based integer hashing (per-node / per-point randomness)
# ---------------------------------------------------------------------------


def _mix(h):
    """splitmix-style 32-bit finalizer."""
    h = jnp.uint32(h)
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _hash3(a, b, c):
    h = (
        jnp.uint32(a) * jnp.uint32(0x9E3779B9)
        + jnp.uint32(b) * jnp.uint32(0x85EBCA6B)
        + jnp.uint32(c) * jnp.uint32(0xC2B2AE35)
    )
    return _mix(h)


def _hash_mod(a, b, c, mod):
    """Hash of (a, b, c) reduced into [0, mod) (mod must be >= 1)."""
    return (_hash3(a, b, c) % jnp.uint32(jnp.maximum(mod, 1))).astype(jnp.int32)


# ---------------------------------------------------------------------------
# One level of splits, all nodes at once
# ---------------------------------------------------------------------------


def _segment_cumsum_stats(values, start, size):
    """For per-position int values inside contiguous node slices, return
    (prefix_within_node_exclusive, total_within_node)."""
    cum = jnp.cumsum(values)  # inclusive
    before_node = jnp.where(start > 0, cum[jnp.maximum(start - 1, 0)], 0)
    node_end = start + size - 1
    total = cum[node_end] - before_node
    prefix_excl = cum - values - before_node
    return prefix_excl, total


def _split_level(X, norms, order, start, size, level, seed, leaf_size, angular):
    """Split every active node at one level. Returns updated (order, start, size)."""
    n = X.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    done = size <= leaf_size

    # --- choose two distinct random anchor offsets per node (shared by all
    # members via the (seed, level, start) hash) -----------------------------
    a_off = _hash_mod(seed, jnp.uint32(level * 2 + 1), start.astype(jnp.uint32), size)
    b_off = _hash_mod(seed, jnp.uint32(level * 2 + 2), start.astype(jnp.uint32), jnp.maximum(size - 1, 1))
    b_off = jnp.where(b_off >= a_off, b_off + 1, b_off)
    b_off = jnp.minimum(b_off, size - 1)

    a_pt = order[jnp.clip(start + a_off, 0, n - 1)]
    b_pt = order[jnp.clip(start + b_off, 0, n - 1)]
    xa = X[a_pt]
    xb = X[b_pt]
    x = X[order]

    if angular:
        na = jnp.maximum(norms[a_pt], 1e-8)[:, None]
        nb = jnp.maximum(norms[b_pt], 1e-8)[:, None]
        hyper = xa / na - xb / nb
        margin = jnp.sum(x * hyper, axis=-1)
    else:
        hyper = xa - xb
        offset = jnp.sum(hyper * (xa + xb) * 0.5, axis=-1)
        margin = jnp.sum(x * hyper, axis=-1) - offset

    # tie -> per-point coin flip (reference rp_trees.py:131-143)
    coin = (_hash3(seed, jnp.uint32(level), order.astype(jnp.uint32)) & 1).astype(bool)
    side = jnp.where(margin > 0, True, jnp.where(margin < 0, False, coin))

    # --- degenerate split: everything on one side -> random assignment ------
    is_left = (~side).astype(jnp.int32)
    _, n_left = _segment_cumsum_stats(is_left, start, size)
    degenerate = (~done) & ((n_left == 0) | (n_left == size))
    side = jnp.where(degenerate, coin, side)

    side = jnp.where(done, False, side)
    is_left = (~side).astype(jnp.int32)
    rank_left, n_left = _segment_cumsum_stats(is_left, start, size)
    rank_right = (pos - start) - rank_left

    new_pos = jnp.where(side, start + n_left + rank_right, start + rank_left)
    new_pos = jnp.where(done, pos, new_pos)
    new_start = jnp.where(done, start, jnp.where(side, start + n_left, start))
    new_size = jnp.where(done, size, jnp.where(side, size - n_left, n_left))

    order = jnp.zeros_like(order).at[new_pos].set(order)
    out_start = jnp.zeros_like(start).at[new_pos].set(new_start)
    out_size = jnp.zeros_like(size).at[new_pos].set(new_size)
    return order, out_start, out_size


@functools.partial(jax.jit, static_argnames=("leaf_size", "max_depth", "angular"))
def build_tree_order(X, seed, leaf_size: int, max_depth: int, angular: bool = False):
    """Build one RP tree, returning the node-location encoding:

    order i32[n] — point ids grouped so every leaf is a contiguous slice
    start i32[n] — per position, the first position of its leaf slice
    size  i32[n] — per position, its leaf's member count

    (Replaces the reference's recursive make_*_tree, rp_trees.py:2173-2641.)
    """
    n = X.shape[0]
    norms = jnp.linalg.norm(X, axis=-1) if angular else jnp.zeros((n,), X.dtype)
    order = jnp.arange(n, dtype=jnp.int32)
    start = jnp.zeros(n, jnp.int32)
    size = jnp.full(n, n, jnp.int32)

    def body(level, carry):
        order, start, size = carry
        return _split_level(X, norms, order, start, size, level, seed, leaf_size, angular)

    order, start, size = jax.lax.fori_loop(0, max_depth, body, (order, start, size))
    return order, start, size


def build_forest_orders(X, seeds, leaf_size: int, max_depth: int, angular: bool = False):
    """vmap tree construction over per-tree seeds -> [n_trees, n] encodings
    (replaces joblib-thread forest orchestration, rp_trees.py:2815-2880)."""
    fn = functools.partial(
        build_tree_order, X, leaf_size=leaf_size, max_depth=max_depth, angular=angular
    )
    return jax.vmap(fn)(jnp.asarray(seeds, jnp.uint32))


def leaf_arrays_from_order(order, start, size):
    """Host-side extraction of the padded leaf matrix [n_leaves, leaf_max]
    from one tree's node-location encoding (replaces rptree_leaf_array,
    rp_trees.py:2918)."""
    order = np.asarray(order)
    start = np.asarray(start)
    size = np.asarray(size)
    n = order.shape[0]
    heads = np.nonzero(np.arange(n) == start)[0]
    leaf_sizes = size[heads]
    leaf_max = int(leaf_sizes.max()) if len(leaf_sizes) else 0
    leaves = np.full((len(heads), leaf_max), -1, np.int32)
    for li, (h, s) in enumerate(zip(heads, leaf_sizes)):
        leaves[li, :s] = order[h : h + s]
    return leaves


def make_forest_leaves(X, n_trees, leaf_size, key, angular=False, max_depth=None):
    """Build the forest and return a list of per-tree padded leaf matrices.

    The device does all the splitting work; the host only slices out leaf
    boundaries (cheap, O(n) per tree).
    """
    import jax.random as jrandom

    n = X.shape[0]
    if max_depth is None:
        max_depth = forest_depth(n, leaf_size)
    seeds = jrandom.randint(key, (n_trees,), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
    seeds = jnp.asarray(seeds, jnp.uint32)
    orders, starts, sizes = build_forest_orders(X, seeds, leaf_size, max_depth, angular)
    orders, starts, sizes = jax.device_get((orders, starts, sizes))
    per_tree = [
        leaf_arrays_from_order(orders[t], starts[t], sizes[t]) for t in range(len(seeds))
    ]
    # pad to a single [n_trees, n_leaves_max, leaf_max] block so downstream
    # jitted leaf-init compiles once for the whole forest
    n_leaves_max = max(la.shape[0] for la in per_tree)
    leaf_max = max(la.shape[1] for la in per_tree)
    forest = np.full((len(per_tree), n_leaves_max, leaf_max), -1, np.int32)
    for t, la in enumerate(per_tree):
        forest[t, : la.shape[0], : la.shape[1]] = la
    return forest
