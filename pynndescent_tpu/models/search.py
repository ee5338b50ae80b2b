"""Epsilon-bounded graph search — lockstep batched beam formulation.

Capability parity with the reference's compiled search closures
(``pynndescent_.py:1664-2143``): tree-descent seeding, random fill, and a
best-first traversal of the diversified search graph with the adaptive bound
``d_k + epsilon * (d_k - min_distance)`` (reference :1850-1852, :1873-1875).

TPU shape: the reference expands one vertex at a time per query from a
``heapq`` seed set with a per-point visited bitmask. Here a whole *batch* of
queries steps in lockstep:

* per-query state is one sorted array of ``beam_width`` (distance, id,
  unexpanded) entries — the result top-k and the seed set unified;
* each step every active query expands its best unexpanded vertex: one
  gather of the padded adjacency row, one batched distance tile against the
  queries, one sort-dedup-topk merge back into the beam;
* the merge's duplicate suppression doubles as the visited set — a vertex
  already in the beam is never re-inserted, so never re-expanded. (A vertex
  evicted from the beam can be revisited — wasted work, never wrong results.)

``lax.while_loop`` runs until no query has an unexpanded entry under its
bound, with per-query masking — exactly the reference's stopping rule, in
lockstep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops.neighbors import NeighborState, make_neighbor_state, merge_candidates
from pynndescent_tpu.ops.rp_trees import descend_tree


def _bound(dist_k, epsilon, min_distance):
    return dist_k + epsilon * (dist_k - min_distance)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "beam_width", "dist_rowwise", "max_steps", "leaf_max",
        "tree_depth", "tree_angular", "expansions_per_step", "ell",
    ),
)
def search_block(
    queries,  # [q, d] (already normalized/encoded if required)
    X,  # [n, d] candidate data (float rows, or quantized codes)
    adj,  # [n, deg_max] padded search-graph adjacency, -1 padding
    tree,  # dict of flat-tree arrays (or None)
    key,
    tree_queries=None,  # float queries for tree descent (defaults to queries)
    *,
    k: int,
    epsilon: float,
    min_distance: float,
    beam_width: int,
    dist_rowwise,
    max_steps: int,
    leaf_max: int,
    tree_depth: int,
    tree_angular: bool = False,
    # the operative default is 2, set by the search() driver below — every
    # recall floor in tests/ was tuned at E=2; keep the two in sync
    expansions_per_step: int = 2,
    ell: tuple | None = None,  # (query nnz, data nnz) for packed-ELL rows
):
    q = queries.shape[0]
    n = X.shape[0]
    k_coin, k_rand = jax.random.split(key)

    # ---- seed: tree leaf members + random fill (reference :1821-1847) ----
    cands = []
    if tree is not None:
        coins = jax.random.bits(k_coin, (q,), jnp.uint32)
        tq = queries if tree_queries is None else tree_queries
        lo, hi = descend_tree(tree, X, tq, coins, tree_depth, tree_angular, ell=ell)
        offs = lo[:, None] + jnp.arange(leaf_max, dtype=jnp.int32)[None, :]
        seed_ids = jnp.where(
            offs < hi[:, None], tree["tree_order"][jnp.minimum(offs, n - 1)], -1
        )
        cands.append(seed_ids)
    rand_ids = jax.random.randint(k_rand, (q, k), 0, n, dtype=jnp.int32)
    cands.append(rand_ids)
    cand = jnp.concatenate(cands, axis=-1)

    d = dist_rowwise(queries, X[jnp.maximum(cand, 0)])
    d = jnp.where(cand < 0, jnp.inf, d)

    state = make_neighbor_state(q, beam_width)
    state, _ = merge_candidates(state, cand, d)  # inserted flag=True: unexpanded

    rows = jnp.arange(q, dtype=jnp.int32)

    def get_bound(st):
        return _bound(st.dist[:, k - 1], epsilon, min_distance)

    def cond(carry):
        st, steps = carry
        bound = get_bound(st)
        active = st.flag & (st.dist < bound[:, None])
        return jnp.any(active) & (steps < max_steps)

    E = expansions_per_step

    def body(carry):
        # expand the E best unexpanded vertices of each query per step: one
        # bigger gather+distance tile and one merge amortize the per-step
        # sort cost E-fold (the reference expands 1 vertex per heappop;
        # multi-expansion changes visit order but not the stopping rule)
        st, steps = carry
        bound = get_bound(st)
        masked = jnp.where(st.flag, st.dist, jnp.inf)
        if E == 1:
            pos = jnp.argmin(masked, axis=1)[:, None]
            vdist = jnp.take_along_axis(masked, pos, axis=1)
        else:
            neg, pos = jax.lax.top_k(-masked, E)  # [q, E] best unexpanded
            vdist = -neg
        do = vdist < bound[:, None]  # [q, E]
        v = jnp.where(do, jnp.take_along_axis(st.idx, pos, axis=1), 0)
        old_flags = jnp.take_along_axis(st.flag, pos, axis=1)
        flag = st.flag.at[rows[:, None], pos].set(
            jnp.where(do, False, old_flags), unique_indices=True
        )
        st = st._replace(flag=flag)

        nbrs = adj[v].reshape(v.shape[0], -1)  # [q, E*deg_max]
        nbrs = jnp.where(jnp.repeat(do, adj.shape[1], axis=1), nbrs, -1)
        nd = dist_rowwise(queries, X[jnp.maximum(nbrs, 0)])
        nd = jnp.where(nbrs < 0, jnp.inf, nd)
        st, _ = merge_candidates(st, nbrs, nd)
        return st, steps + 1

    state, steps = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state.idx[:, :k], state.dist[:, :k], steps


def search(
    queries,
    X,
    adj,
    tree,
    key,
    *,
    k: int,
    epsilon: float = 0.1,
    min_distance: float = 0.0,
    beam_width: int | None = None,
    dist_rowwise=None,
    max_steps: int | None = None,
    batch_size: int = 8192,
    tree_queries=None,
    expansions_per_step: int = 2,
    ell: tuple | None = None,
    return_device: bool = False,
    _return_steps: bool = False,
):
    """Batched driver over query blocks (pads the final block so one compiled
    program serves any query count). With ``return_device=True`` results stay
    on device (callers that rerank avoid a host round-trip — significant on
    tunneled devices). ``_return_steps`` additionally returns the max
    while-loop step count over the batches (diagnostics)."""
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    if beam_width is None:
        beam_width = max(2 * k, 48)
    beam_width = max(beam_width, k)
    if max_steps is None:
        max_steps = int(X.shape[0])
    leaf_max = 0
    tree_depth = 0
    tree_dev = None
    if tree is not None:
        tree_depth = int(tree["depth"])
        # seed-window width must be a pure function of configuration, not of
        # the data (a data-dependent static arg would recompile the search
        # program for every index); oversized leaves contribute their first
        # leaf_max members only
        cfg_leaf = int(tree.get("leaf_size", 0))
        if cfg_leaf > 0:
            leaf_max = min(-(-2 * cfg_leaf // 64) * 64, int(np.asarray(tree["tree_order"]).shape[0]))
        else:
            leaf_max = int(np.max(np.asarray(tree["leaf_hi"]) - np.asarray(tree["leaf_lo"])))
        # node-array lengths are data-dependent; pad to a power-of-two bucket
        # so the compiled search program is reused across indexes
        n_nodes = int(np.asarray(tree["a_pt"]).shape[0])
        bucket = max(256, 1 << (n_nodes - 1).bit_length())
        pad = bucket - n_nodes

        def _pad_nodes(name, vv):
            a = np.asarray(vv)
            if name in ("a_pt", "b_pt", "child", "leaf_lo", "leaf_hi", "hyper", "offset") and pad:
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, widths)
            return jnp.asarray(a)

        tree_dev = {
            kk: _pad_nodes(kk, vv)
            for kk, vv in tree.items()
            if kk not in ("depth", "angular", "leaf_size")
        }

    if tree_queries is not None:
        tree_queries = jnp.asarray(tree_queries)
    out_idx, out_dist = [], []
    max_blk_steps = 0
    # batching: per-step cost is nearly batch-size independent (steps/batch
    # ~35 at 2048 and at 8192, diag_1m_qprof), so a serial tail batch costs
    # almost a full extra while_loop. Up to 2x batch_size, serve everything
    # as ONE padded block (2048-multiple padding bounds compile variants);
    # beyond that, full batches + power-of-two tail buckets.
    spans = []
    if nq == batch_size:
        # caller already sized the block (e.g. parallel.mesh.sharded_search
        # passes pre-padded mesh-sharded chunks whose row count keeps the
        # query axis evenly sharded — rounding it up would reshard the batch)
        spans.append((0, nq, nq))
    elif nq <= min(2 * batch_size, 16384):
        b = (
            max(256, 1 << (nq - 1).bit_length())
            if nq <= 2048
            else -(-nq // 2048) * 2048
        )
        spans.append((0, nq, b))
    else:
        pos = 0
        while nq - pos >= batch_size:
            spans.append((pos, pos + batch_size, batch_size))
            pos += batch_size
        rest = nq - pos
        while rest > 0:
            b = min(batch_size, max(256, 1 << (rest - 1).bit_length()))
            take = min(rest, b)
            spans.append((pos, pos + take, b))
            pos += take
            rest -= take
    for s, e, b in spans:
        blk = queries[s:e]
        tblk = tree_queries[s:e] if tree_queries is not None else None
        if e - s < b:
            blk = jnp.pad(blk, ((0, b - (e - s)), (0, 0)))
            if tblk is not None:
                tblk = jnp.pad(tblk, ((0, b - (e - s)), (0, 0)))
        idx, dist, blk_steps = search_block(
            blk,
            X,
            adj,
            tree_dev,
            jax.random.fold_in(key, s),
            tree_queries=tblk,
            k=k,
            epsilon=epsilon,
            min_distance=float(min_distance),
            beam_width=int(beam_width),
            dist_rowwise=dist_rowwise,
            max_steps=int(max_steps),
            leaf_max=leaf_max,
            tree_depth=tree_depth,
            tree_angular=bool(tree["angular"]) if tree is not None else False,
            expansions_per_step=int(expansions_per_step),
            ell=ell,
        )
        if _return_steps:
            max_blk_steps = max(max_blk_steps, int(blk_steps))
        if return_device:
            out_idx.append(idx[: e - s])
            out_dist.append(dist[: e - s])
        else:
            out_idx.append(np.asarray(idx)[: e - s])
            out_dist.append(np.asarray(dist)[: e - s])
    if return_device and len(out_idx) == 1:
        ri, rd = out_idx[0], out_dist[0]
    elif return_device:
        ri, rd = jnp.concatenate(out_idx, 0), jnp.concatenate(out_dist, 0)
    else:
        ri, rd = np.concatenate(out_idx, 0), np.concatenate(out_dist, 0)
    if _return_steps:
        return ri, rd, max_blk_steps
    return ri, rd
