"""Multi-device scale-out: shard the point set over a device mesh.

The reference's only parallelism is shared-memory CPU threading with
owner-computes vertex blocks (SURVEY §2.2; reference utils.py:706-731).
The TPU-native equivalents implemented here map each reference thread
pattern onto a mesh collective:

| reference thread pattern | TPU mapping here |
|---|---|
| owner-computes vertex blocks (utils.py:706-731) | neighbor state sharded along vertices over the ``data`` axis (``sharded_nn_descent``); XLA partitions the row-blocked iteration so each device updates its shard |
| "every thread scans all updates" reverse pass (utils.py:259-306) | the reverse-sampling segmented sort / scatter runs under the SPMD partitioner, which inserts the cross-shard all-to-all |
| per-thread preallocated update buffers (pynndescent_.py:283-294) | fixed-shape per-row candidate pools — no buffers needed |
| joblib tree-per-thread forest build (rp_trees.py:2853) | trees vmapped on device; forest arrays replicated |
| parallel_batch_queries (pynndescent_.py:1791) | query batch sharded over the mesh (``sharded_search``) |
| — (no reference analog: data larger than one machine) | ``shard_data=True``: X row-sharded, candidate point blocks ride an ICI ring (ppermute) through every shard per join tile (``_ring_gather_rows``) |

Vertex counts that do not divide the mesh are handled by padding the
*neighbor state* (never the data): pad rows merge nothing, bid nothing, and
are sliced off the result.

Given the PRNG key the computation is deterministic per executable; the
sharded SPMD executable may differ from the single-device one by float
reduction order (ulp-level distance differences can flip near-tied k-th
neighbors), so the test tier asserts *statistical equivalence* — matching
neighbor overlap and k-th distances — rather than bit identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops import rp_trees
from pynndescent_tpu.ops.neighbors import (
    NeighborState,
    make_neighbor_state,
    merge_candidates,
    sort_by_distance,
)
from pynndescent_tpu.utils import rng


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(shape: tuple[int, int], axis_names: tuple[str, str] = ("dcn", "data")) -> Mesh:
    """2-D mesh: a coarse outer axis (DCN-style, across slices) times the
    fast inner axis (ICI, within a slice). The build shards vertices over the
    inner axis and replicates over the outer; serving shards queries over the
    outer axis — the cross-slice axis never carries per-iteration traffic."""
    devices = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devices, axis_names)


def _data_axis(mesh: Mesh, axis_name: str) -> str:
    if axis_name in mesh.axis_names:
        return axis_name
    return mesh.axis_names[-1]


def sharded_nn_descent(
    X,
    n_neighbors: int,
    key,
    mesh: Mesh,
    *,
    metric="euclidean",
    metric_kwds=None,
    n_iters: int | None = None,
    delta: float = 0.001,
    max_candidates: int | None = None,
    forest=None,
    leaf_cap: int = 64,
    block_rows: int | None = None,
    axis_name: str = "data",
    shard_data: bool = False,
):
    """NN-descent with vertex-sharded state over ``mesh``.

    Returns (indices, distances) like ops.nndescent.nn_descent. Results are
    statistically equivalent to the single-device build for the same key
    (identical sampling; ulp-level float differences may flip near-ties).

    ``shard_data=True`` additionally shards X's rows over the mesh —
    the >per-device-HBM regime — and streams candidate point blocks around
    the ICI ring per join tile (see ``_sharded_data_nn_descent``).
    """
    if shard_data:
        return _sharded_data_nn_descent(
            X, n_neighbors, key, mesh,
            metric=metric, metric_kwds=metric_kwds, n_iters=n_iters,
            delta=delta, max_candidates=max_candidates, forest=forest,
            leaf_cap=leaf_cap, block_rows=block_rows, axis_name=axis_name,
        )
    X = jnp.asarray(X)
    n = X.shape[0]
    k = n_neighbors
    axis_name = _data_axis(mesh, axis_name)
    n_dev = mesh.shape[axis_name]
    # pad the neighbor STATE (not the data) up to mesh divisibility: pad rows
    # start empty, merge nothing (ops mask rows >= n), and are sliced off
    n_pad = -(-n // n_dev) * n_dev
    if n_iters is None:
        n_iters = max(5, int(round(np.log2(max(n, 2)))))
    if max_candidates is None:
        max_candidates = min(60, n_neighbors)
    if block_rows is None:
        block_rows = min(nnd_ops.DEFAULT_BLOCK_ROWS, n_pad)

    row_sharding = NamedSharding(mesh, P(axis_name, None))
    replicated = NamedSharding(mesh, P())

    X = jax.device_put(X, replicated)
    if forest is not None:
        forest = tuple(jax.device_put(jnp.asarray(f), replicated) for f in forest)

    dist_rowwise = nnd_ops._resolve_rowwise_metric(metric, metric_kwds)
    iteration = functools.partial(
        nnd_ops._descent_iteration,
        max_candidates=max_candidates,
        dist_rowwise=dist_rowwise,
        block_rows=min(block_rows, n_pad),
        hop2_new_samples=max_candidates,
        hop2_old_samples=max(1, max_candidates // 2),
    )
    stop_count = jnp.float32(delta * k * n)

    def constrain(state):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, row_sharding), state
        )

    @functools.partial(jax.jit, static_argnames=("has_forest",))
    def _build(X, forest, key, has_forest):
        state = constrain(make_neighbor_state(n_pad, k))
        if has_forest:
            orders, starts, sizes = forest

            def tree_body(t, st):
                st = nnd_ops.init_from_tree_order(
                    st, X, orders[t], starts[t], sizes[t],
                    dist_rowwise=dist_rowwise, leaf_cap=leaf_cap,
                )
                return constrain(st)

            state = jax.lax.fori_loop(0, orders.shape[0], tree_body, state)
        state = constrain(
            nnd_ops.init_random(
                state, X, rng.derive(key, rng.ROLE_DESCENT_INIT),
                n_extra=k, dist_rowwise=dist_rowwise,
            )
        )

        def cond(carry):
            st, it, changes = carry
            return (it < n_iters) & (changes > stop_count)

        def body(carry):
            st, it, _ = carry
            st, ch = iteration(st, X, rng.derive(key, rng.ROLE_DESCENT_ITER, it))
            return constrain(st), it + 1, ch.astype(jnp.float32)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), jnp.float32(np.inf))
        )
        return sort_by_distance(state.idx, state.dist)

    if forest is not None:
        idx, dist = _build(X, forest, key, has_forest=True)
    else:
        idx, dist = _build(X, None, key, has_forest=False)
    return idx[:n], dist[:n]


# ---------------------------------------------------------------------------
# Sharded-X build (>per-device-HBM datasets)
# ---------------------------------------------------------------------------


def _ring_gather_rows(X_shard, ids, axis_name, n_dev, shard_size):
    """Gather global rows ``ids`` from a row-sharded X by circulating the
    shards around the ring (ppermute): per step, each device picks out the
    ids the visiting shard owns. Communication is the X shards themselves —
    independent of how many rows are requested — and only one visiting shard
    is materialised at a time (the >HBM property)."""
    me = jax.lax.axis_index(axis_name)
    out = jnp.zeros(ids.shape + (X_shard.shape[-1],), X_shard.dtype)

    def step(s, carry):
        out, Xs = carry
        src = (me + s) % n_dev  # owner of the shard currently held
        local = ids - src * shard_size
        hit = (local >= 0) & (local < shard_size)
        rows = Xs[jnp.clip(local, 0, shard_size - 1)]
        out = jnp.where(hit[..., None], rows, out)
        Xs = jax.lax.ppermute(
            Xs, axis_name, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        return out, Xs

    out, _ = jax.lax.fori_loop(0, n_dev, step, (out, X_shard))
    return out


def _sharded_data_nn_descent(
    X,
    n_neighbors: int,
    key,
    mesh: Mesh,
    *,
    metric="euclidean",
    metric_kwds=None,
    n_iters: int | None = None,
    delta: float = 0.001,
    max_candidates: int | None = None,
    forest=None,
    leaf_cap: int = 64,
    block_rows: int | None = None,
    axis_name: str = "data",
):
    """NN-descent with X row-sharded over the mesh (shard_map + explicit
    collectives). The small per-vertex structures (neighbor state, candidate
    tables — O(n·k), independent of d) are replicated; every gather of point
    rows goes through the ICI ring. Per-device distance work is the full
    pool (the ring visits every shard), but peak memory is
    ``n·d/n_dev + O(n·k)`` — the regime the reference cannot reach at all.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    X = jnp.asarray(X)
    n, d = X.shape
    k = n_neighbors
    axis_name = _data_axis(mesh, axis_name)
    n_dev = mesh.shape[axis_name]
    if n % n_dev != 0:
        # pad X with zero rows; the state is padded to match and pad rows are
        # masked inside the ops (they merge nothing)
        n_pad = -(-n // n_dev) * n_dev
        X = jnp.concatenate([X, jnp.zeros((n_pad - n, d), X.dtype)], axis=0)
    n_pad = X.shape[0]
    shard_size = n_pad // n_dev
    if n_iters is None:
        n_iters = max(5, int(round(np.log2(max(n, 2)))))
    if max_candidates is None:
        max_candidates = min(60, n_neighbors)
    if block_rows is None:
        block_rows = min(nnd_ops.DEFAULT_BLOCK_ROWS, shard_size)
    b = min(block_rows, shard_size)

    dist_rowwise = nnd_ops._resolve_rowwise_metric(metric, metric_kwds)
    # pad rows must never win a merge: they sit at the origin, so mask by id
    n_real = n

    x_sharding = NamedSharding(mesh, P(*([None] * (len(mesh.axis_names) - 1)), None))
    spec_x = P(axis_name, None)
    spec_rep = P()

    def mask_pool(pool):
        return jnp.where(pool < n_real, pool, -1)

    def ring(X_shard, ids):
        return _ring_gather_rows(X_shard, ids, axis_name, n_dev, shard_size)

    def shard_rows(me):
        return me * shard_size + jnp.arange(shard_size, dtype=jnp.int32)

    def tree_init_shard(X_shard, state, order, start, size, key):
        """Leaf-window init for MY vertex shard (tree positions are global;
        each device handles the positions whose points it owns... positions
        are arbitrary, so each device takes an equal contiguous slab of
        positions and merges into the state rows of those points, which is a
        cross-shard scatter — instead, each device processes the slab and
        the merged rows are combined by a global minimum-merge (psum-style
        union below)."""
        me = jax.lax.axis_index(axis_name)
        offsets = jnp.arange(leaf_cap, dtype=jnp.int32)
        n_blocks = -(-shard_size // b)

        def body(blk, st):
            s0 = me * shard_size + jnp.minimum(blk * b, shard_size - b)
            pos = s0 + jnp.arange(b, dtype=jnp.int32)
            pts = order[pos]
            lstart = start[pos]
            lsize = size[pos]
            win = lstart[:, None] + offsets[None, :]
            cand = order[jnp.minimum(win, n_pad - 1)]
            cand = jnp.where(
                offsets[None, :] < jnp.minimum(lsize, leaf_cap)[:, None], cand, -1
            )
            cand = mask_pool(cand)
            cand = jnp.where(pts[:, None] < n_real, cand, -1)
            Q = ring(X_shard, jnp.minimum(pts, n_real - 1))
            C = ring(X_shard, jnp.maximum(cand, 0))
            dmat = dist_rowwise(Q, C)
            dmat = jnp.where(cand < 0, jnp.inf, dmat)
            row_state = NeighborState(st.idx[pts], st.dist[pts], st.flag[pts])
            merged, _ = merge_candidates(row_state, cand, dmat)
            return NeighborState(
                st.idx.at[pts].set(merged.idx, unique_indices=True),
                st.dist.at[pts].set(merged.dist, unique_indices=True),
                st.flag.at[pts].set(merged.flag, unique_indices=True),
            )

        st = jax.lax.fori_loop(0, n_blocks, body, state)
        # devices touched disjoint position slabs but possibly overlapping
        # final-block rows; merge all devices' states by keeping, per row,
        # the union's best k (an all-gather + merge = the all-to-all update
        # exchange of SURVEY §5 in its simplest correct form)
        return _merge_replicated_states(st, state)

    def _merge_replicated_states(st, base):
        all_idx = jax.lax.all_gather(st.idx, axis_name)  # [n_dev, n_pad, k]
        all_dist = jax.lax.all_gather(st.dist, axis_name)
        all_flag = jax.lax.all_gather(st.flag, axis_name)
        merged = base
        for dev in range(n_dev):
            cand_idx = jnp.where(all_flag[dev] | (all_idx[dev] >= 0), all_idx[dev], -1)
            merged, _ = merge_candidates(merged, cand_idx, all_dist[dev])
        return merged

    def iter_shard(X_shard, state, key):
        """One descent iteration: candidate sampling over the replicated
        state, join + merge for MY vertex shard only, then all-gather of the
        updated shards."""
        me = jax.lax.axis_index(axis_name)
        k_cand, k_join = jax.random.split(key)
        sample = nnd_ops.build_candidates(state, k_cand, max_candidates)
        state = state._replace(flag=sample.flag)

        # leading-slice 2-hop tables (see ops.nndescent._descent_iteration)
        h2n = max_candidates
        t_nn = max(1, (h2n + 1) // 2)
        t_no = max(1, h2n - t_nn)
        tbl_nn = sample.hop_new[:, :t_nn]
        tbl_no = sample.hop_old[:, :t_no]
        tbl_on = sample.hop_new[:, : max(1, max_candidates // 2)]

        n_blocks = -(-shard_size // b)

        def body(blk, carry):
            st, changes = carry
            start_row = me * shard_size + jnp.minimum(blk * b, shard_size - b)
            rows = start_row + jnp.arange(b, dtype=jnp.int32)
            hop_new = jax.lax.dynamic_slice_in_dim(sample.hop_new, start_row, b)
            hop_old = jax.lax.dynamic_slice_in_dim(sample.hop_old, start_row, b)
            hop2_new = jnp.concatenate(
                [
                    nnd_ops._slice_hop2(tbl_nn, hop_new),
                    nnd_ops._slice_hop2(tbl_no, hop_new),
                ],
                axis=-1,
            )
            hop2_old = nnd_ops._slice_hop2(tbl_on, hop_old)
            pool = jnp.concatenate([hop_new, hop2_new, hop2_old], axis=-1)
            pool = mask_pool(pool)
            pool = jnp.where(rows[:, None] < n_real, pool, -1)
            Q = ring(X_shard, jnp.minimum(rows, n_real - 1))
            C = ring(X_shard, jnp.maximum(pool, 0))
            dmat = dist_rowwise(Q, C)
            dmat = jnp.where(pool < 0, jnp.inf, dmat)
            blk_state = NeighborState(
                jax.lax.dynamic_slice_in_dim(st.idx, start_row, b),
                jax.lax.dynamic_slice_in_dim(st.dist, start_row, b),
                jax.lax.dynamic_slice_in_dim(st.flag, start_row, b),
            )
            merged, n_changed = merge_candidates(blk_state, pool, dmat)
            st = NeighborState(
                jax.lax.dynamic_update_slice_in_dim(st.idx, merged.idx, start_row, 0),
                jax.lax.dynamic_update_slice_in_dim(st.dist, merged.dist, start_row, 0),
                jax.lax.dynamic_update_slice_in_dim(st.flag, merged.flag, start_row, 0),
            )
            return st, changes + n_changed

        st, changes = jax.lax.fori_loop(0, n_blocks, body, (state, jnp.int32(0)))
        st = _merge_replicated_states(st, state)
        changes = jax.lax.psum(changes, axis_name)
        return st, changes

    stop_count = jnp.float32(delta * k * n)

    def program(X_shard, key):
        state = make_neighbor_state(n_pad, k)
        if forest is not None:
            orders, starts, sizes = forest_dev

            def tree_body(t, st):
                return tree_init_shard(
                    X_shard, st, orders[t], starts[t], sizes[t],
                    jax.random.fold_in(key, t),
                )

            state = jax.lax.fori_loop(0, orders.shape[0], tree_body, state)
        # random init on my shard's rows, then union
        me = jax.lax.axis_index(axis_name)

        def rand_block(blk, st):
            s0 = me * shard_size + jnp.minimum(blk * b, shard_size - b)
            rows = s0 + jnp.arange(b, dtype=jnp.int32)
            cand = jax.random.randint(
                jax.random.fold_in(rng.derive(key, rng.ROLE_DESCENT_INIT), blk + 1000 * me),
                (b, k), 0, n_real, dtype=jnp.int32,
            )
            self_ids = rows[:, None]
            cand = jnp.concatenate([self_ids, cand], axis=-1)
            cand = jnp.where(rows[:, None] < n_real, cand, -1)
            Q = ring(X_shard, jnp.minimum(rows, n_real - 1))
            C = ring(X_shard, jnp.maximum(cand, 0))
            dmat = dist_rowwise(Q, C)
            dmat = jnp.where(cand == self_ids, 0.0, dmat)
            dmat = jnp.where(cand < 0, jnp.inf, dmat)
            row_state = NeighborState(st.idx[rows], st.dist[rows], st.flag[rows])
            merged, _ = merge_candidates(row_state, cand, dmat)
            return NeighborState(
                st.idx.at[rows].set(merged.idx, unique_indices=True),
                st.dist.at[rows].set(merged.dist, unique_indices=True),
                st.flag.at[rows].set(merged.flag, unique_indices=True),
            )

        st = jax.lax.fori_loop(0, -(-shard_size // b), rand_block, state)
        state = _merge_replicated_states(st, state)

        def cond(carry):
            st, it, changes = carry
            return (it < n_iters) & (changes > stop_count)

        def body(carry):
            st, it, _ = carry
            st, ch = iter_shard(X_shard, st, rng.derive(key, rng.ROLE_DESCENT_ITER, it))
            return st, it + 1, ch.astype(jnp.float32)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), jnp.float32(np.inf))
        )
        return sort_by_distance(state.idx, state.dist)

    forest_dev = None
    in_specs = (spec_x, spec_rep)
    if forest is not None:
        forest_dev = tuple(jnp.asarray(f) for f in forest)

    fn = shard_map(
        program,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec_rep, spec_rep),
        check_vma=False,
    )
    idx, dist = jax.jit(fn)(X, key)
    return idx[:n], dist[:n]


def sharded_search(queries, X, adj, tree, key, mesh, *, k, epsilon=0.1,
                   min_distance=0.0, beam_width=None, dist_rowwise=None,
                   axis_name: str = "data"):
    """Query search with the query batch sharded over the mesh (data-parallel
    serving: each device runs the beam loop on its query shard against the
    replicated index). On a 2-D mesh the queries shard over the *outer*
    (DCN) axis, so serving traffic never crosses the build axis."""
    from pynndescent_tpu.models import search as search_ops

    if len(mesh.axis_names) > 1:
        qaxis = mesh.axis_names[0]
    else:
        qaxis = _data_axis(mesh, axis_name)
    replicated = NamedSharding(mesh, P())
    qshard = NamedSharding(mesh, P(qaxis, None))
    queries = jax.device_put(jnp.asarray(queries), qshard)
    X = jax.device_put(jnp.asarray(X), replicated)
    adj = jax.device_put(jnp.asarray(adj), replicated)
    if tree is not None:
        tree = {
            kk: (jax.device_put(jnp.asarray(vv), replicated) if kk not in ("depth", "angular", "leaf_size") else vv)
            for kk, vv in tree.items()
        }
    return search_ops.search(
        queries, X, adj, tree, key,
        k=k, epsilon=epsilon, min_distance=min_distance,
        beam_width=beam_width, dist_rowwise=dist_rowwise,
        batch_size=queries.shape[0],
    )
