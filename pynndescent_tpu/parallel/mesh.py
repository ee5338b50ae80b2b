"""Multi-device scale-out: shard the point set over a device mesh.

The reference's only parallelism is shared-memory CPU threading with
owner-computes vertex blocks (SURVEY §2.2; reference utils.py:706-731).
The TPU-native equivalent implemented here:

* the neighbor state (idx/dist/flag rows) is **sharded along vertices**
  over a 1-D ``data`` mesh axis — each device owns a contiguous vertex shard
  exactly like a reference thread owned a vertex block;
* the dataset X is replicated (dominant regime: n*d fits per-device HBM;
  sharded-X with all-gathered blocks is the planned extension for >HBM
  datasets);
* all cross-shard traffic — reverse-neighbor routing (a segmented sort over
  all directed edges) and candidate-pool gathers — is expressed as ordinary
  XLA ops under ``jit`` with sharding constraints, letting the SPMD
  partitioner insert the all-to-all / all-gather collectives over ICI
  (the "pick a mesh, annotate shardings, let XLA insert collectives"
  recipe).

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
from pynndescent_tpu.ops.neighbors import make_neighbor_state, sort_by_distance
from pynndescent_tpu.utils import rng


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


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
):
    """NN-descent with vertex-sharded state over ``mesh``.

    Returns (indices, distances) like ops.nndescent.nn_descent. Results are
    statistically equivalent to the single-device build for the same key
    (identical sampling; ulp-level float differences may flip near-ties).
    """
    X = jnp.asarray(X)
    n = X.shape[0]
    k = n_neighbors
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"n ({n}) must be divisible by mesh size ({n_dev})")
    if n_iters is None:
        n_iters = max(5, int(round(np.log2(max(n, 2)))))
    if max_candidates is None:
        max_candidates = min(60, n_neighbors)
    if block_rows is None:
        block_rows = min(nnd_ops.DEFAULT_BLOCK_ROWS, n)

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
        block_rows=block_rows,
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
        state = constrain(make_neighbor_state(n, k))
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
        return _build(X, forest, key, has_forest=True)
    return _build(X, None, key, has_forest=False)


def sharded_search(queries, X, adj, tree, key, mesh, *, k, epsilon=0.1,
                   min_distance=0.0, beam_width=None, dist_rowwise=None,
                   axis_name: str = "data"):
    """Query search with the query batch sharded over the mesh (data-parallel
    serving: each device runs the beam loop on its query shard against the
    replicated index)."""
    from pynndescent_tpu.models import search as search_ops

    replicated = NamedSharding(mesh, P())
    qshard = NamedSharding(mesh, P(axis_name, None))
    queries = jax.device_put(jnp.asarray(queries), qshard)
    X = jax.device_put(jnp.asarray(X), replicated)
    adj = jax.device_put(jnp.asarray(adj), replicated)
    if tree is not None:
        tree = {
            kk: (jax.device_put(jnp.asarray(vv), replicated) if kk not in ("depth", "angular") else vv)
            for kk, vv in tree.items()
        }
    return search_ops.search(
        queries, X, adj, tree, key,
        k=k, epsilon=epsilon, min_distance=min_distance,
        beam_width=beam_width, dist_rowwise=dist_rowwise,
        batch_size=queries.shape[0],
    )
