"""NNDescent index — the public API layer.

Capability parity with the reference's ``NNDescent`` class
(``pynndescent_.py:792-2553``): constructor surface, data-dependent defaults,
fast-alternative metric substitution with final distance correction,
RP-forest-seeded graph build, diversified/pruned search-graph preparation,
epsilon-bounded queries, and (incrementally, across milestones) update(),
compress_index(), pickling, quantization, and the sparse path.

The orchestration is host Python; every hot stage is a jitted TPU program:
forest build (ops.rp_trees), descent (ops.nndescent), diversification
(ops.prune), and query search (models.search).
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops import distances as dst
from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops import prune as prune_ops
from pynndescent_tpu.ops import rp_trees
from pynndescent_tpu.models import search as search_ops
from pynndescent_tpu.utils import rng

_ANGULAR_METRICS = (
    "cosine",
    "dot",
    "correlation",
    "dice",
    "jaccard",
    "hellinger",
    "hamming",
    "bit_hamming",
    "bit_jaccard",
)


class NNDescent:
    """TPU-native approximate nearest neighbor index (reference:
    pynndescent_.py:976).

    Parameters mirror the reference's constructor; TPU-specific tuning knobs
    (block_rows, beam_width) are additive.
    """

    def __init__(
        self,
        data,
        metric="euclidean",
        metric_kwds=None,
        n_neighbors=30,
        n_trees=None,
        leaf_size=None,
        pruning_degree_multiplier=1.5,
        diversify_prob=1.0,
        n_search_trees=1,
        tree_init=True,
        init_graph=None,
        init_dist=None,
        random_state=None,
        low_memory=True,
        max_candidates=None,
        max_rptree_depth=None,
        n_iters=None,
        delta=0.001,
        n_jobs=None,
        compressed=False,
        parallel_batch_queries=False,
        verbose=False,
        *,
        block_rows=nnd_ops.DEFAULT_BLOCK_ROWS,
        beam_width=None,
    ):
        self.n_neighbors = n_neighbors
        self.metric = metric
        self.metric_kwds = dict(metric_kwds or {})
        self.pruning_degree_multiplier = pruning_degree_multiplier
        self.diversify_prob = diversify_prob
        self.n_search_trees = n_search_trees
        self.low_memory = low_memory
        self.delta = delta
        self.compressed = compressed
        self.parallel_batch_queries = parallel_batch_queries
        self.verbose = verbose
        self.random_state = random_state
        self.block_rows = block_rows
        self.beam_width = beam_width

        data = np.ascontiguousarray(np.asarray(data, dtype=np.float32))
        if data.ndim == 1:
            data = data.reshape(-1, 1)
        n = data.shape[0]

        # data-dependent defaults (reference pynndescent_.py:1009-1012, :1135)
        if n_trees is None:
            n_trees = rp_trees.default_n_trees(n)
        if n_iters is None:
            n_iters = max(5, int(round(np.log2(max(n, 2)))))
        if max_candidates is None:
            max_candidates = min(60, n_neighbors)
        if leaf_size is None:
            leaf_size = rp_trees.default_leaf_size(n_neighbors)
        self.n_trees = n_trees
        self.n_iters = n_iters
        self.max_candidates = max_candidates
        self.leaf_size = leaf_size
        self.n_trees_after_update = max(2, int(round(n_trees / 3)))

        self._angular_trees = metric in _ANGULAR_METRICS or (
            callable(metric) and getattr(self, "angular_trees", False)
        )

        # metric resolution: substitute the order-preserving fast alternative
        # for build/search; correct distances on output
        # (reference _set_distance_func, pynndescent_.py:1271)
        self._set_distance_func()

        if metric == "dot":
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            data = data / np.where(norms == 0.0, 1.0, norms)

        self._raw_data = data
        self._X = jnp.asarray(data)

        self._key = rng.state_from_seed(random_state)

        if init_graph is not None and tree_init:
            tree_init = False
        self.tree_init = tree_init and n_trees > 0

        # ---- build ----
        forest = None
        if self.tree_init:
            if verbose:
                print("Building RP forest with", n_trees, "trees")
            fkey = rng.derive(self._key, rng.ROLE_FOREST)
            seeds = jax.random.randint(
                fkey, (n_trees,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
            ).astype(jnp.uint32)
            forest = rp_trees.build_forest_orders(
                self._X,
                seeds,
                leaf_size,
                rp_trees.forest_depth(n, leaf_size),
                angular=self._angular_trees,
            )

        init_state = None
        if init_graph is not None:
            from pynndescent_tpu.ops.neighbors import state_from_graph

            init_graph = np.asarray(init_graph, np.int32)
            if init_graph.shape[0] != n:
                raise ValueError("Init graph size does not match dataset size")
            if init_dist is None:
                init_dist = self._bulk_self_distances(init_graph)
            init_state = state_from_graph(
                jnp.asarray(init_graph), jnp.asarray(init_dist), k=n_neighbors
            )

        if verbose:
            print("NN descent for", n_iters, "iterations")
        idx, dist_internal = nnd_ops.nn_descent(
            self._X,
            n_neighbors,
            self._key,
            metric=self._internal_metric,
            metric_kwds=self._internal_metric_kwds,
            n_iters=n_iters,
            delta=delta,
            max_candidates=max_candidates,
            init_graph=init_state,
            forest=forest,
            leaf_cap=min(leaf_size, 64),
            block_rows=block_rows,
            verbose=verbose,
        )
        self._neighbor_graph = (np.asarray(idx), np.asarray(dist_internal))

        if np.any(self._neighbor_graph[0] < 0):
            warnings.warn(
                "Failed to correctly find n_neighbors for some samples. "
                "Results may be less than ideal. Try re-running with "
                "different parameters."
            )

        self._search_graph = None
        self._search_tree = None
        self._visited = None

        if compressed:
            self.prepare()
            self.compress_index()

    # ------------------------------------------------------------------
    # metric plumbing
    # ------------------------------------------------------------------

    def _bulk_self_distances(self, idx):
        fn = nnd_ops._resolve_rowwise_metric(self._internal_metric, self._internal_metric_kwds)
        d = fn(self._X, self._X[jnp.maximum(jnp.asarray(idx), 0)])
        return np.where(idx < 0, np.inf, np.asarray(d))

    def _set_distance_func(self):
        metric = self.metric
        self._distance_correction = None
        self._internal_metric_kwds = self.metric_kwds
        if callable(metric):
            self._internal_metric = metric
        elif metric in dst.fast_distance_alternatives:
            entry = dst.fast_distance_alternatives[metric]
            self._internal_metric = entry["pairwise"] or entry["dist"]
            self._distance_correction = entry["correction"]
        elif metric in dst.named_distances:
            self._internal_metric = metric
        else:
            raise ValueError(f"Metric '{metric}' not recognized")

    @property
    def neighbor_graph(self):
        """(indices, distances) with corrected (true-metric) distances
        (reference pynndescent_.py:2145)."""
        if self._neighbor_graph is None:
            warnings.warn("The index is compressed; neighbor graph is not available.")
            return None
        idx, d = self._neighbor_graph
        if self._distance_correction is not None:
            d = self._distance_correction(d)
        return idx, np.asarray(d)

    # ------------------------------------------------------------------
    # prepare: diversified, degree-pruned search graph + search tree
    # ------------------------------------------------------------------

    def prepare(self):
        """Build the search graph and tree (reference: prepare,
        pynndescent_.py:2174 / _init_search_graph :1333)."""
        if self._search_graph is not None:
            return
        idx, dist = self._neighbor_graph
        n, k = idx.shape
        deg_max = max(1, int(round(self.pruning_degree_multiplier * self.n_neighbors)))
        rev_cap = max(2 * deg_max, 16)
        metric = self._internal_metric
        metric_kwds = self._internal_metric_kwds
        prune_prob = self.diversify_prob
        div_key = rng.derive(self._key, rng.ROLE_SEARCH, 7)

        from pynndescent_tpu.ops.neighbors import make_neighbor_state, merge_candidates

        @jax.jit
        def _assemble(idx, dist, X, key):
            row_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
            # forward diversify (self edges at distance ~0 never occlude and
            # are dropped from the rows here)
            keep_fwd = prune_ops.diversify_all(
                idx, dist, X, metric, metric_kwds, prune_prob, key
            )
            fwd_idx = jnp.where(keep_fwd & (idx >= 0) & (idx != row_ids), idx, -1)
            fwd_dist = jnp.where(fwd_idx >= 0, dist, jnp.inf)
            # reverse rows = transpose of the diversified forward graph
            rev_idx, rev_dist = prune_ops.reverse_topk(fwd_idx, fwd_dist, rev_cap)
            keep_rev = prune_ops.diversify_all(
                rev_idx, rev_dist, X, metric, metric_kwds, prune_prob,
                jax.random.fold_in(key, 1),
            )
            rev_idx = jnp.where(keep_rev, rev_idx, -1)
            rev_dist = jnp.where(rev_idx >= 0, rev_dist, jnp.inf)
            # union forward + reverse per row, keep the deg_max closest
            # (merge maximum + degree_prune, reference :1595-1609)
            state = make_neighbor_state(n, deg_max)
            state, _ = merge_candidates(state, fwd_idx, fwd_dist)
            state, _ = merge_candidates(state, rev_idx, rev_dist)
            min_dist = jnp.min(jnp.where(jnp.isfinite(state.dist), state.dist, jnp.inf))
            return state.idx, jnp.where(jnp.isfinite(min_dist), min_dist, 0.0)

        adj, min_dist = _assemble(
            jnp.asarray(idx), jnp.asarray(dist), self._X, div_key
        )
        self._min_distance = float(min_dist)
        self._search_graph = adj

        # search tree (reference builds a graph-informed hub tree,
        # rp_trees.py:1233; plain RP tree fallback :1354-1373 — hub variant
        # is a planned upgrade)
        seed = int(
            np.asarray(
                jax.random.randint(
                    rng.derive(self._key, rng.ROLE_SEARCH, 1), (), 0, np.iinfo(np.int32).max
                )
            )
        )
        tree = rp_trees.flatten_search_tree(
            self._X,
            seed,
            leaf_size=max(self.leaf_size, self.n_neighbors),
            angular=self._angular_trees,
        )
        self._search_tree = tree.to_arrays()

    # ------------------------------------------------------------------
    # query
    # ------------------------------------------------------------------

    def query(self, query_data, k=10, epsilon=0.1):
        """k nearest neighbors of each query point (reference: query,
        pynndescent_.py:2275). Returns (indices, distances)."""
        self.prepare()
        q = np.ascontiguousarray(np.asarray(query_data, np.float32))
        if q.ndim == 1:
            q = q.reshape(1, -1)
        if self.metric in ("cosine", "dot"):
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            q = q / np.where(norms == 0.0, 1.0, norms)

        dist_rowwise = nnd_ops._resolve_rowwise_metric(
            self._internal_metric, self._internal_metric_kwds
        )
        beam = self.beam_width or max(2 * k, 32)
        idx, d = search_ops.search(
            q,
            self._X,
            self._search_graph,
            self._search_tree,
            rng.derive(self._key, rng.ROLE_SEARCH, 2),
            k=k,
            epsilon=epsilon,
            min_distance=self._min_distance,
            beam_width=beam,
            dist_rowwise=dist_rowwise,
        )
        if self._distance_correction is not None:
            d = self._distance_correction(d)
        return idx, d

    # ------------------------------------------------------------------

    def compress_index(self):
        """Drop build-side structures to shrink the serialized index
        (reference pynndescent_.py:2160)."""
        self.prepare()
        self.compressed = True
        self._neighbor_graph = None

    # ------------------------------------------------------------------
    # incremental update (reference pynndescent_.py:2381)
    # ------------------------------------------------------------------

    def update(self, xs_fresh=None, xs_updated=None, updated_indices=None):
        """Update the index with fresh rows and/or in-place row overwrites,
        then re-run descent seeded from the previous graph with a smaller
        forest (reference: NNDescent.update, pynndescent_.py:2381-2553)."""
        if self._neighbor_graph is None:
            raise ValueError("Cannot update a compressed index")
        data = self._raw_data
        idx, dist = self._neighbor_graph
        n_old, k = idx.shape

        if xs_updated is not None:
            xs_updated = np.ascontiguousarray(np.asarray(xs_updated, np.float32))
            updated_indices = np.asarray(updated_indices, np.int64)
            if self.metric == "dot":
                norms = np.linalg.norm(xs_updated, axis=1, keepdims=True)
                xs_updated = xs_updated / np.where(norms == 0.0, 1.0, norms)
            data = data.copy()
            data[updated_indices] = xs_updated
            # invalidate graph entries referencing (or owned by) updated rows
            touched = np.zeros(n_old + 1, bool)
            touched[updated_indices] = True
            entry_touched = touched[np.maximum(idx, 0)] | touched[
                np.arange(n_old, dtype=np.int64), None
            ]
            idx = np.where(entry_touched, -1, idx)
            dist = np.where(entry_touched, np.inf, dist).astype(np.float32)

        if xs_fresh is not None:
            xs_fresh = np.ascontiguousarray(np.asarray(xs_fresh, np.float32))
            if self.metric == "dot":
                norms = np.linalg.norm(xs_fresh, axis=1, keepdims=True)
                xs_fresh = xs_fresh / np.where(norms == 0.0, 1.0, norms)
            data = np.vstack([data, xs_fresh])
            idx = np.vstack([idx, np.full((len(xs_fresh), k), -1, np.int32)])
            dist = np.vstack(
                [dist, np.full((len(xs_fresh), k), np.inf, np.float32)]
            ).astype(np.float32)

        self._raw_data = data
        self._X = jnp.asarray(data)
        n = data.shape[0]

        # shrunken forest (reference: n_trees_after_update, :1016, :2498)
        self._key = rng.derive(self._key, rng.ROLE_UPDATE)
        fkey = rng.derive(self._key, rng.ROLE_FOREST)
        seeds = jax.random.randint(
            fkey, (self.n_trees_after_update,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
        forest = rp_trees.build_forest_orders(
            self._X,
            seeds,
            self.leaf_size,
            rp_trees.forest_depth(n, self.leaf_size),
            angular=self._angular_trees,
        )

        from pynndescent_tpu.ops.neighbors import state_from_graph

        init_state = state_from_graph(jnp.asarray(idx), jnp.asarray(dist), k=k)
        new_idx, new_dist = nnd_ops.nn_descent(
            self._X,
            self.n_neighbors,
            self._key,
            metric=self._internal_metric,
            metric_kwds=self._internal_metric_kwds,
            n_iters=self.n_iters,
            delta=self.delta,
            max_candidates=self.max_candidates,
            init_graph=init_state,
            forest=forest,
            leaf_cap=min(self.leaf_size, 64),
            block_rows=self.block_rows,
            verbose=self.verbose,
        )
        self._neighbor_graph = (np.asarray(new_idx), np.asarray(new_dist))

        # rebuild the search structures lazily (reference :2537-2553)
        self._search_graph = None
        self._search_tree = None

    # ------------------------------------------------------------------
    # pickling (reference pynndescent_.py:1306-1331)
    # ------------------------------------------------------------------

    def __getstate__(self):
        self.prepare()  # search structures must exist (reference :1307)
        state = self.__dict__.copy()
        state["_X"] = None  # rebuilt from _raw_data
        state["_search_graph"] = np.asarray(self._search_graph)
        state["_key"] = np.asarray(self._key)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._X = jnp.asarray(self._raw_data)
        self._search_graph = jnp.asarray(state["_search_graph"])
        self._key = jnp.asarray(state["_key"])
