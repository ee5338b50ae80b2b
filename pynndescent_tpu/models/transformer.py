"""scikit-learn KNeighborsTransformer-compatible wrapper.

Capability parity with the reference's ``PyNNDescentTransformer``
(``pynndescent_.py:2556-2867``): fit builds an index with n_neighbors+1
(sklearn's self-neighbor convention, reference :2776), transform emits the
CSR kneighbors graph, fit_transform reuses the index's own neighbor graph.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from sklearn.base import BaseEstimator, TransformerMixin

from pynndescent_tpu.models.nndescent import NNDescent


class PyNNDescentTransformer(TransformerMixin, BaseEstimator):
    """sklearn-contract estimator (reference ``pynndescent_.py:2556`` inherits
    the same two mixins): all ``__init__`` args are stored verbatim as
    attributes so ``get_params``/``set_params``/``clone``/GridSearchCV work."""
    def __init__(
        self,
        n_neighbors=30,
        metric="euclidean",
        metric_kwds=None,
        n_trees=None,
        leaf_size=None,
        search_epsilon=0.1,
        pruning_degree_multiplier=1.5,
        diversify_prob=1.0,
        n_search_trees=1,
        tree_init=True,
        random_state=None,
        n_jobs=None,
        low_memory=True,
        max_candidates=None,
        n_iters=None,
        early_termination_value=0.001,
        parallel_batch_queries=False,
        verbose=False,
    ):
        self.n_neighbors = n_neighbors
        self.metric = metric
        self.metric_kwds = metric_kwds
        self.n_trees = n_trees
        self.leaf_size = leaf_size
        self.search_epsilon = search_epsilon
        self.pruning_degree_multiplier = pruning_degree_multiplier
        self.diversify_prob = diversify_prob
        self.n_search_trees = n_search_trees
        self.tree_init = tree_init
        self.random_state = random_state
        self.n_jobs = n_jobs
        self.low_memory = low_memory
        self.max_candidates = max_candidates
        self.n_iters = n_iters
        self.early_termination_value = early_termination_value
        self.parallel_batch_queries = parallel_batch_queries
        self.verbose = verbose

    def fit(self, X, compress_index=True):
        self.n_samples_fit = np.asarray(X).shape[0]
        if self.verbose:
            print(f"Creating index for {self.n_samples_fit} data points")
        # +1 neighbor: sklearn transformers include the sample itself
        # (reference pynndescent_.py:2776)
        self.index_ = NNDescent(
            X,
            metric=self.metric,
            metric_kwds=self.metric_kwds,
            n_neighbors=self.n_neighbors + 1,
            n_trees=self.n_trees,
            leaf_size=self.leaf_size,
            pruning_degree_multiplier=self.pruning_degree_multiplier,
            diversify_prob=self.diversify_prob,
            n_search_trees=self.n_search_trees,
            tree_init=self.tree_init,
            random_state=self.random_state,
            low_memory=self.low_memory,
            max_candidates=self.max_candidates,
            n_iters=self.n_iters,
            delta=self.early_termination_value,
            n_jobs=self.n_jobs,
            parallel_batch_queries=self.parallel_batch_queries,
            verbose=self.verbose,
        )
        self.index_.prepare()
        if compress_index:
            # reference compresses the freshly fit index (pynndescent_.py:2797);
            # queries only need the prepared search structures
            self.index_.compress_index()
        return self

    def transform(self, X, y=None):
        # the +1 self-neighbor convention applies to fit/fit_transform only;
        # transform returns exactly n_neighbors per row (reference :2826);
        # X=None emits the fit-time neighbor graph itself (reference :2823)
        if X is None:
            n_samples_transform = self.n_samples_fit
            indices, distances = self.index_.neighbor_graph
        else:
            n_samples_transform = np.asarray(X).shape[0]
            indices, distances = self.index_.query(
                X, k=self.n_neighbors, epsilon=self.search_epsilon
            )
        valid = indices >= 0
        indptr = np.concatenate([[0], np.cumsum(valid.sum(axis=1))]).astype(np.int64)
        result = sparse.csr_matrix(
            (distances[valid], indices[valid], indptr),
            shape=(n_samples_transform, self.n_samples_fit),
        )
        return result

    def fit_transform(self, X, y=None, **fit_params):
        # reference :2860-2867: fit uncompressed, emit the index's own graph,
        # then compress
        self.fit(X, compress_index=False)
        result = self.transform(X=None)
        self.index_.compress_index()
        return result
