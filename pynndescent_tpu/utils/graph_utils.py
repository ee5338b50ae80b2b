"""Graph connectivity utilities (reference: graph_utils.py).

``adjacency_matrix_representation`` — symmetric sparse adjacency from a kNN
graph (reference graph_utils.py:168). ``connect_graph`` — add minimum-cost
edges so the kNN graph becomes a single connected component (reference
graph_utils.py:193), used by the UMAP ecosystem.

The reference connects components with a bespoke bidirectional beam search
per component pair (graph_utils.py:24-165). Here the candidate edge between
two components is found with blocked exact pairwise distances over (sampled)
component members on the TPU — far simpler, and exact whenever components
fit the sample cap.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse

from pynndescent_tpu.ops import distances as dst


def adjacency_matrix_representation(neighbor_indices, neighbor_distances):
    """Symmetrised sparse adjacency matrix from (indices, distances)
    (reference graph_utils.py:168)."""
    n, k = neighbor_indices.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = neighbor_indices.reshape(-1).astype(np.int64)
    vals = neighbor_distances.reshape(-1).astype(np.float32)
    ok = (cols >= 0) & np.isfinite(vals)
    result = sparse.coo_matrix(
        (vals[ok], (rows[ok], cols[ok])), shape=(n, n)
    ).tocsr()
    return result.maximum(result.T)


def _min_cross_edge(index, comp_a, comp_b, sample_cap=1024, random_state=None):
    """Smallest-distance edge between two sets of vertex ids."""
    rs = np.random.RandomState(random_state)
    a = comp_a if len(comp_a) <= sample_cap else rs.choice(comp_a, sample_cap, replace=False)
    b = comp_b if len(comp_b) <= sample_cap else rs.choice(comp_b, sample_cap, replace=False)
    data = index._raw_data
    metric = index._internal_metric
    D = np.asarray(dst.pairwise(metric, data[a], data[b], **(index._internal_metric_kwds or {})))
    i, j = np.unravel_index(np.argmin(D), D.shape)
    d = D[i, j]
    if index._distance_correction is not None:
        d = float(np.asarray(index._distance_correction(d)))
    return int(a[i]), int(b[j]), float(d)


def connect_graph(graph, index, search_size=10, n_jobs=None, random_state=None):
    """Connect all components of the kNN adjacency by adding minimum-cost
    cross-component edges (reference graph_utils.py:193)."""
    n_components, labels = sparse.csgraph.connected_components(graph, directed=False)
    if n_components <= 1:
        return graph
    graph = graph.tolil()
    sizes = np.bincount(labels)
    main = int(np.argmax(sizes))
    main_members = np.nonzero(labels == main)[0]
    for comp in range(n_components):
        if comp == main:
            continue
        members = np.nonzero(labels == comp)[0]
        i, j, d = _min_cross_edge(index, main_members, members, random_state=random_state)
        graph[i, j] = max(d, np.finfo(np.float32).eps)
        graph[j, i] = max(d, np.finfo(np.float32).eps)
    return graph.tocsr()
