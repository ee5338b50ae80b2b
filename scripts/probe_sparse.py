"""Phase-timed sparse (packed-ELL) workload probe on the real TPU.

Usage: python scripts/probe_sparse.py [n] [metric]

Runs the bench.py TF-IDF workload shape (n docs x 100k features, nnz 64)
with verbose phase prints, then queries, then reports recall vs a
sparse-native exact oracle.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from pynndescent_tpu import NNDescent  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    metric = sys.argv[2] if len(sys.argv) > 2 else "cosine"
    nq = 2000
    t0 = time.time()
    train, queries = bench.make_tfidf_data(n, nq, 100_000, 64, seed=47)
    print(f"data gen: {time.time()-t0:.1f}s nnz_max={int(np.diff(train.indptr).max())}",
          flush=True)

    t0 = time.time()
    index = NNDescent(train, metric=metric, n_neighbors=10, random_state=48,
                      verbose=True)
    index.prepare()
    np.asarray(index._search_graph)
    print(f"BUILD: {time.time()-t0:.1f}s", flush=True)

    for eps in (0.2, 0.3):
        t0 = time.time()
        qi, _ = index.query(queries, k=10, epsilon=eps)
        qi = np.asarray(qi)
        t1 = time.time() - t0
        t0 = time.time()
        qi, _ = index.query(queries, k=10, epsilon=eps)
        qi = np.asarray(qi)
        t2 = time.time() - t0
        print(f"eps={eps}: qps={nq/min(t1, t2):.0f}", flush=True)

    # exact oracle on a 200-query sample (sparse-native, CPU)
    rs = np.random.RandomState(0)
    sample = rs.choice(nq, 200, replace=False)
    Qs = queries[sample]
    if metric == "cosine":
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=10, metric="cosine", algorithm="brute").fit(train)
        true_idx = nn.kneighbors(Qs, 10, return_distance=False)
    else:
        Qb = (Qs != 0).astype(np.float32)
        Tb = (train != 0).astype(np.float32)
        inter = np.asarray((Qb @ Tb.T).todense())
        nnz_q = np.asarray(Qb.sum(axis=1))
        nnz_t = np.asarray(Tb.sum(axis=1)).reshape(1, -1)
        union = nnz_q + nnz_t - inter
        jac = 1.0 - inter / np.maximum(union, 1.0)
        true_idx = np.argsort(jac, axis=1, kind="stable")[:, :10]
    hits = sum(len(np.intersect1d(qi[s], true_idx[j])) for j, s in enumerate(sample))
    print(f"query recall@10: {hits/2000:.4f}", flush=True)


if __name__ == "__main__":
    main()
