"""Profile the bench sparse workloads (50k x 100k nnz 64) on TPU.

Round-3 BENCH: sparse cosine build 243.6 s (0.25x the CPU baseline!),
recall 0.684; jaccard recall 0.353. Round-4 changes under test:
minhash jaccard sketch, and (hypothesis) the cosine build is join-gather
bound at h=1024 — bf16 joins / sweep phases / fewer iters should fix it.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_tfidf_data, run_sparse_workload  # noqa: E402
from pynndescent_tpu import NNDescent  # noqa: E402

s_train, s_queries = make_tfidf_data(50_000, 2_000, 100_000, 64, seed=47)
print("data ready", flush=True)

variants = [
    ("cosine h1024 default", "cosine", {}),
    ("cosine h1024 bf16 iters8", "cosine",
     {"build_dtype": "bfloat16", "n_iters": 8}),
    ("jaccard minhash h256 default", "jaccard", {}),
]

for name, metric, kw in variants:
    t0 = time.time()
    index = NNDescent(s_train, metric=metric, n_neighbors=10,
                      random_state=48, profile=True, **kw)
    index.prepare()
    np.asarray(index._search_graph)
    bt = time.time() - t0
    pt = {kk: round(vv, 2) for kk, vv in index.phase_times_.items()}
    print(f"{name}: build {bt:.1f}s phases={pt}", flush=True)

    # recall vs exact oracle on 200 queries (same scoring as bench.py)
    t0 = time.time()
    idx, _ = index.query(s_queries, k=10, epsilon=0.3)
    idx = np.asarray(idx)
    qt = time.time() - t0
    rs = np.random.RandomState(0)
    sample = rs.choice(s_queries.shape[0], 200, replace=False)
    Qs = s_queries[sample]
    if metric == "cosine":
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=10, metric="cosine",
                              algorithm="brute").fit(s_train)
        true_idx = nn.kneighbors(Qs, 10, return_distance=False)
    else:
        Qb = (Qs != 0).astype(np.float32)
        Tb = (s_train != 0).astype(np.float32)
        inter = np.asarray((Qb @ Tb.T).todense())
        nnz_q = np.asarray(Qb.sum(axis=1))
        nnz_t = np.asarray(Tb.sum(axis=1)).reshape(1, -1)
        union = nnz_q + nnz_t - inter
        jac = 1.0 - inter / np.maximum(union, 1.0)
        true_idx = np.argsort(jac, axis=1, kind="stable")[:, :10]
    hits = sum(
        len(np.intersect1d(idx[s, :10], true_idx[j]))
        for j, s in enumerate(sample)
    )
    r = hits / (len(sample) * 10)
    print(f"   query: {s_queries.shape[0]/qt:.0f} qps  recall@10 {r:.4f}",
          flush=True)
    del index
