"""Sparse workload profile (round-4): where do the 243 s of the cosine
sketch build go, does a narrower sketch fix it, and what do minhash
jaccard + overfetch levers buy?

Same data as bench.py's sparse workload (50k docs x 100k features, nnz 64).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_tfidf_data
from pynndescent_tpu import NNDescent

k = 10
train, queries = make_tfidf_data(50_000, 2_000, 100_000, 64, seed=47)
rs = np.random.RandomState(0)
sample = rs.choice(queries.shape[0], 200, replace=False)
Qs = queries[sample]

from sklearn.neighbors import NearestNeighbors

nn = NearestNeighbors(n_neighbors=k, metric="cosine", algorithm="brute").fit(train)
true_cos = nn.kneighbors(Qs, k, return_distance=False)

Qb = (Qs != 0).astype(np.float32)
Tb = (train != 0).astype(np.float32)
inter = np.asarray((Qb @ Tb.T).todense())
nnz_q = np.asarray(Qb.sum(axis=1))
nnz_t = np.asarray(Tb.sum(axis=1)).reshape(1, -1)
jac = 1.0 - inter / np.maximum(nnz_q + nnz_t - inter, 1.0)
true_jac = np.argsort(jac, axis=1, kind="stable")[:, :k]
print("oracles ready", flush=True)


def run(metric, true_idx, label, **kw):
    t0 = time.time()
    index = NNDescent(train, metric=metric, n_neighbors=k, random_state=48,
                      profile=True, **kw)
    index.prepare()
    np.asarray(index._search_graph)
    bt = time.time() - t0
    pt = {kk: round(vv, 1) for kk, vv in index.phase_times_.items()}
    for pbs in (4, 8):
        idx = None
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            idx, _ = index.query(queries, k=k, epsilon=0.3,
                                 proxy_beam_size=pbs)
            idx = np.asarray(idx)
            qps = max(qps, queries.shape[0] / (time.time() - t0))
        hits = sum(len(np.intersect1d(idx[s, :k], true_idx[j]))
                   for j, s in enumerate(sample))
        r = hits / (len(sample) * k)
        print(f"{label}: build {bt:.1f}s phases={pt} pbs={pbs} "
              f"qps={qps:.0f} recall={r:.4f}", flush=True)
    del index


run("cosine", true_cos, "cosine h=1024 (default)")
run("cosine", true_cos, "cosine h=512", sparse_sketch=512)
run("jaccard", true_jac, "jaccard minhash h=256 (default)")
run("jaccard", true_jac, "jaccard minhash h=512", sparse_sketch=512)
