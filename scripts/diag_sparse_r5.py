"""Round-5 sparse diagnosis at bench scale (50k x 100k TF-IDF, nnz 64).

Questions:
1. With tie-aware distance-threshold recall (the bench's new scorer), where
   do jaccard/cosine actually land at the default sketch widths?
2. Where do the ~220-237 s builds spend their time (phase_times_)?
3. Does a wider sketch (h=1024 minhash / h=2048 hash) buy recall at
   acceptable build cost?

Usage: python scripts/diag_sparse_r5.py jaccard 256
       python scripts/diag_sparse_r5.py cosine auto
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_tfidf_data
from pynndescent_tpu import NNDescent

metric = sys.argv[1] if len(sys.argv) > 1 else "jaccard"
sketch = sys.argv[2] if len(sys.argv) > 2 else "auto"
sketch = sketch if sketch == "auto" else int(sketch)
k = 10

t0 = time.perf_counter()
train, queries = make_tfidf_data(50_000, 2_000, 100_000, 64, seed=47)
print(f"data gen: {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
index = NNDescent(
    train, metric=metric, n_neighbors=k, random_state=49,
    sparse_sketch=sketch, profile=True, verbose=True,
)
index.prepare()
np.asarray(index._search_graph)
build_s = time.perf_counter() - t0
print(f"build: {build_s:.1f}s  sketch={index._sketch}", flush=True)
for name, sec in sorted(index.phase_times_.items(), key=lambda kv: -kv[1]):
    print(f"  phase {name:28s} {sec:8.2f}s", flush=True)

qps = 0.0
idx = None
for _ in range(2):
    t0 = time.perf_counter()
    idx, _ = index.query(queries, k=k, epsilon=0.3)
    idx = np.asarray(idx)
    qps = max(qps, queries.shape[0] / (time.perf_counter() - t0))
print(f"qps: {qps:.0f}", flush=True)

rs = np.random.RandomState(0)
sample = rs.choice(queries.shape[0], 200, replace=False)
Qs = queries[sample]
if metric == "cosine":
    from sklearn.preprocessing import normalize

    D = 1.0 - np.asarray((normalize(Qs) @ normalize(train).T).todense())
else:
    Qb = (Qs != 0).astype(np.float32)
    Tb = (train != 0).astype(np.float32)
    inter = np.asarray((Qb @ Tb.T).todense())
    nnz_q = np.asarray(Qb.sum(axis=1))
    nnz_t = np.asarray(Tb.sum(axis=1)).reshape(1, -1)
    union = nnz_q + nnz_t - inter
    D = 1.0 - inter / np.maximum(union, 1.0)
dk = np.partition(D, k - 1, axis=1)[:, k - 1 : k]
found = idx[sample, :k]
d_found = np.take_along_axis(D, np.maximum(found, 0), axis=1)
valid = found >= 0
strict = float((valid & (d_found <= dk + 1e-6)).mean())
eps_r = float((valid & (d_found <= dk * (1 + 1e-3) + 1e-6)).mean())
# legacy id-set recall for comparison
order = np.argsort(D, axis=1, kind="stable")[:, :k]
idhits = np.mean([len(np.intersect1d(found[j], order[j])) for j in range(len(sample))]) / k
# tie-class size at the boundary
tie_sz = float((np.abs(D - dk) <= 1e-9).sum(axis=1).mean())
print(
    f"RESULT metric={metric} sketch={sketch} build={build_s:.1f}s qps={qps:.0f} "
    f"recall_tieaware={strict:.4f} recall_eps={eps_r:.4f} recall_idset={idhits:.4f} "
    f"mean_tieclass_at_k={tie_sz:.1f}",
    flush=True,
)
