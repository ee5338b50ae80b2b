"""Probe: 1-bit (sign) minhash proxy ceiling for jaccard at bench scale,
using the library's device sketch kernel (ops/sketch.sign_minhash_sketch_csr).
For D in {4096, 8192, 12288}: exact proxy top-{10, 30, 60} coverage of the
true jaccard top-10 over 500 queries x 50k docs."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_tfidf_data
from pynndescent_tpu.ops import sketch as sketch_ops

n, nq, d, nnz, k = 50_000, 500, 100_000, 64, 10
train, queries = make_tfidf_data(n, nq, d, nnz, seed=47)
train = train.tocsr()
queries = queries.tocsr()[:nq]

Qb = (queries != 0).astype(np.float32)
Tb = (train != 0).astype(np.float32)
inter = np.asarray((Qb @ Tb.T).todense())
u = np.asarray(Qb.sum(1)) + np.asarray(Tb.sum(1)).reshape(1, -1) - inter
D_true = 1.0 - inter / np.maximum(u, 1.0)
true10 = np.argsort(D_true, axis=1, kind="stable")[:, :k]

for D in (4096, 8192, 12288):
    t0 = time.perf_counter()
    st = sketch_ops.sign_minhash_sketch_csr(train, D, seed=0x5EED)
    sq = sketch_ops.sign_minhash_sketch_csr(queries, D, seed=0x5EED)
    sim = sq @ st.T
    order = np.argsort(-sim, axis=1, kind="stable")
    line = [f"D={D:6d}"]
    for topm in (10, 30, 60):
        cand = order[:, :topm]
        rec = np.mean(
            [len(np.intersect1d(cand[i], true10[i])) for i in range(nq)]
        ) / k
        line.append(f"top{topm}: {rec:.3f}")
    print("  ".join(line), f"({time.perf_counter() - t0:.0f}s)", flush=True)
