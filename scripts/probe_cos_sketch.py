"""Numpy probe: hash-sketch proxy ceiling for sparse cosine at bench scale.
For h in {1024, 2048, 4096}: exact proxy-cosine top-{10, 40, 60} coverage
of the true cosine top-10 over 500 queries x 50k docs."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_tfidf_data
from pynndescent_tpu.ops import sketch as sketch_ops

n, nq, d, nnz, k = 50_000, 500, 100_000, 64, 10
train, queries = make_tfidf_data(n, nq, d, nnz, seed=47)
train = train.tocsr()
queries = queries.tocsr()[:nq]

from sklearn.preprocessing import normalize

D_true = 1.0 - np.asarray((normalize(queries) @ normalize(train).T).todense())
true10 = np.argsort(D_true, axis=1, kind="stable")[:, :k]

for h in (1024, 2048, 4096):
    St = sketch_ops.sketch_csr(train, h, seed=0x5EED)
    Sq = sketch_ops.sketch_csr(queries, h, seed=0x5EED)
    St /= np.linalg.norm(St, axis=1, keepdims=True) + 1e-12
    Sq /= np.linalg.norm(Sq, axis=1, keepdims=True) + 1e-12
    sim = Sq @ St.T
    order = np.argsort(-sim, axis=1, kind="stable")
    line = [f"h={h:5d}"]
    for topm in (10, 40, 60):
        cand = order[:, :topm]
        rec = np.mean(
            [len(np.intersect1d(cand[i], true10[i])) for i in range(nq)]
        ) / k
        line.append(f"top{topm}: {rec:.3f}")
    print("  ".join(line), flush=True)
