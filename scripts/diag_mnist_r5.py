"""Round-5 MNIST-784 build profile: where do the 10.4 s go, and does a
bfloat16 join (exact-reranked on output) close the 5x build target?

Usage: python scripts/diag_mnist_r5.py [build_dtype]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_data
from pynndescent_tpu import NNDescent

build_dtype = sys.argv[1] if len(sys.argv) > 1 else None
k = 10
train, queries = make_data(70_000, 10_000, 784, seed=45)

kw = {}
if build_dtype:
    kw["build_dtype"] = build_dtype
best = float("inf")
for rep in range(2):
    t0 = time.perf_counter()
    index = NNDescent(
        train, n_neighbors=k, random_state=46 + rep, profile=True, **kw
    )
    index.prepare()
    np.asarray(index._search_graph)
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep{rep}: build {dt:.2f}s", flush=True)
    for name, sec in sorted(index.phase_times_.items(), key=lambda kv: -kv[1]):
        print(f"  phase {name:28s} {sec:8.2f}s", flush=True)

import jax.numpy as jnp

q_dev = jnp.asarray(queries)
np.asarray(q_dev[-1, -1])
qps = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    idx, dist = index.query(q_dev, k=k, epsilon=0.2)
    idx = np.asarray(idx)
    qps = max(qps, len(queries) / (time.perf_counter() - t0))

rs = np.random.RandomState(0)
sample = rs.choice(len(queries), 1000, replace=False)
from sklearn.neighbors import NearestNeighbors

nn = NearestNeighbors(n_neighbors=k).fit(train)
true_idx = nn.kneighbors(queries[sample], k, return_distance=False)
hits = sum(
    len(np.intersect1d(idx[s, :k], true_idx[j])) for j, s in enumerate(sample)
)
print(
    f"RESULT dtype={build_dtype} build={best:.2f}s qps={qps:.0f} "
    f"recall={hits / (len(sample) * k):.4f}",
    flush=True,
)
