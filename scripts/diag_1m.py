"""Round-3 1M diagnostic: build w/ phase prints, graph recall, eps/beam sweep.

Timing is labeled neutrally: warmth depends on the persistent JAX compile
cache being populated (cold cache => the same line includes compile time).
"""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench_1m import exact_knn_device, make_data_device, recall_of
from pynndescent_tpu import NNDescent

n, nq, d, k = 1_000_000, 10_000, 128, 10
train, queries = make_data_device(n, nq, d)
np.asarray(train[-1, -1])
print("data ready", flush=True)

t0 = time.time()
index = NNDescent(train, metric="euclidean", n_neighbors=20, random_state=42,
                  n_iters=10, beam_width=96, verbose=True,
                  locality={"window": 65536, "phases": 2, "phase_iters": 5,
                            "global_iters": 2})
index.prepare()
np.asarray(index._search_graph[-1, -1])
print(f"BUILD (warm iff compile cache was populated): {time.time()-t0:.1f}s", flush=True)

rs = np.random.RandomState(0)
sample = jnp.asarray(rs.choice(n, 512, replace=False).astype(np.int32))
true_b = np.asarray(exact_knn_device(train[sample], train, k))
gidx = np.asarray(index._neighbor_graph[0])[np.asarray(sample)][:, :k]
print(f"graph recall@10 (k=20 build): {recall_of(gidx, true_b):.4f}", flush=True)

qs = jnp.asarray(rs.choice(nq, 1024, replace=False).astype(np.int32))
true_q = np.asarray(exact_knn_device(queries[qs], train, k))
for beam, eps_list in ((96, (0.25, 0.35, 0.45)), (128, (0.3, 0.45))):
    index.beam_width = beam
    for eps in eps_list:
        qidx = None; qps = 0.0
        for _ in range(2):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        r = recall_of(qidx[np.asarray(qs)], true_q)
        print(f"beam={beam} eps={eps}: qps={qps:.0f} recall={r:.4f}", flush=True)
