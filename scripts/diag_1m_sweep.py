"""1M on the dz=16 generator with the window-sweep locality recipe.

Runs the build TWICE (cold + warm) so compile time and steady-state device
time are separated, then scores graph + query recall.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench_1m import exact_knn_device, recall_of
from pynndescent_tpu import NNDescent

n, nq, d, k, dz = 1_000_000, 10_000, 128, 10, 16
rs = np.random.RandomState(42)
centers_z = jnp.asarray(rs.randn(1000, dz).astype(np.float32) * 5)
W = jnp.asarray(np.linalg.qr(rs.randn(d, dz))[0].T.astype(np.float32))


@functools.partial(jax.jit, static_argnames=("m",))
def gen(key, m):
    k1, k2, k3 = jax.random.split(key, 3)
    ids = jax.random.randint(k1, (m,), 0, centers_z.shape[0])
    z = centers_z[ids] + jax.random.normal(k2, (m, dz), jnp.float32)
    return z @ W + 0.1 * jax.random.normal(k3, (m, d), jnp.float32)


train = gen(jax.random.PRNGKey(42), n)
queries = gen(jax.random.PRNGKey(43), nq)
np.asarray(train[-1, -1])
print("data ready", flush=True)

LOC = {"window": 65536, "sweep": 1024, "sweep_m": 32, "phases": 4,
       "phase_iters": 2, "global_iters": 2}

rsmp = np.random.RandomState(0)
sample = jnp.asarray(rsmp.choice(n, 512, replace=False).astype(np.int32))
true_b = np.asarray(exact_knn_device(train[sample], train, k))
qs = jnp.asarray(rsmp.choice(nq, 1024, replace=False).astype(np.int32))
true_q = np.asarray(exact_knn_device(queries[qs], train, k))
print("oracle ready", flush=True)

index = None
for rep in ("cold", "warm"):
    t0 = time.time()
    index = NNDescent(train, metric="euclidean", n_neighbors=10,
                      random_state=42, n_iters=10, locality=LOC, profile=True)
    index.prepare()
    np.asarray(index._search_graph[-1, -1])
    bt = time.time() - t0
    pt = {kk: round(vv, 2) for kk, vv in index.phase_times_.items()}
    print(f"BUILD[{rep}]: {bt:.1f}s  phases={pt}", flush=True)

gidx = np.asarray(index._neighbor_graph[0])[np.asarray(sample)][:, :k]
print(f"graph recall@10: {recall_of(gidx, true_b):.4f}", flush=True)

for beam, eps in ((48, 0.15), (48, 0.25), (96, 0.25)):
    index.beam_width = beam
    qidx = None
    qps = 0.0
    for _ in range(2):
        t0 = time.time()
        qidx, _ = index.query(queries, k=k, epsilon=eps)
        qidx = np.asarray(qidx)
        qps = max(qps, nq / (time.time() - t0))
    r = recall_of(qidx[np.asarray(qs)], true_q)
    print(f"beam={beam} eps={eps}: qps={qps:.0f} recall={r:.4f}", flush=True)
