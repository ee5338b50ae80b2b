"""250k-proxy recall sweep for the 1M north star (dz=16 latent generator).

The 1M build takes ~10 min/config on the tunneled chip; this testbed keeps
the generator and the locality discipline (window scaled to n) and sweeps
build_k / candidates / schedule, scoring graph recall@10 — the quantity that
binds query recall (PERF_NOTES round-3 1M measurement).
"""
import functools
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

n, nq, d, k, dz = 250_000, 2_000, 128, 10, 16
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

rsmp = np.random.RandomState(0)
sample = jnp.asarray(rsmp.choice(n, 512, replace=False).astype(np.int32))
true_b = np.asarray(exact_knn_device(train[sample], train, k))
true_q = np.asarray(exact_knn_device(queries, train, k))

LOC = {"window": 16384, "phases": 2, "phase_iters": 5, "global_iters": 2}

configs = [
    ("A k10", dict(n_neighbors=10)),
    ("B k12", dict(n_neighbors=12)),
    ("C k14", dict(n_neighbors=14)),
    ("D k10 c15", dict(n_neighbors=10, max_candidates=15)),
    ("E k10 3ph", dict(n_neighbors=10,
                       locality={**LOC, "phases": 3, "global_iters": 2})),
    ("F k14 c20", dict(n_neighbors=14, max_candidates=20)),
]

for name, kw in configs:
    kw = dict(kw)
    loc = kw.pop("locality", LOC)
    t0 = time.time()
    index = NNDescent(train, metric="euclidean", random_state=42,
                      n_iters=10, locality=loc, **kw)
    gi, _ = index._neighbor_graph
    gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
    bt = time.time() - t0
    r = recall_of(gidx, true_b)
    print(f"{name}: graph recall@10 {r:.4f}  build(graph-only) {bt:.1f}s",
          flush=True)
    if name.startswith(("C", "F")):
        index.prepare()
        for beam, eps in ((48, 0.15), (48, 0.25), (32, 0.25)):
            index.beam_width = beam
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qt = time.time() - t0
            print(f"   query beam={beam} eps={eps}: recall "
                  f"{recall_of(qidx, true_q):.4f} ({nq/qt:.0f} qps raw)",
                  flush=True)
    del index
