"""250k: window-sweep recipe sweep (Pallas window_topm locality phases).

Tests whether exact within-window top-m sweeps (gather-free, MXU) can
replace/augment the windowed-join locality phases at lower cost and higher
graph recall on the dz=16 latent generator.
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

configs = [
    ("S1 sweep1024 4ph join0 g3",
     {"window": 16384, "sweep": 1024, "sweep_m": 32, "phases": 4,
      "phase_iters": 0, "global_iters": 3}),
    ("S2 sweep1024 4ph join2 g2",
     {"window": 16384, "sweep": 1024, "sweep_m": 32, "phases": 4,
      "phase_iters": 2, "global_iters": 2}),
    ("S3 sweep2048 3ph join0 g3",
     {"window": 16384, "sweep": 2048, "sweep_m": 32, "phases": 3,
      "phase_iters": 0, "global_iters": 3}),
    ("S4 sweep1024 6ph join0 g3",
     {"window": 16384, "sweep": 1024, "sweep_m": 32, "phases": 6,
      "phase_iters": 0, "global_iters": 3}),
]

for name, loc in configs:
    t0 = time.time()
    index = NNDescent(train, metric="euclidean", random_state=42,
                      n_neighbors=10, n_iters=10, locality=loc, profile=True)
    gi, _ = index._neighbor_graph
    gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
    bt = time.time() - t0
    r = recall_of(gidx, true_b)
    pt = getattr(index, "phase_times_", {})
    print(f"{name}: graph recall@10 {r:.4f}  graph build {bt:.1f}s  "
          f"phases={ {kk: round(vv, 2) for kk, vv in pt.items()} }",
          flush=True)
    del index
