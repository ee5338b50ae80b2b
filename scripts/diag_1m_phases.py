"""1M: many sweep-phases, few joins — is the exact window sweep alone
enough to carry graph recall when run over ALL forest tree orders?

Rationale: a sweep phase costs ~permute + one MXU pass (~2% of a join
iteration); the forest already holds 12 independent tree orders. If
true-NN window collisions were independent across trees, 12 sweeps would
give recall ~1-(1-p)^12 >= 0.99 at the p~0.5 implied by the 4-phase
number (0.9367). Misses correlate, so measure.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench_1m import exact_knn_device, make_latent_data_device, recall_of
from pynndescent_tpu import NNDescent

n, nq, d, k = 1_000_000, 10_000, 128, 10
train, queries = make_latent_data_device(n, nq, d, dz=16, seed=42)
np.asarray(train[-1, -1])

rsmp = np.random.RandomState(0)
sample = jnp.asarray(rsmp.choice(n, 512, replace=False).astype(np.int32))
true_b = np.asarray(exact_knn_device(train[sample], train, k))
print("oracle ready", flush=True)

VARIANTS = [
    ("A ph12 join0 g1", {"window": 65536, "sweep": 1024, "sweep_m": 32,
                         "phases": 12, "phase_iters": 0, "global_iters": 1}),
    ("B ph12 join0 g2", {"window": 65536, "sweep": 1024, "sweep_m": 32,
                         "phases": 12, "phase_iters": 0, "global_iters": 2}),
    ("C ph8 join1 g1", {"window": 65536, "sweep": 1024, "sweep_m": 32,
                        "phases": 8, "phase_iters": 1, "global_iters": 1}),
    ("D ph12 join1 g2", {"window": 65536, "sweep": 1024, "sweep_m": 32,
                         "phases": 12, "phase_iters": 1, "global_iters": 2}),
]

for name, LOC in VARIANTS:
    t0 = time.time()
    index = NNDescent(train, metric="euclidean", n_neighbors=k,
                      random_state=42, n_iters=10, locality=LOC, profile=True)
    gi, _ = index._neighbor_graph
    gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
    bt = time.time() - t0
    pt = {kk: round(vv, 1) for kk, vv in index.phase_times_.items()}
    print(f"{name}: graph recall@10 {recall_of(gidx, true_b):.4f}  "
          f"build {bt:.1f}s  phases={pt}", flush=True)
    del index
