"""1M query-side levers on the sweep-recipe build (dz=16 generator).

The round-4 sweep build reaches graph recall 0.9566 but beam search
saturates at ~0.93 — the DIVERSIFIED search graph now binds. One build,
then re-prepare under different pruning knobs and sweep beam/eps.
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
qs = jnp.asarray(rsmp.choice(nq, 1024, replace=False).astype(np.int32))
true_q = np.asarray(exact_knn_device(queries[qs], train, k))
print("oracle ready", flush=True)

LOC = {"window": 65536, "sweep": 1024, "sweep_m": 32, "phases": 4,
       "phase_iters": 2, "global_iters": 2}

t0 = time.time()
index = NNDescent(train, metric="euclidean", n_neighbors=10, random_state=42,
                  n_iters=10, locality=LOC, profile=True)
gi, _ = index._neighbor_graph
gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
print(f"graph build {time.time()-t0:.1f}s  graph recall@10 "
      f"{recall_of(gidx, true_b):.4f}", flush=True)

for dp, pdm in ((1.0, 1.5), (0.5, 1.5), (0.5, 2.0), (0.0, 1.5)):
    index._search_graph = None
    index._search_tree = None
    index.diversify_prob = dp
    index.pruning_degree_multiplier = pdm
    t0 = time.time()
    index.prepare()
    adj = np.asarray(index._search_graph)
    pt = time.time() - t0
    deg = float((adj >= 0).sum(1).mean())
    print(f"dp={dp} pdm={pdm}: prepare {pt:.1f}s deg_mean {deg:.1f}",
          flush=True)
    for beam, eps in ((48, 0.25), (64, 0.25), (64, 0.35)):
        index.beam_width = beam
        qidx = None
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        r = recall_of(qidx[np.asarray(qs)], true_q)
        print(f"   beam={beam} eps={eps}: qps={qps:.0f} recall={r:.4f}",
              flush=True)
