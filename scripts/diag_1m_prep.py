"""1M: query-recall retune of the PREPARE knobs on a fixed k=10 build.

diag_1m_kb showed graph recall plateaus at 0.9609 while query recall caps
at ~0.94 — the DIVERSIFIED search graph (deg_mean ~7 of deg_max 15) binds,
not the raw graph. The stall-testbed numbers (PERF_NOTES) say
diversify_prob=0.5 nearly doubles deg_mean at the same padded adjacency
width, i.e. better recall at ~equal qps. This sweeps (pruning_degree_mult,
diversify_prob) by re-preparing the SAME build, then measures the query
operating points.
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

LOC = {"window": 65536, "sweep": 1024, "sweep_m": 32, "phases": 12,
       "phase_iters": 0, "global_iters": 2}

t0 = time.time()
index = NNDescent(train, metric="euclidean", n_neighbors=k, random_state=42,
                  n_iters=10, locality=LOC, profile=True)
gi, _ = index._neighbor_graph
gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
bt = time.time() - t0
print(f"graph build {bt:.1f}s recall@10 {recall_of(gidx, true_b):.4f} "
      f"phases={ {kk: round(vv,1) for kk, vv in index.phase_times_.items()} }",
      flush=True)

for pdm, dp in ((1.5, 1.0), (1.5, 0.5), (2.0, 1.0), (1.5, 0.0), (3.0, 1.0)):
    index._search_graph = None
    index.pruning_degree_multiplier = pdm
    index.diversify_prob = dp
    t0 = time.time()
    index.prepare()
    np.asarray(index._search_graph)
    pt = time.time() - t0
    adj = np.asarray(index._search_graph)
    print(f"pdm={pdm} dp={dp}: prepare {pt:.1f}s deg_mean "
          f"{float((adj >= 0).sum(1).mean()):.1f} deg_max {adj.shape[1]}",
          flush=True)
    for beam, eps in ((48, 0.25), (64, 0.25)):
        index.beam_width = beam
        qidx = None
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        r = recall_of(qidx[np.asarray(qs)], true_q)
        print(f"  beam={beam} eps={eps}: qps={qps:.0f} recall={r:.4f}",
              flush=True)
