"""1M: recipe B (12 sweep-phases, join0, g2) at build_k in {12, 14}.

The sweep-phase count saturates graph recall at ~0.9605 at k=10
(diag_1m_phases). A wider build state keeps more of what the sweeps find:
each row's top-10 of a k-wide sorted state is strictly better for k>10.
Measures graph recall@10, warm build time, prepare time, and the query
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

for bk in (12, 14):
    t0 = time.time()
    index = NNDescent(train, metric="euclidean", n_neighbors=bk,
                      random_state=42, n_iters=10, locality=LOC, profile=True)
    gi, _ = index._neighbor_graph
    gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
    bt = time.time() - t0
    t0 = time.time()
    index.prepare()
    np.asarray(index._search_graph)
    pt_s = time.time() - t0
    pt = {kk: round(vv, 1) for kk, vv in index.phase_times_.items()}
    adj = np.asarray(index._search_graph)
    print(f"bk={bk}: graph recall@10 {recall_of(gidx, true_b):.4f}  "
          f"graph {bt:.1f}s prepare {pt_s:.1f}s deg_mean "
          f"{float((adj >= 0).sum(1).mean()):.1f} phases={pt}", flush=True)

    for beam, eps, E in ((48, 0.25, 2), (64, 0.3, 2), (96, 0.35, 2)):
        index.beam_width = beam
        qidx = None
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps,
                                  expansions_per_step=E)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        r = recall_of(qidx[np.asarray(qs)], true_q)
        print(f"  beam={beam} eps={eps} E={E}: qps={qps:.0f} recall={r:.4f}",
              flush=True)
    del index
