"""1M retune on the PRECISE oracle (HIGHEST-precision matmul) + staggered
sweeps.

Earlier 1M recall numbers were scored against a bf16-precision gram oracle
(default MXU precision): with 77% of rank-10 boundaries within 1% relative
distance, the oracle's own top-10 was near-tie-shuffled, deflating strict
recall. This re-measures the staggered-sweep recipe end to end:

- graph strict + tie-tolerant recall (id hit OR true distance within
  (1+1e-3) of the true k-th — the ann-benchmarks convention),
- prepare-knob sweep (dp 1.0 / 0.0) by re-preparing the same build,
- query operating points (beam, eps).
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
qd_t = np.linalg.norm(  # true k-th distances, direct (no-cancellation) form
    np.asarray(train[jnp.asarray(true_q[:, -1])], np.float32)
    - np.asarray(queries[qs], np.float32),
    axis=1,
)
Qh = np.asarray(queries[qs], np.float32)
print("oracle ready", flush=True)


def tie_recall(found, eps=1e-3):
    """Strict-id hits plus returned ids whose TRUE distance is within
    (1+eps) of the true k-th distance (ann-benchmarks tie convention)."""
    rows = np.asarray(
        train[jnp.asarray(found.ravel())], np.float32
    ).reshape(*found.shape, -1)
    ds = np.linalg.norm(rows - Qh[:, None, :], axis=-1)
    ok = ds <= (1.0 + eps) * qd_t[:, None]
    for r in range(found.shape[0]):  # strict hits also count
        ok[r] |= np.isin(found[r], true_q[r])
    return float(ok.mean())


LOC = {"window": 65536, "sweep": 1024, "sweep_m": 32, "phases": 12,
       "phase_iters": 0, "global_iters": 2}

t0 = time.time()
index = NNDescent(train, metric="euclidean", n_neighbors=k, random_state=42,
                  n_iters=10, locality=LOC, profile=True)
gi, _ = index._neighbor_graph
gidx = np.asarray(gi)[np.asarray(sample)][:, :k]
bt = time.time() - t0
print(f"graph build {bt:.1f}s strict recall@10 {recall_of(gidx, true_b):.4f} "
      f"phases={ {kk: round(vv,1) for kk, vv in index.phase_times_.items()} }",
      flush=True)

for pdm, dp in ((1.5, 1.0), (1.5, 0.0)):
    index._search_graph = None
    index.pruning_degree_multiplier = pdm
    index.diversify_prob = dp
    t0 = time.time()
    index.prepare()
    np.asarray(index._search_graph)
    pt = time.time() - t0
    adj = np.asarray(index._search_graph)
    print(f"pdm={pdm} dp={dp}: prepare {pt:.1f}s deg_mean "
          f"{float((adj >= 0).sum(1).mean()):.1f}", flush=True)
    for beam, eps in ((48, 0.25), (64, 0.3)):
        index.beam_width = beam
        qidx = None
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        f = qidx[np.asarray(qs)]
        print(f"  beam={beam} eps={eps}: qps={qps:.0f} "
              f"strict={recall_of(f, true_q):.4f} tie@1e-3={tie_recall(f):.4f}",
              flush=True)
