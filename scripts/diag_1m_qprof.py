"""1M query-path profile: where do the microseconds go?

Measures, on a warm prepared index (best round-4 build recipe):
- while_loop step counts per batch (lockstep tail effect: the whole batch
  spins until its slowest query converges),
- qps vs batch_size (8192/4096/2048) at fixed beam/eps,
- qps vs expansions_per_step,
- the recall cost of each setting.
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
from pynndescent_tpu.models import search as search_mod
from pynndescent_tpu.ops.nndescent import _resolve_rowwise_metric
from pynndescent_tpu.utils import rng

n, nq, d, k = 1_000_000, 10_000, 128, 10
train, queries = make_latent_data_device(n, nq, d, dz=16, seed=42)
np.asarray(train[-1, -1])

rsmp = np.random.RandomState(0)
qs = jnp.asarray(rsmp.choice(nq, 1024, replace=False).astype(np.int32))
true_q = np.asarray(exact_knn_device(queries[qs], train, k))
print("oracle ready", flush=True)

LOC = {"window": 65536, "sweep": 1024, "sweep_m": 32, "phases": 12,
       "phase_iters": 0, "global_iters": 2}
t0 = time.time()
index = NNDescent(train, metric="euclidean", n_neighbors=k, random_state=42,
                  n_iters=10, locality=LOC, profile=True)
index.prepare()
np.asarray(index._search_graph)
print(f"build+prepare {time.time()-t0:.1f}s "
      f"phases={ {kk: round(vv,1) for kk, vv in index.phase_times_.items()} }",
      flush=True)

# step-count instrumentation: drive search_block directly on the bf16 path
# the index uses (search_dtype bfloat16 -> rerank)
Xs = index._X.astype(jnp.bfloat16)
qb = queries.astype(jnp.bfloat16)
adj = index._search_graph
tree = index._search_tree
rowwise = _resolve_rowwise_metric("sqeuclidean", {})

for bs in (8192, 4096, 2048):
    blk = qb[:bs]
    stepss = []
    t0 = time.time()
    for s in range(0, nq, bs):
        bq = qb[s : s + bs]
        if bq.shape[0] < bs:
            break
        _, _, steps = search_mod.search(
            bq, Xs, adj, tree, rng.derive(index._key, rng.ROLE_SEARCH, 2),
            k=k, epsilon=0.25, beam_width=48, dist_rowwise=rowwise,
            batch_size=bs, return_device=True, _return_steps=True,
        )
        stepss.append(int(steps))
    dt = time.time() - t0
    # second pass warm
    t0 = time.time()
    for s in range(0, nq, bs):
        bq = qb[s : s + bs]
        if bq.shape[0] < bs:
            break
        r = search_mod.search(
            bq, Xs, adj, tree, rng.derive(index._key, rng.ROLE_SEARCH, 2),
            k=k, epsilon=0.25, beam_width=48, dist_rowwise=rowwise,
            batch_size=bs, return_device=True,
        )
        jax.block_until_ready(r[0])
    dt2 = time.time() - t0
    nfull = (nq // bs) * bs
    print(f"bs={bs}: steps/batch={stepss} qps_warm={nfull/dt2:.0f}",
          flush=True)

# end-to-end index.query sweep (rerank etc. included)
for beam, eps, E in ((48, 0.25, 2), (48, 0.25, 4), (48, 0.25, 8),
                     (32, 0.25, 2), (48, 0.4, 2)):
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
    print(f"beam={beam} eps={eps} E={E}: qps={qps:.0f} recall={r:.4f}",
          flush=True)
