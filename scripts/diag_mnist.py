"""MNIST-784 diagnosis (VERDICT r5 task 3): where does the query time go,
and does uint8-quantized search + exact rerank lift the qps ceiling?

Workload = bench.py's mnist config: 70k x 784 euclidean, 10k queries,
eps 0.2, k 10. Baselines (BASELINE.md): build 25 s, 5000 qps.
Last measured (r5 probe): 5861 qps, recall 0.915, build 418 s cold.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_data  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from pynndescent_tpu import NNDescent  # noqa: E402
from pynndescent_tpu.models import search as search_ops  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
train, queries = make_data(70_000, 10_000, 784, seed=45)
k, eps = 10, 0.2

from sklearn.neighbors import NearestNeighbors  # noqa: E402

rs = np.random.RandomState(0)
sample = rs.choice(len(queries), 1000, replace=False)
nn = NearestNeighbors(n_neighbors=k).fit(train)
true_idx = nn.kneighbors(queries[sample], k, return_distance=False)


def recall(idx):
    return np.mean(
        [len(np.intersect1d(idx[s, :k], true_idx[j])) for j, s in enumerate(sample)]
    ) / k


def run(tag, **kw):
    qkw = {}
    for key_ in ("epsilon", "expansions_per_step"):
        if key_ in kw:
            qkw[key_] = kw.pop(key_)
    t0 = time.perf_counter()
    index = NNDescent(train, n_neighbors=k, random_state=46, profile=True, **kw)
    index.prepare()
    np.asarray(index._search_graph)
    build_s = time.perf_counter() - t0
    q_dev = jnp.asarray(queries)
    np.asarray(q_dev[-1, -1])
    qps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        idx, _ = index.query(q_dev, k=k, epsilon=qkw.get("epsilon", eps),
                             expansions_per_step=qkw.get("expansions_per_step", 2))
        idx = np.asarray(idx)
        qps = max(qps, len(queries) / (time.perf_counter() - t0))
    r = recall(idx)
    pt = {p: round(v, 1) for p, v in index.phase_times_.items()}
    print(f"{tag}: build {build_s:.1f}s qps {qps:.0f} recall {r:.4f} phases {pt}",
          flush=True)
    return index


idx0 = run("base (bf16 search, E=2)")

# step counts: call the search driver directly with _return_steps
from pynndescent_tpu.ops import nndescent as nnd_ops  # noqa: E402

q_dev = jnp.asarray(queries)
fn = nnd_ops._resolve_rowwise_metric("euclidean", {}, cast_candidates_f32=True)
ri, rd, steps = search_ops.search(
    q_dev, idx0._X_search, idx0._search_graph, idx0._search_tree,
    jax.random.PRNGKey(0), k=15, epsilon=eps, dist_rowwise=fn,
    _return_steps=True,
)
print("steps (beam default, search_k=15):", steps, flush=True)

run("E=1", expansions_per_step=1)
run("E=4", expansions_per_step=4)
iq = run("uint8 quantized (pbs=4 -> beam 80)", quantization="uint8")
# narrower quantized beam: search_k = 2*10 = 20 -> beam 48
q_dev = jnp.asarray(queries)
t0 = time.perf_counter()
i2, _ = iq.query(q_dev, k=k, epsilon=eps, proxy_beam_size=2)
t1 = time.perf_counter()
i2b, _ = iq.query(q_dev, k=k, epsilon=eps, proxy_beam_size=2)
qps2 = len(queries) / min(t1 - t0, time.perf_counter() - t1)
print(f"uint8 pbs=2: qps {qps2:.0f} recall {recall(np.asarray(i2b)):.4f}",
      flush=True)
