"""Round-5 verify drive: the user-facing surface on the real TPU.

Flows (per .claude/skills/verify/SKILL.md): build -> neighbor_graph recall,
held-out query recall + distance exactness on returned ids, pickle
round-trip, transformer fit/transform, uint8 quantization, sparse CSR
cosine, error probes (unknown metric, wrong dim, 1-D data, n<k), duplicate
rows no-hang.
"""
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sklearn.neighbors import NearestNeighbors

from pynndescent_tpu import NNDescent, PyNNDescentTransformer

print("backend:", jax.default_backend(), flush=True)
rs = np.random.RandomState(0)
c = rs.randn(50, 32).astype(np.float32) * 4
data = (c[rs.randint(0, 50, 5000)] + rs.randn(5000, 32)).astype(np.float32)
qdata = (c[rs.randint(0, 50, 200)] + rs.randn(200, 32)).astype(np.float32)

t0 = time.time()
index = NNDescent(data, n_neighbors=10, random_state=42)
idx, dist = index.neighbor_graph
print(f"build {time.time()-t0:.1f}s", flush=True)
assert (idx[:, 0] == np.arange(5000)).mean() > 0.99, "self not first neighbor"
nn = NearestNeighbors(n_neighbors=10).fit(data)
tg = nn.kneighbors(data[:500], 10, return_distance=False)
rec = np.mean([len(np.intersect1d(idx[i], tg[i])) / 10 for i in range(500)])
print("graph recall:", rec, flush=True)
assert rec >= 0.95

ni, nd = index.query(qdata, k=5, epsilon=0.2)
tq = nn.kneighbors(qdata, 5, return_distance=False)
qrec = np.mean([len(np.intersect1d(ni[i], tq[i])) / 5 for i in range(200)])
print("query recall:", qrec, flush=True)
assert qrec >= 0.95
true_d = np.linalg.norm(data[ni] - qdata[:, None], axis=-1)
err = np.abs(true_d - nd).max()
print("distance exactness on returned ids: max err", err, flush=True)
assert err < 1e-3

blob = pickle.dumps(index)
index2 = pickle.loads(blob)
ni2, nd2 = index2.query(qdata, k=5, epsilon=0.2)
assert np.array_equal(ni, ni2), "pickle round-trip changed results"
print("pickle round-trip ok", flush=True)

tr = PyNNDescentTransformer(n_neighbors=5, random_state=42).fit(data)
M = tr.transform(qdata)
assert M.shape == (200, 5000) and M.nnz == 200 * 5, M.nnz
print("transformer ok nnz", M.nnz, flush=True)

qi = NNDescent(data, n_neighbors=10, random_state=42, quantization="uint8")
qni, qnd = qi.query(qdata, k=5, epsilon=0.2)
qqrec = np.mean([len(np.intersect1d(qni[i], tq[i])) / 5 for i in range(200)])
print("uint8 query recall:", qqrec, flush=True)
assert qqrec >= 0.9

from scipy import sparse

sd = sparse.random(3000, 500, density=0.05, format="csr",
                   random_state=1, dtype=np.float32)
si = NNDescent(sd, metric="cosine", n_neighbors=8, random_state=3)
sidx, _ = si.neighbor_graph
assert sidx.shape == (3000, 8)
print("sparse cosine build ok", flush=True)

# error probes
for probe, fn in (
    ("unknown metric", lambda: NNDescent(data[:100], metric="nope", n_neighbors=3)),
    ("wrong query dim", lambda: index.query(qdata[:, :8], k=3)),
    ("1-D data", lambda: NNDescent(data[:, 0], n_neighbors=3)),
):
    try:
        fn()
        print(f"PROBE FAILED TO RAISE: {probe}", flush=True)
    except Exception as e:
        print(f"probe ok ({probe}): {type(e).__name__}", flush=True)

# n < k: the reference does NOT raise — it completes with short rows and
# warns "Failed to correctly find n_neighbors" (pynndescent_.py:1262-1267)
import warnings

with warnings.catch_warnings(record=True):
    warnings.simplefilter("always")
    tiny = NNDescent(data[:5], n_neighbors=10, random_state=0)
    ti, _ = tiny.neighbor_graph
assert ti.shape == (5, 10)
print("probe ok (n<k): completes with short rows, reference parity", flush=True)

dup = np.repeat(data[:1], 300, axis=0)
t0 = time.time()
di = NNDescent(dup, n_neighbors=4, random_state=5)
_ = di.neighbor_graph
print(f"all-duplicate rows ok ({time.time()-t0:.1f}s, no hang)", flush=True)
print("VERIFY DRIVE COMPLETE", flush=True)
