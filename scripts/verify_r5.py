"""Round-5 end-to-end verify drive: build/query/pickle on the real TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
t0 = time.time()


def tick(m):
    print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)


from pynndescent_tpu import NNDescent

tick("import done")
rs = np.random.RandomState(0)
c = rs.randn(50, 32).astype(np.float32) * 4
data = (c[rs.randint(0, 50, 5000)] + rs.randn(5000, 32)).astype(np.float32)
index = NNDescent(data, n_neighbors=10, random_state=42, verbose=True, profile=True)
tick("constructed")
idx, dist = index.neighbor_graph
tick("neighbor_graph")
print({k: round(v, 2) for k, v in index.phase_times_.items()}, flush=True)
assert (np.asarray(idx)[:, 0] == np.arange(5000)).mean() > 0.99, "self first"
q = (c[rs.randint(0, 50, 100)] + rs.randn(100, 32)).astype(np.float32)
ni, nd = index.query(q, k=5, epsilon=0.2)
ni, nd = np.asarray(ni), np.asarray(nd)
tick("query")
from sklearn.neighbors import NearestNeighbors

nn = NearestNeighbors(n_neighbors=5).fit(data)
td, ti = nn.kneighbors(q, 5)
rec = np.mean([len(np.intersect1d(ni[i], ti[i])) for i in range(100)]) / 5
print("query recall@5:", rec, flush=True)
assert rec >= 0.95, rec
de = np.linalg.norm(data[ni] - q[:, None], axis=-1)
assert np.allclose(de, nd, rtol=1e-3, atol=1e-3), np.abs(de - nd).max()
import pickle

i2 = pickle.loads(pickle.dumps(index))
n2, d2 = i2.query(q, k=5, epsilon=0.2)
assert np.array_equal(np.asarray(n2), ni)
tick("pickle round-trip")
print("verify OK: recall %.3f, distances exact, pickle stable" % rec, flush=True)
