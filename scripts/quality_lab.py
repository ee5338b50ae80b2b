"""CPU-reproducible testbed for the large-cluster build-quality stall.

The 1M x 128 workload stalls at ~0.78 build recall while 100k hits 0.99.
The structural difference is points-per-cluster (1000 vs 100): NN-descent
mixes slowly inside big high-dimensional clusters. Same cluster size at
50k points reproduces the stall on CPU, where experiments are free.

Usage: JAX_PLATFORMS=cpu python scripts/quality_lab.py [n] [n_centers] [spec ...]
spec = k:maxcand:h2n:h2o:iters[:reforest]
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import jax.numpy as jnp

from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops import rp_trees
from pynndescent_tpu.utils import rng


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_centers = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    specs = sys.argv[3:] or ["10:10:10:5:17"]
    d, kq = 128, 10

    rs = np.random.RandomState(42)
    centers = rs.randn(n_centers, d).astype(np.float32) * 5
    X = (centers[rs.randint(0, n_centers, n)] + rs.randn(n, d).astype(np.float32))

    # exact oracle on a sample (numpy blocked)
    sample = np.random.RandomState(0).choice(n, 256, replace=False)
    d2 = (
        np.sum(X[sample] ** 2, 1)[:, None]
        + np.sum(X**2, 1)[None, :]
        - 2.0 * X[sample] @ X.T
    )
    true_b = np.argsort(d2, axis=1, kind="stable")[:, :kq]
    print("oracle ready", flush=True)

    key = rng.state_from_seed(42)
    leaf = rp_trees.default_leaf_size(kq)
    seeds = jnp.arange(rp_trees.default_n_trees(n), dtype=jnp.uint32)
    forest = rp_trees.build_forest_orders(
        jnp.asarray(X), seeds, leaf, rp_trees.forest_depth(n, leaf)
    )
    jax.block_until_ready(forest[0])
    print("forest ready", flush=True)

    for spec in specs:
        # spec = k:c:h2n:h2o:iters[:reforest][:locW:locPhases:locIters:locGlobal]
        parts = [int(x) for x in spec.split(":")]
        k, c, h2n, h2o, iters = parts[:5]
        reforest = parts[5] if len(parts) > 5 else 0
        locality = None
        if len(parts) > 6:
            locality = {
                "window": parts[6],
                "phases": parts[7] if len(parts) > 7 else 2,
                "phase_iters": parts[8] if len(parts) > 8 else max(4, iters // 2),
                "global_iters": parts[9] if len(parts) > 9 else 2,
            }
        t0 = time.time()
        state = None
        idx, dist = nnd_ops.nn_descent(
            jnp.asarray(X), k, key,
            metric="euclidean", n_iters=iters, max_candidates=c,
            hop2_new_samples=h2n, hop2_old_samples=h2o,
            forest=forest, block_rows=4096, locality=locality,
        )
        if reforest:
            # second forest pass: fresh random trees re-seed the converged
            # graph, then more descent (beyond-reference move)
            from pynndescent_tpu.ops.neighbors import state_from_graph

            seeds2 = jnp.arange(100, 100 + reforest, dtype=jnp.uint32)
            forest2 = rp_trees.build_forest_orders(
                jnp.asarray(X), seeds2, leaf, rp_trees.forest_depth(n, leaf)
            )
            st = state_from_graph(jnp.asarray(idx), jnp.asarray(dist))
            idx, dist = nnd_ops.nn_descent(
                jnp.asarray(X), k, rng.derive(key, 77),
                metric="euclidean", n_iters=iters, max_candidates=c,
                hop2_new_samples=h2n, hop2_old_samples=h2o,
                forest=forest2, init_graph=st, block_rows=4096,
            )
        idx_s = np.asarray(idx)[sample][:, :kq]
        rec = np.mean(
            [len(np.intersect1d(idx_s[i], true_b[i])) / kq for i in range(len(sample))]
        )
        print(f"{spec}: {time.time()-t0:.0f}s recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
