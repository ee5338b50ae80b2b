"""Probe 1M build recall@10 vs graph degree k and candidate budgets, using
the raw descent driver (controlled 2-hop budgets, bounded memory).

Usage: python scripts/probe_k.py [n] [spec ...]
spec = k:maxcand:h2n:h2o:iters  e.g. 20:20:10:5:12
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_1m import exact_knn_device, make_data_device, recall_of  # noqa: E402
from pynndescent_tpu.ops import nndescent as nnd_ops  # noqa: E402
from pynndescent_tpu.ops import rp_trees  # noqa: E402
from pynndescent_tpu.utils import rng  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    specs = sys.argv[2:] or ["10:10:10:5:20", "20:20:10:5:20"]
    d = 128
    kq = 10

    train, _ = make_data_device(n, 1000, d)
    np.asarray(train[-1, -1])
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.choice(n, 512, replace=False).astype(np.int32))
    true_b = np.asarray(exact_knn_device(train[sample], train, kq))
    print("oracle ready", flush=True)

    key = rng.state_from_seed(42)
    leaf = rp_trees.default_leaf_size(kq)
    seeds = np.arange(rp_trees.default_n_trees(n), dtype=np.uint32)
    t0 = time.time()
    forest = rp_trees.build_forest_orders(
        train, jnp.asarray(seeds), leaf, rp_trees.forest_depth(n, leaf)
    )
    jax.block_until_ready(forest[0])
    np.asarray(forest[0][0, :1])
    print(f"forest: {time.time()-t0:.1f}s", flush=True)

    for spec in specs:
        k, c, h2n, h2o, iters = (int(x) for x in spec.split(":"))
        t0 = time.time()
        idx, dist = nnd_ops.nn_descent(
            train, k, key,
            metric="euclidean",
            n_iters=iters,
            max_candidates=c,
            hop2_new_samples=h2n,
            hop2_old_samples=h2o,
            forest=forest,
            block_rows=2048,
        )
        idx_s = np.asarray(idx[sample][:, :kq])
        build_s = time.time() - t0
        rec = recall_of(idx_s, true_b)
        print(f"{spec}: descent={build_s:.1f}s recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
