"""Microbenchmarks on the real chip: descent-iteration cost and the
DEDUP_STABLE merge variant, at 100k and (optionally) 1M.

Usage: python scripts/microbench.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp

import pynndescent_tpu.ops.neighbors as nb
from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops.neighbors import make_neighbor_state
from pynndescent_tpu.utils import rng

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_1m import make_data_device  # noqa: E402


def timeit(fn, reps=4):
    out = fn()
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "reshape") and leaf.size:
            np.asarray(leaf.reshape(-1)[-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "reshape") and leaf.size:
                np.asarray(leaf.reshape(-1)[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, k = 128, 10
    c = min(60, k)
    X, _ = make_data_device(n, 100, d)
    np.asarray(X[-1, -1])
    key = rng.state_from_seed(1)
    dist_rowwise = nnd_ops._resolve_rowwise_metric("euclidean", None)
    state = nnd_ops._jit_init_random(
        make_neighbor_state(n, k), X, rng.derive(key, 1), n_extra=k,
        dist_rowwise=dist_rowwise,
    )
    np.asarray(state.idx[-1, -1])

    block = 4096 if n > (1 << 19) else 8192
    for mode in (False, True):
        nb.DEDUP_STABLE = mode
        # fresh jit wrapper: the flag is read at trace time
        it = jax.jit(
            functools.partial(
                nnd_ops._descent_iteration,
                max_candidates=c, dist_rowwise=dist_rowwise, block_rows=block,
                hop2_new_samples=c, hop2_old_samples=max(1, c // 2),
            )
        )
        t = timeit(lambda: it(state, X, rng.derive(key, 2, 1)))
        print(f"n={n} DEDUP_STABLE={mode}: iteration {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
