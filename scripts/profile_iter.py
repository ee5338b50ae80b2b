"""Profile the parts of one descent iteration at scale on the real TPU.

Usage: python scripts/profile_iter.py [n] [d] [k]

Times, steady-state: reverse sampling (build_candidates), the join's row
gathers, the distance tiles, and the merge — separately — to locate the
per-iteration floor at n=1M (PERF_NOTES round-2: 6.2 s/iter).
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

from pynndescent_tpu.ops import nndescent as nnd_ops
from pynndescent_tpu.ops.neighbors import NeighborState, make_neighbor_state, merge_candidates
from pynndescent_tpu.utils import rng
from pynndescent_tpu.utils.transfer import to_device_chunked


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a[..., -1]) if hasattr(a, "shape") and a.size else a, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # force: pull one element of each leaf
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "shape") and leaf.size:
                np.asarray(leaf.reshape(-1)[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    c = min(60, k)
    b = 8192

    rs = np.random.RandomState(0)
    X = to_device_chunked(rs.randn(n, d).astype(np.float32))
    np.asarray(X[-1, -1])
    print(f"n={n} d={d} k={k} c={c}", flush=True)

    key = rng.state_from_seed(1)
    dist_rowwise = nnd_ops._resolve_rowwise_metric("euclidean", None)

    state = nnd_ops._jit_init_random(
        make_neighbor_state(n, k), X, rng.derive(key, 1), n_extra=k,
        dist_rowwise=dist_rowwise,
    )
    state = jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, state)

    # ---- full iteration ----
    it_fn = functools.partial(
        nnd_ops._jit_iteration,
        max_candidates=c, dist_rowwise=dist_rowwise, block_rows=b,
        hop2_new_samples=c, hop2_old_samples=max(1, c // 2),
    )
    t = timeit(lambda: it_fn(state, X, rng.derive(key, 2, 1)))
    print(f"full iteration: {t*1e3:.0f} ms", flush=True)

    # ---- candidate sampling alone ----
    samp = jax.jit(nnd_ops.build_candidates, static_argnames=("max_candidates",))
    t = timeit(lambda: samp(state, rng.derive(key, 3), max_candidates=c))
    print(f"build_candidates: {t*1e3:.0f} ms", flush=True)

    sample = samp(state, rng.derive(key, 3), max_candidates=c)

    # components of the join, over all blocks, via cut-down jits
    t_nn = max(1, (c + 1) // 2)
    t_no = max(0, c - t_nn)
    P = 2 * c + 2 * c * (t_nn + t_no) + 2 * c * max(1, c // 2)
    print(f"pool width P = {P}", flush=True)

    @jax.jit
    def pools_only(sample):
        tbl_nn = sample.hop_new[:, :t_nn]
        tbl_no = sample.hop_old[:, :t_no]
        tbl_on = sample.hop_new[:, : max(1, c // 2)]
        acc = jnp.zeros((b,), jnp.int32)

        def body(blk, acc):
            start = jnp.minimum(blk * b, n - b)
            hop_new = jax.lax.dynamic_slice_in_dim(sample.hop_new, start, b)
            hop_old = jax.lax.dynamic_slice_in_dim(sample.hop_old, start, b)
            pool = jnp.concatenate(
                [hop_new,
                 nnd_ops._slice_hop2(tbl_nn, hop_new),
                 nnd_ops._slice_hop2(tbl_no, hop_new),
                 nnd_ops._slice_hop2(tbl_on, hop_old)], axis=-1)
            return acc + jnp.sum(pool, axis=-1)

        return jax.lax.fori_loop(0, -(-n // b), body, acc)

    t = timeit(lambda: pools_only(sample))
    print(f"pool assembly (all blocks): {t*1e3:.0f} ms", flush=True)

    @jax.jit
    def pools_and_gathers(sample):
        tbl_nn = sample.hop_new[:, :t_nn]
        tbl_no = sample.hop_old[:, :t_no]
        tbl_on = sample.hop_new[:, : max(1, c // 2)]
        acc = jnp.zeros((b,), jnp.float32)

        def body(blk, acc):
            start = jnp.minimum(blk * b, n - b)
            rows = start + jnp.arange(b, dtype=jnp.int32)
            hop_new = jax.lax.dynamic_slice_in_dim(sample.hop_new, start, b)
            hop_old = jax.lax.dynamic_slice_in_dim(sample.hop_old, start, b)
            pool = jnp.concatenate(
                [hop_new,
                 nnd_ops._slice_hop2(tbl_nn, hop_new),
                 nnd_ops._slice_hop2(tbl_no, hop_new),
                 nnd_ops._slice_hop2(tbl_on, hop_old)], axis=-1)
            C = X[jnp.maximum(pool, 0)]
            Q = X[rows]
            return acc + jnp.sum(C[:, :, -1], axis=-1) + Q[:, -1]

        return jax.lax.fori_loop(0, -(-n // b), body, acc)

    t = timeit(lambda: pools_and_gathers(sample))
    print(f"pool + gathers: {t*1e3:.0f} ms", flush=True)

    @jax.jit
    def pools_gathers_dists(sample):
        tbl_nn = sample.hop_new[:, :t_nn]
        tbl_no = sample.hop_old[:, :t_no]
        tbl_on = sample.hop_new[:, : max(1, c // 2)]
        acc = jnp.zeros((b,), jnp.float32)

        def body(blk, acc):
            start = jnp.minimum(blk * b, n - b)
            rows = start + jnp.arange(b, dtype=jnp.int32)
            hop_new = jax.lax.dynamic_slice_in_dim(sample.hop_new, start, b)
            hop_old = jax.lax.dynamic_slice_in_dim(sample.hop_old, start, b)
            pool = jnp.concatenate(
                [hop_new,
                 nnd_ops._slice_hop2(tbl_nn, hop_new),
                 nnd_ops._slice_hop2(tbl_no, hop_new),
                 nnd_ops._slice_hop2(tbl_on, hop_old)], axis=-1)
            C = X[jnp.maximum(pool, 0)]
            Q = X[rows]
            dm = dist_rowwise(Q, C)
            return acc + jnp.sum(dm, axis=-1)

        return jax.lax.fori_loop(0, -(-n // b), body, acc)

    t = timeit(lambda: pools_gathers_dists(sample))
    print(f"pool + gathers + dists: {t*1e3:.0f} ms", flush=True)

    @jax.jit
    def merge_only(state, sample):
        # fabricate a pool + dist of the real width without the gathers
        tbl_nn = sample.hop_new[:, :t_nn]
        tbl_no = sample.hop_old[:, :t_no]
        tbl_on = sample.hop_new[:, : max(1, c // 2)]

        def body(blk, carry):
            st, ch = carry
            start = jnp.minimum(blk * b, n - b)
            hop_new = jax.lax.dynamic_slice_in_dim(sample.hop_new, start, b)
            hop_old = jax.lax.dynamic_slice_in_dim(sample.hop_old, start, b)
            pool = jnp.concatenate(
                [hop_new,
                 nnd_ops._slice_hop2(tbl_nn, hop_new),
                 nnd_ops._slice_hop2(tbl_no, hop_new),
                 nnd_ops._slice_hop2(tbl_on, hop_old)], axis=-1)
            dmat = (pool % 97).astype(jnp.float32) + 1.0
            dmat = jnp.where(pool < 0, jnp.inf, dmat)
            blk_state = NeighborState(
                jax.lax.dynamic_slice_in_dim(st.idx, start, b),
                jax.lax.dynamic_slice_in_dim(st.dist, start, b),
                jax.lax.dynamic_slice_in_dim(st.flag, start, b),
            )
            merged, nch = merge_candidates(blk_state, pool, dmat)
            st = NeighborState(
                jax.lax.dynamic_update_slice_in_dim(st.idx, merged.idx, start, 0),
                jax.lax.dynamic_update_slice_in_dim(st.dist, merged.dist, start, 0),
                jax.lax.dynamic_update_slice_in_dim(st.flag, merged.flag, start, 0),
            )
            return st, ch + nch

        return jax.lax.fori_loop(0, -(-n // b), body, (state, jnp.int32(0)))

    t = timeit(lambda: merge_only(state, sample))
    print(f"pool + merge (no gathers/dists): {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
