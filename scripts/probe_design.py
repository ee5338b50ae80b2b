"""Design probes for the 1M descent-iteration redesign, on the real TPU.

Measures, steady-state:
  1. lax.sort throughput on (i32, f32, i32) triples at update-exchange sizes
     (the owner-computes join routes ~2e8 update triples per iteration)
  2. row-gather rate from a windowed dynamic slice of the 1M table vs the
     full table (tree-order blocking keeps candidates window-local)
  3. the [b, c, d] x [b, 2c, d] batched pair-distance matmul of the
     owner-computes join

Usage: python scripts/probe_design.py [n]
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


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "reshape") and leaf.size:
                np.asarray(leaf.reshape(-1)[-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "reshape") and leaf.size:
                np.asarray(leaf.reshape(-1)[-1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = 128
    key = jax.random.PRNGKey(0)

    # ---- 1. sort throughput on update triples ----
    for m in (16_000_000, 64_000_000, 200_000_000):
        tgt = jax.random.randint(key, (m,), 0, n, dtype=jnp.int32)
        dv = jax.random.uniform(jax.random.fold_in(key, 1), (m,), jnp.float32)
        src = jax.random.randint(jax.random.fold_in(key, 2), (m,), 0, n, dtype=jnp.int32)

        @jax.jit
        def do_sort(t, dd, s):
            return jax.lax.sort((t, dd, s), num_keys=2)

        try:
            t = timeit(do_sort, tgt, dv, src)
            print(f"sort triples m={m/1e6:.0f}M: {t*1e3:.0f} ms "
                  f"({m/t/1e6:.0f}M elem/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"sort m={m/1e6:.0f}M failed: {type(e).__name__}", flush=True)
        del tgt, dv, src

    # one-key i32 sort (packed key) for comparison
    m = 64_000_000
    packed = jax.random.randint(key, (m,), 0, 1 << 30, dtype=jnp.int32)
    payload = jax.random.randint(key, (m,), 0, 1 << 30, dtype=jnp.int32)

    @jax.jit
    def do_sort1(t, s):
        return jax.lax.sort((t, s), num_keys=1)

    t = timeit(do_sort1, packed, payload)
    print(f"sort 1-key m={m/1e6:.0f}M: {t*1e3:.0f} ms ({m/t/1e6:.0f}M elem/s)",
          flush=True)
    del packed, payload

    # ---- 2. gathers: full table vs windowed slice ----
    X = jax.random.normal(jax.random.fold_in(key, 3), (n, d), jnp.float32)
    b, P = 8192, 320
    n_blocks = -(-n // b)
    W = 131072

    ids_full = jax.random.randint(jax.random.fold_in(key, 4), (n_blocks, b, P), 0, n,
                                  dtype=jnp.int32)
    ids_win = jax.random.randint(jax.random.fold_in(key, 5), (n_blocks, b, P), 0, W,
                                 dtype=jnp.int32)

    @jax.jit
    def gather_full(ids):
        def body(blk, acc):
            C = X[ids[blk]]
            return acc + jnp.sum(C[:, :, -1], axis=-1)
        return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((b,), jnp.float32))

    @jax.jit
    def gather_windowed(ids):
        def body(blk, acc):
            w0 = jnp.minimum(blk * b, n - W)
            Xw = jax.lax.dynamic_slice_in_dim(X, w0, W)
            C = Xw[ids[blk]]
            return acc + jnp.sum(C[:, :, -1], axis=-1)
        return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((b,), jnp.float32))

    t = timeit(gather_full, ids_full)
    print(f"gather full-table ({n_blocks} blocks x [{b},{P}] rows): {t*1e3:.0f} ms",
          flush=True)
    t = timeit(gather_windowed, ids_win)
    print(f"gather {W}-window     ({n_blocks} blocks x [{b},{P}] rows): {t*1e3:.0f} ms",
          flush=True)

    # ---- 2b. same gather from a 4x-smaller uint8 code table: distinguishes
    # descriptor-bound (same time) from table-size/translation-bound (faster)
    X8 = (jnp.clip(X, -4, 4) * 16 + 128).astype(jnp.uint8)

    @jax.jit
    def gather_u8(ids):
        def body(blk, acc):
            C = X8[ids[blk]]
            return acc + jnp.sum(C[:, :, -1].astype(jnp.int32), axis=-1)
        return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((b,), jnp.int32))

    t = timeit(gather_u8, ids_full)
    print(f"gather uint8 full-table ({n_blocks} blocks x [{b},{P}] rows): {t*1e3:.0f} ms",
          flush=True)
    del X8

    # ---- 3. owner-computes pair distances ----
    c = 10
    ids_c = jax.random.randint(jax.random.fold_in(key, 6), (n_blocks, b, 4 * c), 0, n,
                               dtype=jnp.int32)

    @jax.jit
    def pair_dists(ids):
        def body(blk, acc):
            C = X[ids[blk]]                      # [b, 4c, d]
            A = C[:, : 2 * c]                    # new
            sqA = jnp.sum(A * A, axis=-1)
            sqC = jnp.sum(C * C, axis=-1)
            dots = jnp.einsum("bnd,bmd->bnm", A, C,
                              preferred_element_type=jnp.float32)
            dm = sqA[:, :, None] + sqC[:, None, :] - 2.0 * dots
            return acc + jnp.sum(dm[:, :, -1], axis=-1)
        return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((b,), jnp.float32))

    t = timeit(pair_dists, ids_c)
    print(f"owner-computes gather+pairs ([{b},{4*c},{d}] -> [{b},{2*c},{4*c}]): "
          f"{t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
