"""1M x 128 single-chip measurement harness (north-star workload).

Usage: python scripts/bench_1m.py [n] [phase]
  n      points (default 1_000_000)
  phase  "build" | "query" | "all" (default all)

Everything — data generation AND the exact-kNN oracle — runs ON DEVICE:
the tunneled dev setup uploads at ~2 MB/s, so shipping a 512 MB matrix
(or pulling it back for sklearn) would swamp the measurement. The oracle
is a blocked [sample, n] distance matmul + top_k on the MXU.
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

from pynndescent_tpu import NNDescent


def make_data_device(n, nq, d, n_centers=1000, seed=42):
    """Clustered float32 data generated on device (centers are the only
    host->device transfer: n_centers x d floats)."""
    rs = np.random.RandomState(seed)
    centers = jnp.asarray(rs.randn(n_centers, d).astype(np.float32) * 5)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(key, m):
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (m,), 0, n_centers)
        return centers[ids] + jax.random.normal(k2, (m, d), jnp.float32)

    train = gen(jax.random.PRNGKey(seed), n)
    queries = gen(jax.random.PRNGKey(seed + 1), nq)
    return train, queries


def make_latent_data_device(n, nq, d, dz=16, n_centers=1000, seed=42,
                            noise=0.1):
    """Low-intrinsic-dimension generator: dz-d clustered latents embedded
    into d dims by an orthonormal frame + ambient noise. Matches real ANN
    datasets (SIFT-1M intrinsic dim ~10-15); shared by the 1M diagnostics
    and bench.py's run_1m_workload so experiments can't drift apart."""
    rs = np.random.RandomState(seed)
    centers_z = jnp.asarray(rs.randn(n_centers, dz).astype(np.float32) * 5)
    W = jnp.asarray(np.linalg.qr(rs.randn(d, dz))[0].T.astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(key, m):
        k1, k2, k3 = jax.random.split(key, 3)
        ids = jax.random.randint(k1, (m,), 0, n_centers)
        z = centers_z[ids] + jax.random.normal(k2, (m, dz), jnp.float32)
        return z @ W + noise * jax.random.normal(k3, (m, d), jnp.float32)

    train = gen(jax.random.PRNGKey(seed), n)
    queries = gen(jax.random.PRNGKey(seed + 1), nq)
    return train, queries


@functools.partial(jax.jit, static_argnames=("k", "block"))
def exact_knn_device(Q, X, k, block=262144):
    """Exact kNN of Q against X by blocked sqeuclidean + running top-k."""
    m = Q.shape[0]
    n = X.shape[0]
    block = min(block, n)
    q_sq = jnp.sum(Q * Q, axis=1)[:, None]
    n_blocks = -(-n // block)

    def body(blk, carry):
        bd, bi = carry
        s0 = blk * block
        start = jnp.minimum(s0, n - block)
        Xb = jax.lax.dynamic_slice_in_dim(X, start, block)
        ids = start + jnp.arange(block, dtype=jnp.int32)
        d2 = q_sq + jnp.sum(Xb * Xb, axis=1)[None, :] - 2.0 * jnp.matmul(
            Q, Xb.T, precision=jax.lax.Precision.HIGHEST
        )  # default (bf16) MXU precision shuffles near-tie ranks
        # the clamped final block overlaps the previous one; rows already
        # seen must not occupy a second top-k slot
        d2 = jnp.where(ids[None, :] >= s0, d2, jnp.inf)
        cat_d = jnp.concatenate([bd, d2], axis=1)
        cat_i = jnp.concatenate([bi, jnp.broadcast_to(ids[None], d2.shape)], axis=1)
        neg, pos = jax.lax.top_k(-cat_d, k)
        return -neg, jnp.take_along_axis(cat_i, pos, axis=1)

    bd = jnp.full((m, k), jnp.inf, jnp.float32)
    bi = jnp.full((m, k), -1, jnp.int32)
    bd, bi = jax.lax.fori_loop(0, n_blocks, body, (bd, bi))
    return bi


def recall_of(idx_rows, true_rows):
    k = true_rows.shape[1]
    return float(
        np.mean([
            len(np.intersect1d(idx_rows[i][idx_rows[i] >= 0], true_rows[i])) / k
            for i in range(len(true_rows))
        ])
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    phase = sys.argv[2] if len(sys.argv) > 2 else "all"
    nq, k, d = 10_000, 10, 128

    t0 = time.time()
    train, queries = make_data_device(n, nq, d)
    np.asarray(train[-1, -1])
    print(f"device gen: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    index = NNDescent(train, n_neighbors=k, random_state=42, verbose=True)
    index.prepare()
    np.asarray(index._search_graph[-1, -1])
    build_s = time.time() - t0
    print(f"BUILD: {build_s:.1f}s", flush=True)

    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.choice(n, 512, replace=False).astype(np.int32))
    true_b = np.asarray(exact_knn_device(train[sample], train, k))
    idx = np.asarray(index._neighbor_graph[0])[np.asarray(sample)]
    print(f"build recall@10 (512 sample): {recall_of(idx, true_b):.4f}", flush=True)

    if phase == "build":
        return

    qsample = jnp.asarray(rs.choice(nq, 1024, replace=False).astype(np.int32))
    true_q = np.asarray(exact_knn_device(queries[qsample], train, k))
    for epsilon in (0.1, 0.2, 0.3):
        qidx = None
        qps = 0.0
        for _ in range(3):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=epsilon)
            qidx = np.asarray(qidx)
            qps = max(qps, nq / (time.time() - t0))
        qrec = recall_of(qidx[np.asarray(qsample)], true_q)
        print(f"eps={epsilon}: qps={qps:.0f} recall={qrec:.4f}", flush=True)


if __name__ == "__main__":
    main()
