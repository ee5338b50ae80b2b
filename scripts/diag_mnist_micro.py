"""Microbench the MNIST search-step components at the real shapes:
q=10240, E*deg=30, d=784, n=70k. Which of gather / distance / merge binds,
and what does einsum precision cost?"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.lax import Precision  # noqa: E402

from pynndescent_tpu.ops.neighbors import make_neighbor_state, merge_candidates  # noqa: E402

q_n, m, d, n = 10240, 30, 784, 70_000
rs = np.random.RandomState(0)
X32 = jnp.asarray(rs.randn(n, d).astype(np.float32))
X16 = X32.astype(jnp.bfloat16)
Q = jnp.asarray(rs.randn(q_n, d).astype(np.float32))
nbrs = jnp.asarray(rs.randint(0, n, (q_n, m)).astype(np.int32))


def timeit(tag, fn, *a):
    o = fn(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fn(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(f"{tag}: {dt*1e3:.2f} ms", flush=True)
    return dt


@jax.jit
def gather16(nbrs):
    return X16[nbrs]


@jax.jit
def gather32(nbrs):
    return X32[nbrs]


def dist_hi(Q, C):
    C = C.astype(jnp.float32)
    q_sq = jnp.sum(Q * Q, axis=-1)[:, None]
    c_sq = jnp.sum(C * C, axis=-1)
    qc = jnp.einsum("bd,bmd->bm", Q, C, precision=Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(q_sq + c_sq - 2.0 * qc, 0.0))


def dist_default(Q, C):
    C = C.astype(jnp.float32)
    q_sq = jnp.sum(Q * Q, axis=-1)[:, None]
    c_sq = jnp.sum(C * C, axis=-1)
    qc = jnp.einsum("bd,bmd->bm", Q, C, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(q_sq + c_sq - 2.0 * qc, 0.0))


def dist_bf16(Q, C):
    Qb = Q.astype(jnp.bfloat16)
    q_sq = jnp.sum(Q * Q, axis=-1)[:, None]
    c_sq = jnp.sum(C.astype(jnp.float32) * C.astype(jnp.float32), axis=-1)
    qc = jnp.einsum("bd,bmd->bm", Qb, C, preferred_element_type=jnp.float32)
    return jnp.sqrt(jnp.maximum(q_sq + c_sq - 2.0 * qc, 0.0))


def dist_elem(Q, C):
    diff = Q[:, None, :] - C.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


@jax.jit
def fused_hi(Q, nbrs):
    return dist_hi(Q, X16[nbrs])


@jax.jit
def fused_default(Q, nbrs):
    return dist_default(Q, X16[nbrs])


@jax.jit
def fused_bf16(Q, nbrs):
    return dist_bf16(Q, X16[nbrs])


@jax.jit
def fused_elem(Q, nbrs):
    return dist_elem(Q, X16[nbrs])


@jax.jit
def fused_elem32(Q, nbrs):
    return dist_elem(Q, X32[nbrs])


print("backend:", jax.default_backend(), flush=True)
timeit("gather bf16 [10240,30,784]", gather16, nbrs)
timeit("gather f32  [10240,30,784]", gather32, nbrs)
timeit("gather+dist HIGHEST (current)", fused_hi, Q, nbrs)
timeit("gather+dist default-f32", fused_default, Q, nbrs)
timeit("gather+dist bf16-mxu", fused_bf16, Q, nbrs)
timeit("gather+dist elementwise", fused_elem, Q, nbrs)
timeit("gather32+dist elementwise", fused_elem32, Q, nbrs)

# accuracy of the variants vs f64 ground truth on 1k rows
Qs, Cs = np.asarray(Q[:1000], np.float64), np.asarray(X32[np.asarray(nbrs[:1000])], np.float64)
true = np.sqrt(((Qs[:, None, :] - Cs) ** 2).sum(-1))
for tag, fn in (("HIGHEST", fused_hi), ("default", fused_default), ("bf16", fused_bf16)):
    got = np.asarray(fn(Q[:1000], nbrs[:1000]), np.float64)
    rel = np.abs(got - true) / np.maximum(true, 1e-9)
    print(f"{tag}: max rel err {rel.max():.2e} mean {rel.mean():.2e}", flush=True)

# merge cost at beam 48
st = make_neighbor_state(q_n, 48)
cand = nbrs
cd = jnp.asarray(rs.rand(q_n, m).astype(np.float32))


@jax.jit
def do_merge(st, cand, cd):
    st2, _ = merge_candidates(st, cand, cd)
    return st2


timeit("merge_candidates beam48 m30", do_merge, st, cand, cd)
