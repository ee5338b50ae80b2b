"""Profile the 1M forest build stage-by-stage on the real chip.

Round-4 diag: forest phase measured ~80 s of the 180 s 1M build — must find
which internal stage dominates (_fast_forest_orders is per-level: one [T,d]x
[n,d] matmul, one scatter-add into [T,2^L,2], one take_along_axis, plus a
final [T,n] sort).
"""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from pynndescent_tpu.ops import rp_trees

n, d, T = 1_000_000, 128, 12
leaf_size = 60
depth = min(rp_trees.forest_depth(n, leaf_size),
            int(np.ceil(np.log2(n / leaf_size))) + 4)
print(f"n={n} d={d} T={T} depth={depth}", flush=True)

rs = np.random.RandomState(0)
centers = jnp.asarray(rs.randn(1000, d).astype(np.float32))
@functools.partial(jax.jit, static_argnames=("m",))
def gen(key, m):
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (m,), 0, 1000)
    return centers[ids] + jax.random.normal(k2, (m, d), jnp.float32)
X = gen(jax.random.PRNGKey(0), n).astype(jnp.bfloat16)
np.asarray(X[-1, -1])
seeds = jnp.arange(1, T + 1, dtype=jnp.uint32)

def tt(label, fn, *a, reps=2, **kw):
    out = None
    best = 1e9
    for r in range(reps):
        t0 = time.time()
        out = fn(*a, **kw)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[-1:])
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  {label}: {dt:.2f}s", flush=True)
    return out, best

# full forest
out, full = tt("build_forest_orders(full)", rp_trees.build_forest_orders,
               X, seeds, leaf_size, depth)

# stage probes -------------------------------------------------------------
R_bank = jax.vmap(lambda s: rp_trees._level_directions(s, depth, d))(seeds)
trow = jnp.arange(T)[:, None]
pids = jnp.arange(n, dtype=jnp.int32)

@jax.jit
def probe_matmuls(X, R_bank):
    acc = jnp.zeros((T, n), jnp.float32)
    for level in range(depth):
        acc += jax.lax.dot_general(R_bank[:, level], X, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return acc

@functools.partial(jax.jit, static_argnames=("level",))
def probe_scatter(pl, node, level):
    M = 1 << level
    vals = jnp.stack([pl, jnp.ones_like(pl)], axis=-1)
    table = jnp.zeros((T, M, 2), jnp.float32).at[trow, node].add(vals)
    return table

@jax.jit
def probe_gather(thr, node):
    return jnp.take_along_axis(thr, node, axis=1)

@jax.jit
def probe_sort(node):
    ids = jnp.broadcast_to(pids[None], (T, n))
    return jax.lax.sort((node, ids), dimension=1, num_keys=1, is_stable=True)

pl = jax.lax.dot_general(R_bank[:, 0], X, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
np.asarray(pl.ravel()[-1:])
node_hi = jax.random.randint(jax.random.PRNGKey(1), (T, n), 0, 1 << (depth - 1), dtype=jnp.int32)
np.asarray(node_hi.ravel()[-1:])

tt(f"{depth}x matmul [T,d]x[n,d]", probe_matmuls, X, R_bank)
for lv in (4, 10, depth - 1):
    tt(f"scatter-add level {lv} (M={1<<lv})", probe_scatter, pl,
       jnp.minimum(node_hi, (1 << lv) - 1), lv)
thr = jnp.zeros((T, 1 << (depth - 1)), jnp.float32)
tt(f"take_along_axis [T,n] from M={1<<(depth-1)}", probe_gather, thr, node_hi)
tt("final sort [T,n] 2-op", probe_sort, node_hi)
print(f"FULL forest best: {full:.2f}s", flush=True)
