"""Profile _fast_forest_orders at MNIST shape (70k x 784): where do the
~5.8 s go? Time the full forest, then the level-loop pieces in isolation
(projection, scatter-add segment stats, hash coin) at representative
table sizes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pynndescent_tpu.ops import rp_trees

n, d, T = 70_000, 784, 10
rs = np.random.RandomState(0)
X = jnp.asarray(rs.randn(n, d).astype(np.float32)).astype(jnp.bfloat16)
seeds = jnp.arange(T, dtype=jnp.uint32)
leaf = 30
depth = rp_trees.forest_depth(n, leaf)
print("depth", depth, flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    out = rp_trees._fast_forest_orders(X, seeds, leaf, depth, False)
    np.asarray(out[0])  # axon: block_until_ready is unreliable, force a pull
    print(f"forest rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)

# isolate the scatter-add segment stats at three table sizes
node = jnp.asarray(rs.randint(0, 1 << 14, (T, n)), jnp.int32)
pl = jnp.asarray(rs.randn(T, n).astype(np.float32))
trow = jnp.arange(T, dtype=jnp.int32)[:, None]
vals = jnp.stack([pl, jnp.ones_like(pl)], axis=-1)


def scat(M):
    def f(node, vals):
        return jnp.zeros((T, M, 2), jnp.float32).at[trow, node % M].add(vals)

    g = jax.jit(f)
    np.asarray(g(node, vals)[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(node, vals)
    np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / 10


for M in (1 << 11, 1 << 15, 1 << 19):
    print(f"scatter-add [T,{M},2]: {scat(M)*1e3:.1f} ms/level", flush=True)


def proj():
    R = jnp.asarray(rs.randn(T, d).astype(np.float32)).astype(jnp.bfloat16)

    def f(R, X):
        return jax.lax.dot_general(
            R, X, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    g = jax.jit(f)
    np.asarray(g(R, X)[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(R, X)
    np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / 10


print(f"projection [T,{d}]x[{d},{n}]: {proj()*1e3:.1f} ms/level", flush=True)
