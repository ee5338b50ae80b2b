"""Time the while_loop reformulation of _fast_forest_orders at 1M on TPU:
cold-compile cost (the unrolled version cost ~140 s of XLA time) and warm
runtime (old warm floor: 6.87 s)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools
import jax.numpy as jnp
from pynndescent_tpu.ops import rp_trees

n, d, T = 1_000_000, 128, 12
leaf_size = 60
rs = np.random.RandomState(0)
centers = jnp.asarray(rs.randn(1000, d).astype(np.float32))
@functools.partial(jax.jit, static_argnames=("m",))
def gen(key, m):
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (m,), 0, 1000)
    return centers[ids] + jax.random.normal(k2, (m, d), jnp.float32)
X = gen(jax.random.PRNGKey(0), n)
np.asarray(X[-1, -1])
seeds = jnp.arange(1, T + 1, dtype=jnp.uint32)

for rep in range(3):
    t0 = time.time()
    out = rp_trees.build_forest_orders(X, seeds, leaf_size,
                                       rp_trees.forest_depth(n, leaf_size))
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[-1:])
    print(f"forest rep {rep}: {time.time() - t0:.2f}s", flush=True)

order, start, size = [np.asarray(o) for o in out]
# invariants: each tree order is a permutation; leaf windows consistent
assert all(np.array_equal(np.sort(order[t]), np.arange(n)) for t in range(T))
pos = np.arange(n)
ok = (start <= pos[None]) & (pos[None] < start + size)
assert ok.all(), "position must lie inside its leaf window"
print("leaf size: max", size.max(), "mean", size.mean())
assert size.max() <= 2 * leaf_size + 8, size.max()
print("invariants OK", flush=True)
