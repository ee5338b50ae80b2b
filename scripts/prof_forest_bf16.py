"""Why does the index's forest phase cost 22 s at 1M when prof_forest_v2
measured 7.35 s warm? Difference under test: the index feeds the forest
builder bfloat16 rows (models/nndescent.py split_X cast); this times the
same builder at f32 vs bf16, plus the cast itself."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools

import jax.numpy as jnp

from pynndescent_tpu.ops import rp_trees

n, d, T, leaf_size = 1_000_000, 128, 12, 60
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
depth = rp_trees.forest_depth(n, leaf_size)

for name, Xv in (("f32", X), ("bf16", X.astype(jnp.bfloat16))):
    np.asarray(Xv[-1, -1].astype(jnp.float32))
    for rep in range(2):
        t0 = time.time()
        out = rp_trees.build_forest_orders(Xv, seeds, leaf_size, depth)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[-1:])
        print(f"{name} rep {rep}: {time.time() - t0:.2f}s", flush=True)
