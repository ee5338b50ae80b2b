"""Probe: do the Pallas kernels work at d=784 on the real TPU?

The d<=512 gates (_pallas_init_ok / _sweep_ok) cite "Mosaic compile fails
on very wide tiles" — verify whether that still holds, and at what widths,
so MNIST-784 can use the kernels (VERDICT r5 task 3).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops import pallas_init as PI

print("backend:", jax.default_backend(), jax.devices()[0])

rs = np.random.RandomState(0)

for d in (512, 640, 784, 896, 1024):
    n = 65536
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))
    # ---- window_topm ----
    try:
        t0 = time.perf_counter()
        ids, dd = PI.window_topm(X, win=1024, m=32, metric="euclidean")
        ids.block_until_ready()
        t1 = time.perf_counter()
        ids2, dd2 = PI.window_topm(X, win=1024, m=32, metric="euclidean",
                                   use_pallas=False)
        ok = bool(jnp.mean((jnp.sort(ids, axis=1) == jnp.sort(ids2, axis=1)).astype(jnp.float32)) > 0.999)
        # warm timing
        t2 = time.perf_counter()
        ids, dd = PI.window_topm(X, win=1024, m=32, metric="euclidean")
        ids.block_until_ready()
        t3 = time.perf_counter()
        print(f"d={d} window_topm: compile+run {t1-t0:.2f}s warm {t3-t2:.3f}s match={ok}")
    except Exception as e:
        print(f"d={d} window_topm FAILED: {type(e).__name__}: {str(e)[:200]}")
    # ---- leaf_allpairs ----
    try:
        cap = 64
        L = 1024
        starts = jnp.asarray(np.arange(0, n, cap, dtype=np.int32)[:L])
        sizes = jnp.full((L,), cap, jnp.int32)
        t0 = time.perf_counter()
        dl = PI.leaf_allpairs(X, starts, sizes, cap=cap, metric="euclidean")
        dl.block_until_ready()
        t1 = time.perf_counter()
        print(f"d={d} leaf_allpairs: compile+run {t1-t0:.2f}s")
    except Exception as e:
        print(f"d={d} leaf_allpairs FAILED: {type(e).__name__}: {str(e)[:200]}")
