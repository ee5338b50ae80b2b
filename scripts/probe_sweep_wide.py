"""Probe: window_topm at d=784 and d=1024 on the real TPU (the leaf-init
kernel caps d at 512; the sweep kernel's VMEM math allows 1024 at win<=1024:
slab 4 MB + dist tile 4 MB + accumulators < 16 MB scoped budget)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from pynndescent_tpu.ops import pallas_init as PI

for n, d, win, m in ((70_000, 784, 512, 32), (50_000, 1024, 512, 32),
                     (70_000, 784, 1024, 32)):
    rs = np.random.RandomState(0)
    X = jnp.asarray(rs.randn(n, d).astype(np.float32))
    try:
        t0 = time.time()
        ids, dd = PI.window_topm(X, win=win, m=m, metric="sqeuclidean")
        np.asarray(ids[-1, -1])
        cold = time.time() - t0
        t0 = time.time()
        ids, dd = PI.window_topm(X, win=win, m=m, metric="sqeuclidean")
        np.asarray(ids[-1, -1])
        warm = time.time() - t0
        # spot-check: top-1 of row 0 vs brute force inside window 0
        blk = np.asarray(X[:win])
        d0 = ((blk[0] - blk) ** 2).sum(1)
        d0[0] = np.inf
        ok = int(np.asarray(ids)[0, 0]) == int(np.argmin(d0))
        print(f"n={n} d={d} win={win}: cold {cold:.2f}s warm {warm:.2f}s "
              f"top1-ok={ok}", flush=True)
    except Exception as e:
        print(f"n={n} d={d} win={win}: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    del X
