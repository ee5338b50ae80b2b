import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pynndescent_tpu import NNDescent
import bench
t0 = time.perf_counter()
b, q, r = bench.run_1m_workload(NNDescent)
print(json.dumps({"sift1m_build_s": round(b,2), "sift1m_qps": round(q,1),
                  "sift1m_recall": round(r,4), "total_s": round(time.perf_counter()-t0,1)}),
      flush=True)
