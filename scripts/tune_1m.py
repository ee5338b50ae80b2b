"""1M tuning sweep: build-quality levers (delta, max_candidates, leaf cap)
and query levers (epsilon, beam) against the on-device exact oracle.

Usage: python scripts/tune_1m.py [n] [config ...]
Configs: base, delta4, cand20, cand30, leaf96, all strings.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_1m import exact_knn_device, make_data_device, recall_of  # noqa: E402
from pynndescent_tpu import NNDescent  # noqa: E402

CONFIGS = {
    # kwargs for NNDescent; "k" overrides the BUILD graph degree (queries
    # and recall stay @10 — the standard ann-benchmarks operating point
    # builds a higher-degree graph than the query k)
    "base": {},
    "delta4": {"delta": 1e-4},
    "cand20": {"max_candidates": 20},
    "cand30": {"max_candidates": 30},
    "cand20d4": {"max_candidates": 20, "delta": 1e-4},
    "k20": {"k": 20},
    "k30": {"k": 30},
    "k20d4": {"k": 20, "delta": 1e-4},
    # locality-windowed descent (ops/nndescent.py): None = full-table joins,
    # "auto" = default windows at n >= 400k, dicts = explicit schedules
    "noloc": {"locality": None},
    "k20noloc": {"k": 20, "locality": None},
    "loc128": {"locality": {"window": 131072}},
    "loc64p3": {"locality": {"window": 65536, "phases": 3}},
    "locg4": {"locality": {"window": 65536, "global_iters": 4}},
    "k20loc": {"k": 20},  # locality auto-on at 1M
    "k16loc": {"k": 16},
    "k20locg4": {"k": 20, "locality": {"window": 65536, "global_iters": 4}},
    # query-side: prune the k20-built search graph harder so beam gathers
    # stay deg~20-15 wide (qps lever; recall comes from the k20 graph)
    "k20p10": {"k": 20, "pruning_degree_multiplier": 1.0},
    "k20p075": {"k": 20, "pruning_degree_multiplier": 0.75},
    # cheaper locality schedules (validated on the CPU testbed)
    "k20fast": {"k": 20, "n_iters": 10,
                "locality": {"window": 65536, "phases": 2, "phase_iters": 5,
                             "global_iters": 2}},
    "k20fastp10": {"k": 20, "n_iters": 10, "pruning_degree_multiplier": 1.0,
                   "locality": {"window": 65536, "phases": 2, "phase_iters": 5,
                                "global_iters": 2}},
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    names = sys.argv[2:] or ["base", "delta4", "cand20"]
    nq, k, d = 10_000, 10, 128

    train, queries = make_data_device(n, nq, d)
    np.asarray(train[-1, -1])
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.choice(n, 512, replace=False).astype(np.int32))
    true_b = np.asarray(exact_knn_device(train[sample], train, k))
    qsample = jnp.asarray(rs.choice(nq, 1024, replace=False).astype(np.int32))
    true_q = np.asarray(exact_knn_device(queries[qsample], train, k))
    print("oracles ready", flush=True)

    for name in names:
        kw = dict(CONFIGS[name])
        build_k = kw.pop("k", k)
        t0 = time.time()
        index = NNDescent(train, n_neighbors=build_k, random_state=42, **kw)
        index.prepare()
        np.asarray(index._search_graph[-1, -1])
        build_s = time.time() - t0
        idx = np.asarray(index._neighbor_graph[0])[np.asarray(sample)][:, :k]
        brec = recall_of(idx, true_b)
        line = f"{name}: build={build_s:.1f}s build_recall={brec:.4f}"
        for eps in (0.2, 0.3):
            t0 = time.time()
            qidx, _ = index.query(queries, k=k, epsilon=eps)
            qidx = np.asarray(qidx)
            qps = nq / (time.time() - t0)
            qrec = recall_of(qidx[np.asarray(qsample)], true_q)
            line += f" | eps{eps}: qps={qps:.0f} recall={qrec:.4f}"
        print(line, flush=True)
        del index


if __name__ == "__main__":
    main()
