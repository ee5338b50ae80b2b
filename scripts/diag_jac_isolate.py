"""Isolate the sparse-jaccard recall collapse: proxy ceiling vs internal
graph quality vs query pipeline, at 5k rows on CPU."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_tfidf_data
from pynndescent_tpu import NNDescent
from pynndescent_tpu.ops import sketch as sketch_ops

n, nq, d, nnz, k = 5000, 300, 100_000, 64, 10
train, queries = make_tfidf_data(n, nq, d, nnz, seed=47)


def jac(Q, T):
    Qb = (Q != 0).astype(np.float32)
    Tb = (T != 0).astype(np.float32)
    inter = np.asarray((Qb @ Tb.T).todense())
    u = np.asarray(Qb.sum(1)) + np.asarray(Tb.sum(1)).reshape(1, -1) - inter
    return 1.0 - inter / np.maximum(u, 1.0)


D_true = jac(queries, train)
true10 = np.argsort(D_true, axis=1, kind="stable")[:, :k]

index = NNDescent(train, metric="jaccard", n_neighbors=k, random_state=49)
print("sketch cfg:", index._sketch, flush=True)

sig_t = sketch_ops.minhash_sketch_csr(
    train.tocsr(), index._sketch["h"], index._sketch["seed"]
)
sig_q = sketch_ops.minhash_sketch_csr(
    queries.tocsr(), index._sketch["h"], index._sketch["seed"]
)
D_proxy = np.empty((nq, n), np.float32)
for s in range(0, nq, 50):
    D_proxy[s : s + 50] = (sig_q[s : s + 50, None, :] != sig_t[None, :, :]).mean(-1)
proxy10 = np.argsort(D_proxy, axis=1, kind="stable")[:, :k]
ceil = np.mean([len(np.intersect1d(proxy10[i], true10[i])) for i in range(nq)]) / k
print(f"exact-proxy-top10 vs true10: {ceil:.3f}", flush=True)

gi, gd = index._graph_host()
rs = np.random.RandomState(0)
samp = rs.choice(n, 200, replace=False)
D_pp = np.empty((200, n), np.float32)
for j, s in enumerate(samp):
    D_pp[j] = (sig_t[s][None, :] != sig_t).mean(-1)
D_pp[np.arange(200), samp] = np.inf
pg10 = np.argsort(D_pp, axis=1, kind="stable")[:, :k]
g_rec = np.mean(
    [
        len(np.intersect1d(gi[s][gi[s] >= 0][: k + 1], np.append(pg10[j], s)))
        for j, s in enumerate(samp)
    ]
) / (k + 1)
print(f"internal graph vs exact-proxy graph: {g_rec:.3f}", flush=True)

ni, nd = index.query(queries, k=k, epsilon=0.3)
ni = np.asarray(ni)
q_rec_true = np.mean([len(np.intersect1d(ni[i], true10[i])) for i in range(nq)]) / k
q_rec_proxy = np.mean([len(np.intersect1d(ni[i], proxy10[i])) for i in range(nq)]) / k
print(
    f"query vs true10: {q_rec_true:.3f}   query vs exact-proxy10: {q_rec_proxy:.3f}",
    flush=True,
)

ai, ad = index.neighbor_graph
D_tt = jac(train[samp], train)
D_tt[np.arange(200), samp] = np.inf
tg10 = np.argsort(D_tt, axis=1, kind="stable")[:, :k]
ag = np.mean(
    [len(np.intersect1d(ai[s][1 : k + 1], tg10[j])) for j, s in enumerate(samp)]
) / k
print(f"API graph vs true jaccard graph: {ag:.3f}", flush=True)
