"""Feature-hash sketching: the TPU-native proxy path for wide sparse data.

The reference computes exact sparse distances inside the NN-descent join
(`/root/reference/pynndescent/sparse.py:21-941`) because merge-based CSR row
intersection is cheap on a CPU. On TPU the equivalent (a tagged sort per
candidate pair, `ops/sparse_ell.py`) is VPU sort-bound: the join evaluates
O(n * max_candidates^2) pair distances per iteration and every one costs a
width-2*nnz sort, while the dense path amortises the same pairs into MXU
matmuls. Measured on the bench TF-IDF workload (50k docs x 100k features,
nnz 64) the exact-ELL build is ~4x *slower* than the CPU reference.

The TPU-first formulation mirrors the reference's own ``proxy_distances``
design (`/root/reference/pynndescent/distances.py:2190-2239`: build/search
under a cheap order-preserving proxy, exact rerank on output): project each
sparse row into a dense h-dim space by signed feature hashing

    S[i, h1(f) % h] += sign(h2(f)) * x[i, f]

which preserves inner products and norms in expectation (collision noise
O(|x||y|/sqrt(h)) — the standard hashing-trick estimator). Build, trees,
search graph, and beam search then all run on the dense MXU path over S;
every *returned* distance (neighbor_graph and query results) is recomputed
exactly from the packed-ELL rows, so the proxy is invisible in the API
except as a recall/speed trade tuned by ``h``.

Metric mapping: cosine/dot/euclidean-family sketch their values directly
(hashing preserves <x,y> and |x-y|^2). Set metrics (jaccard/hamming/dice/
russellrao/sokal_sneath/matching/kulsinski/rogers_tanimoto) instead use a
**minhash value signature**: h independent min-wise hashes of the support,
with internal metric ``hamming`` over the signature — the exact-compare
estimator has variance J(1-J)/h per pair (vs the (1-J^2)/h of any
dot-product sketch of the same width), which matters enormously at the
small Jaccard similarities real sparse corpora exhibit. Exact rerank
restores the true metric's ordering within the over-fetched candidate set
either way. Metrics with no order-compatible dense proxy (KL, hellinger,
canberra, ...) stay on the exact ELL path.
"""

from __future__ import annotations

import numpy as np

# metric -> (internal dense metric for the sketch space, binarize values?)
SKETCH_METRICS = {
    "cosine": ("cosine", False),
    "dot": ("dot", False),
    "euclidean": ("euclidean", False),
    "l2": ("euclidean", False),
    "sqeuclidean": ("sqeuclidean", False),
}

# Set metrics: all monotone in |x ∩ y| for near-constant row nnz, so a
# Jaccard-ordering proxy orders them too; the exact rerank fixes the rest.
MINHASH_METRICS = frozenset(
    {
        "jaccard",
        "hamming",
        "dice",
        "matching",
        "kulsinski",
        "rogers_tanimoto",
        "russellrao",
        "sokal_sneath",
        "sokal_michener",
    }
)

DEFAULT_H = 1024
DEFAULT_H_MINHASH = 256


def resolve(sparse_sketch, metric, n_features):
    """Resolve the ``sparse_sketch`` constructor kwarg to a config dict or
    None (exact ELL path). ``"auto"`` enables sketching for supported
    metrics; an int picks the sketch width; None/False disables."""
    if sparse_sketch in (None, False):
        return None
    is_minhash = isinstance(metric, str) and metric in MINHASH_METRICS
    if not is_minhash and (not isinstance(metric, str) or metric not in SKETCH_METRICS):
        if sparse_sketch == "auto":
            return None
        raise ValueError(
            f"sparse_sketch is not supported for metric {metric!r}; "
            f"supported: {sorted(SKETCH_METRICS) + sorted(MINHASH_METRICS)}"
        )
    if sparse_sketch == "auto":
        h = DEFAULT_H_MINHASH if is_minhash else DEFAULT_H
    else:
        h = int(sparse_sketch)
        if h < 16:
            raise ValueError(f"sparse_sketch width must be >= 16, got {h}")
    if is_minhash:
        # signature width is a sample count, not a feature projection —
        # never clamp it to n_features
        return {"kind": "minhash", "h": h, "internal": "hamming", "binarize": True}
    internal, binarize = SKETCH_METRICS[metric]
    h = min(h, n_features)
    return {"kind": "hash", "h": h, "internal": internal, "binarize": binarize}


def _hash_features(feat_idx, seed):
    """splitmix64 of (feature index, seed) -> uint64; deterministic across
    processes (no Python hash randomization)."""
    offset = np.uint64((0x9E3779B97F4A7C15 * (int(seed) + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = feat_idx.astype(np.uint64) + offset
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def sketch_csr(csr, h, seed=0, binarize=False):
    """Project a CSR matrix into a dense [n, h] float32 sketch by signed
    feature hashing. Host-side numpy: O(nnz) scatter-adds via a CSR->dense
    product, negligible next to the device build it feeds."""
    from scipy import sparse as sp

    n = csr.shape[0]
    idx = np.asarray(csr.indices, dtype=np.int64)
    codes = _hash_features(idx, seed)
    bucket = ((codes >> np.uint64(32)) % np.uint64(h)).astype(np.int64)
    sign = 1.0 - 2.0 * (codes & np.uint64(1)).astype(np.float32)
    vals = (
        np.ones_like(sign)
        if binarize
        else np.asarray(csr.data, dtype=np.float32)
    )
    rows = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(csr.indptr).astype(np.int64)
    )
    out = sp.coo_matrix(
        (vals * sign, (rows, bucket)), shape=(n, h)
    ).toarray()
    return np.ascontiguousarray(out, dtype=np.float32)


def _minhash_block(idx_block, h, seed):
    """[b, nnz] int32 feature ids (pad -1) -> [b, h] f32 minhash values.

    One murmur3-fmix32 per (feature, hash-slot) pair, minimum over the row's
    support. The returned value keeps 24 high bits so float32 represents it
    exactly (hamming's `!=` compare must be collision-exact)."""
    import jax.numpy as jnp

    pad = idx_block < 0
    f = idx_block.astype(jnp.uint32)
    t = jnp.arange(h, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9) + jnp.uint32(
        (int(seed) * 0x85EBCA6B + 1) & 0xFFFFFFFF
    )
    z = f[:, :, None] ^ t[None, None, :]
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    z = jnp.where(pad[:, :, None], jnp.uint32(0xFFFFFFFF), z)
    mn = jnp.min(z, axis=1)
    return (mn >> 8).astype(jnp.float32)


def minhash_sketch_csr(csr, h, seed=0):
    """Minhash value signature of a CSR matrix's binary support: [n, h]
    float32 where entry t is the h-th min-wise hash of the row's feature
    set. P(sig_x[t] == sig_y[t]) = Jaccard(x, y) (up to 2^-24 collisions),
    so internal metric ``hamming`` over signatures estimates 1 - J with
    variance J(1-J)/h. Computed on device in row blocks (the hash grid is
    O(n * nnz * h) integer ops — VPU work, trivial next to the build)."""
    import functools

    import jax
    import jax.numpy as jnp

    csr = csr.tocsr()
    n = csr.shape[0]
    counts = np.diff(csr.indptr)
    nnz_max = max(1, int(counts.max(initial=1)))
    inds = np.full((n, nnz_max), -1, np.int32)
    rows = np.repeat(np.arange(n), counts)
    cols = np.arange(len(csr.indices)) - np.repeat(csr.indptr[:-1], counts)
    inds[rows, cols] = csr.indices

    block_fn = jax.jit(functools.partial(_minhash_block, h=h, seed=seed))
    b = max(1, (1 << 24) // max(nnz_max * h, 1))  # ~64M u32 lanes per block
    out = np.empty((n, h), np.float32)
    for s in range(0, n, b):
        blk = inds[s : s + b]  # ragged tail retraces once; cheap
        out[s : s + blk.shape[0]] = np.asarray(block_fn(jnp.asarray(blk)))
    return out
