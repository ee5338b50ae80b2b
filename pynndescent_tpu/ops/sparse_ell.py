"""True sparse kernels: padded-ELL rows for wide feature spaces.

Completes the sparse story beyond the densification threshold
(ops/sparse.py): when ``n_features`` is too large to materialise, CSR rows
are packed into fixed-width ELL form and distances are computed directly on
the sparse representation — the TPU equivalent of the reference's
merge-based CSR-row primitives (reference sparse.py:21-941,
``sparse_sum/diff/dot_product`` etc.).

Representation: each row packs to one f32 vector of width ``2 * nnz_max``:
``[indices (as f32, -1 padding) | values (0 padding)]``. Packing indices and
values into a single trailing axis makes sparse rows *opaque* to every
existing kernel — gathers, candidate pools, diversification and beam search
all move rows around without knowing they are sparse; only the metric
closure splits the axis.

The sparse dot product is one sort per pair family: concatenate the two
index lists with a side tag in the low bit (``idx*2 + side``), sort, and
multiply adjacent entries whose keys differ by exactly 1 — a matching index
pair from opposite sides. Everything stays fixed-shape and batched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pynndescent_tpu.ops import distances as dst

# f32 can represent integers exactly up to 2^24 — enough for any realistic
# feature count; the packing below would silently corrupt beyond that.
MAX_FEATURES_ELL = 1 << 24


def csr_to_ell_packed(csr, nnz_max: int | None = None):
    """Pack a scipy CSR matrix into [n, 2*nnz_max] f32 (indices | values)."""
    csr = csr.tocsr()
    n, d = csr.shape
    if d > MAX_FEATURES_ELL:
        raise ValueError(f"n_features {d} exceeds ELL index capacity {MAX_FEATURES_ELL}")
    counts = np.diff(csr.indptr)
    if nnz_max is None:
        nnz_max = max(1, int(counts.max()))
    if counts.max() > nnz_max:
        raise ValueError(f"row nnz {counts.max()} exceeds nnz_max {nnz_max}")
    inds = np.full((n, nnz_max), -1.0, np.float32)
    vals = np.zeros((n, nnz_max), np.float32)
    for i in range(n):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        inds[i, : hi - lo] = csr.indices[lo:hi]
        vals[i, : hi - lo] = csr.data[lo:hi]
    return np.concatenate([inds, vals], axis=1)


def _split(packed, nnz):
    return packed[..., :nnz], packed[..., nnz:]


def _sorted_keyvals(x_packed, y_packed, nnz: int):
    """Sort the union of both rows' (index, value) entries by a tagged key.

    Keys are int32 ``idx*2 + side`` (x entries even, y entries odd): f32
    indices are exact up to 2^24 and converting to int32 before the *2+side
    arithmetic keeps every key exact (f32 keys silently collide for
    idx >= 2^23). Padding maps beyond any real key."""
    xi, xv = _split(x_packed, nnz)
    yi, yv = _split(y_packed, nnz)
    xi, xv, yi, yv = jnp.broadcast_arrays(xi, xv, yi, yv)
    big = jnp.int32(2 * MAX_FEATURES_ELL + 8)
    kx = jnp.where(xi >= 0, xi.astype(jnp.int32) * 2, big)
    ky = jnp.where(yi >= 0, yi.astype(jnp.int32) * 2 + 1, big)
    keys = jnp.concatenate([kx, ky], axis=-1)
    vals = jnp.concatenate([xv, yv], axis=-1)
    return jax.lax.sort((keys, vals), num_keys=1, dimension=-1)


def sparse_dot(x_packed, y_packed, nnz: int):
    """<x, y> over packed ELL rows; broadcasts over leading axes."""
    sk, sv = _sorted_keyvals(x_packed, y_packed, nnz)
    match = (sk[..., 1:] - sk[..., :-1]) == 1
    even = (sk[..., :-1] % 2) == 0
    prod = jnp.where(match & even, sv[..., 1:] * sv[..., :-1], 0.0)
    return jnp.sum(prod, axis=-1)


def _sq_norm(packed, nnz):
    _, v = _split(packed, nnz)
    return jnp.sum(v * v, axis=-1)


def make_ell_metric(metric: str, nnz: int):
    """Batched metric over packed ELL rows, signature-compatible with the
    framework's custom-callable metrics (f(x, y) over [..., 2*nnz])."""

    if metric in ("euclidean", "l2"):
        def fn(x, y):
            d2 = _sq_norm(x, nnz) + _sq_norm(y, nnz) - 2.0 * sparse_dot(x, y, nnz)
            return jnp.sqrt(jnp.maximum(d2, 0.0))
    elif metric == "sqeuclidean":
        def fn(x, y):
            return jnp.maximum(
                _sq_norm(x, nnz) + _sq_norm(y, nnz) - 2.0 * sparse_dot(x, y, nnz), 0.0
            )
    elif metric == "cosine":
        def fn(x, y):
            num = sparse_dot(x, y, nnz)
            nx = _sq_norm(x, nnz)
            ny = _sq_norm(y, nnz)
            both_zero = (nx == 0.0) & (ny == 0.0)
            one_zero = (nx == 0.0) | (ny == 0.0)
            val = 1.0 - num / jnp.sqrt(jnp.where(one_zero, 1.0, nx * ny))
            return jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, val))
    elif metric == "alternative_cosine":
        def fn(x, y):
            num = sparse_dot(x, y, nnz)
            nx = _sq_norm(x, nnz)
            ny = _sq_norm(y, nnz)
            both_zero = (nx == 0.0) & (ny == 0.0)
            bad = ((nx == 0.0) | (ny == 0.0) | (num <= 0.0)) & ~both_zero
            val = jnp.log2(
                jnp.sqrt(jnp.maximum(nx * ny, dst.FLOAT32_EPS))
                / jnp.where(num > 0.0, num, 1.0)
            )
            return jnp.where(both_zero, 0.0, jnp.where(bad, dst.FLOAT32_MAX, val))
    elif metric in ("dot", "inner_product"):
        def fn(x, y):
            num = sparse_dot(x, y, nnz)
            if metric == "dot":
                return jnp.where(num <= 0.0, 1.0, 1.0 - num)
            return -num
    elif metric in ("manhattan", "l1", "taxicab"):
        # |x - y| = |x| + |y| - 2*sum_match min-overlap correction requires the
        # matched values; reuse the sort: sum |v| over all, minus matched
        # |xv| + |yv| - |xv - yv| on matches
        def fn(x, y):
            _, xv = _split(x, nnz)
            _, yv = _split(y, nnz)
            xv, yv = jnp.broadcast_arrays(xv, yv)
            sk, sv = _sorted_keyvals(x, y, nnz)
            match = ((sk[..., 1:] - sk[..., :-1]) == 1) & ((sk[..., :-1] % 2) == 0)
            a = sv[..., :-1]
            b = sv[..., 1:]
            corr = jnp.where(match, jnp.abs(a) + jnp.abs(b) - jnp.abs(a - b), 0.0)
            return jnp.sum(jnp.abs(xv), axis=-1) + jnp.sum(jnp.abs(yv), axis=-1) - jnp.sum(corr, axis=-1)
    else:
        raise NotImplementedError(
            f"metric '{metric}' is not available on the padded-ELL sparse path yet"
        )
    fn.__name__ = f"ell_{metric}"
    return fn


# fast-alternative substitution for the ELL path (mirrors
# fast_distance_alternatives for the supported metrics)
ELL_ALTERNATIVES = {
    "euclidean": ("sqeuclidean", np.sqrt),
    "l2": ("sqeuclidean", np.sqrt),
    "cosine": ("alternative_cosine", dst.correct_alternative_cosine),
}
