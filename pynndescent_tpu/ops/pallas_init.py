"""Pallas TPU kernel: RP-tree leaf all-pairs distances for descent init.

The XLA init path (ops.nndescent.init_from_forest) gathers every point's
leaf window as scattered rows: ~n * leaf_cap row fetches per tree
(~30 GB of gather traffic on the 100k x 128 bench). But in *tree order*
every leaf is a contiguous slab of rows — the gather is an illusion of the
id-space layout. This kernel exploits that:

* grid = one program per leaf (scalar-prefetched starts/sizes);
* each program DMAs its leaf tile ``X_t[start : start+cap]`` from HBM to
  VMEM once (~cap*d*4 bytes, contiguous), computes the leaf's full
  pairwise-distance tile on the MXU from the gram matrix, and writes the
  [cap, cap] distance block plus the leaf-member id block back to
  contiguous rows of the outputs;
* total HBM traffic is ~(read X_t once + write [n, cap] distances/ids):
  ~3% of the gather formulation's.

Leaves are processed in ascending start order and the TPU grid executes
sequentially, so rows in the tail of a tile beyond the true leaf size
(``size < cap``) are later overwritten by their own leaf's program; the
only rows never rewritten are members past position ``start + cap`` of
oversized (degenerate) leaves — callers mask those via
``pos - start >= cap`` (see ops.nndescent.pallas_forest_init).

This is the analog of the reference's per-leaf all-pairs init
(generate_leaf_updates / init_rp_tree, pynndescent_.py:73-185), restructured
so the all-pairs tile is one MXU matmul and no scatter or gather exists at
all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only at compile time; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# metrics whose leaf tile derives from (gram, norms) — matches the
# internal (alternative) metrics the index build actually uses
PALLAS_INIT_METRICS = (
    "sqeuclidean",
    "euclidean",
    "l2",
    "cosine",
    "alternative_cosine",
    "dot",
    "alternative_dot",
    "inner_product",
    "alternative_inner_product",
)

_FLOAT32_MAX = np.float32(np.finfo(np.float32).max)
_FLOAT32_EPS = np.float32(np.finfo(np.float32).eps)


def _tile_distances(tile, metric: str):
    """[cap, cap] distances of a leaf tile from its gram matrix (MXU)."""
    gram = jnp.dot(
        tile, tile.T,
        precision=jax.lax.Precision.HIGHEST,  # fp32 via bf16x3 passes on MXU:
        preferred_element_type=jnp.float32,   # the cancellation form needs it
    )
    sq = jnp.diagonal(gram)  # ||x||^2 without a second pass
    if metric in ("sqeuclidean", "euclidean", "l2"):
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
        return d2 if metric == "sqeuclidean" else jnp.sqrt(d2)
    nx = jnp.sqrt(jnp.maximum(sq, 0.0))
    nn_ = nx[:, None] * nx[None, :]
    if metric == "cosine":
        both_zero = (nx[:, None] == 0.0) & (nx[None, :] == 0.0)
        one_zero = ((nx[:, None] == 0.0) | (nx[None, :] == 0.0)) & ~both_zero
        val = 1.0 - gram / jnp.maximum(nn_, _FLOAT32_EPS)
        return jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, val))
    if metric == "alternative_cosine":
        both_zero = (nx[:, None] == 0.0) & (nx[None, :] == 0.0)
        bad = ((nx[:, None] == 0.0) | (nx[None, :] == 0.0) | (gram <= 0.0)) & ~both_zero
        val = jnp.log2(
            jnp.maximum(nn_, _FLOAT32_EPS) / jnp.where(gram > 0.0, gram, 1.0)
        )
        return jnp.where(both_zero, 0.0, jnp.where(bad, _FLOAT32_MAX, val))
    if metric == "dot":
        return jnp.where(gram <= 0.0, 1.0, 1.0 - gram)
    if metric == "alternative_dot":
        return jnp.where(
            gram <= 0.0, _FLOAT32_MAX, -jnp.log2(jnp.where(gram > 0.0, gram, 1.0))
        )
    if metric == "inner_product":
        return -gram
    if metric == "alternative_inner_product":
        return jnp.where(gram <= 0.0, _FLOAT32_MAX, 1.0 / jnp.where(gram > 0.0, gram, 1.0))
    raise ValueError(f"unsupported pallas init metric '{metric}'")


def _leaf_pairs_kernel(starts_ref, sizes_ref, x_ref, d_out,
                       tile, dtile, sems, *, cap: int, out_w: int, metric: str):
    l = pl.program_id(0)
    s = starts_ref[l]
    sz = sizes_ref[l]

    cp_x = pltpu.make_async_copy(x_ref.at[pl.ds(s, cap), :], tile, sems.at[0])
    cp_x.start()
    cp_x.wait()

    # the distance tile is [cap, cap]; the output block is lane-padded to
    # out_w (HBM slices must be 128-lane aligned) — pad columns with +inf
    col = jax.lax.broadcasted_iota(jnp.int32, (cap, out_w), 1)
    d = _tile_distances(tile[:, :], metric)
    if out_w > cap:
        d = jnp.pad(d, ((0, 0), (0, out_w - cap)), constant_values=jnp.inf)
    dtile[:, :] = jnp.where(col < sz, d, jnp.inf)

    cp_d = pltpu.make_async_copy(dtile, d_out.at[pl.ds(s, cap), :], sems.at[1])
    cp_d.start()
    cp_d.wait()


@functools.partial(jax.jit, static_argnames=("cap", "metric", "interpret"))
def leaf_allpairs(X_t, leaf_starts, leaf_sizes, *, cap: int, metric: str,
                  interpret: bool = False):
    """Per-position leaf-window distances, computed leaf-at-a-time.

    X_t f32[n, d]   — data rows permuted into tree order
    leaf_starts/leaf_sizes i32[L] — compact leaf table, starts ascending,
                      padded tail with start=n, size=0
    Returns dists f32[n, cap] in TREE ORDER: row p holds distances from the
    point at tree position p to its leaf's first ``cap`` members (columns
    past the leaf size are +inf). Rows at position p with
    ``p - start >= cap`` (oversized degenerate leaves) hold stale data —
    callers must mask them. Candidate ids are the leaf-member windows,
    reconstructed by the caller from the same leaf table.
    """
    n, d = X_t.shape
    L = leaf_starts.shape[0]
    out_w = -(-cap // 128) * 128  # lane-aligned output width
    d_pad = -(-d // 128) * 128  # lane-aligned features; zero cols are
    if d_pad != d:               # no-ops for every gram-form metric here
        X_t = jnp.pad(X_t, ((0, 0), (0, d_pad - d)))
        d = d_pad
    # pad rows so a tile DMA at start near n stays in bounds
    Xp = jnp.concatenate([X_t, jnp.zeros((cap, d), X_t.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((cap, d), jnp.float32),
            pltpu.VMEM((cap, out_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dists = pl.pallas_call(
        functools.partial(_leaf_pairs_kernel, cap=cap, out_w=out_w, metric=metric),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + cap, out_w), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: later leaves
        ),                                       # overwrite spilled tails
    )(leaf_starts, leaf_sizes, Xp)
    return dists[:n, :cap]


def _window_topm_kernel(x_ref, ids_out, d_out,
                        *, win: int, m_pad: int, n_real: int, off: int,
                        metric: str):
    # blocked formulation: Pallas streams the [win, d] input slab and the
    # [win, m] output blocks through VMEM (double-buffered) — the full
    # outputs are guaranteed HBM-resident regardless of n (a pl.ANY output
    # was compiler-placed in VMEM at some n, OOMing the 16 MB scoped budget)
    s = pl.program_id(0) * win

    d = _tile_distances(x_ref[:, :].astype(jnp.float32), metric)
    col = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
    d = jnp.where(col == row, jnp.inf, d)            # self-pairs
    # zero-padded front (boundary-stagger offset) and tail rows
    d = jnp.where((col + s < off) | (col + s - off >= n_real), jnp.inf, d)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (win, m_pad), 1)

    def step(i, carry):
        d_cur, ids_acc, d_acc = carry
        cur = jnp.min(d_cur, axis=1)  # [win]
        # first column attaining the row minimum (tie-safe, no argmin op)
        amin = jnp.min(jnp.where(d_cur == cur[:, None], col, win), axis=1)
        valid = cur < jnp.inf
        ids_row = jnp.where(valid, amin + s - off, -1)
        ids_acc = jnp.where(mcol == i, ids_row[:, None], ids_acc)
        d_acc = jnp.where(mcol == i, cur[:, None], d_acc)
        d_cur = jnp.where(col == amin[:, None], jnp.inf, d_cur)
        return d_cur, ids_acc, d_acc

    ids0 = jnp.full((win, m_pad), -1, jnp.int32)
    dd0 = jnp.full((win, m_pad), jnp.inf, jnp.float32)
    _, ids_acc, d_acc = jax.lax.fori_loop(0, m_pad, step, (d, ids0, dd0))
    ids_out[:, :] = ids_acc
    d_out[:, :] = d_acc


def _window_topm_xla(X_t, *, win: int, m: int, metric: str, offset: int = 0):
    """XLA reference implementation of window_topm (CPU tests / fallback)."""
    from pynndescent_tpu.ops import distances as dists

    n, _ = X_t.shape
    n_off = n + offset
    n_pad = -(-n_off // win) * win
    Xp = jnp.pad(X_t, ((offset, n_pad - n_off), (0, 0)))
    nb = n_pad // win

    def body(w, carry):
        ids_all, d_all = carry
        s = w * win
        tile = jax.lax.dynamic_slice_in_dim(Xp, s, win)
        d = dists.pairwise(metric, tile.astype(jnp.float32))
        col = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
        d = jnp.where(
            (col == row) | (col + s < offset) | (col + s - offset >= n),
            jnp.inf,
            d,
        )
        neg, pos = jax.lax.top_k(-d, m)
        ids = jnp.where(neg > -jnp.inf, pos + s - offset, -1)
        ids_all = jax.lax.dynamic_update_slice_in_dim(ids_all, ids, s, 0)
        d_all = jax.lax.dynamic_update_slice_in_dim(d_all, -neg, s, 0)
        return ids_all, d_all

    ids_all = jnp.full((n_pad, m), -1, jnp.int32)
    d_all = jnp.full((n_pad, m), jnp.inf, jnp.float32)
    ids_all, d_all = jax.lax.fori_loop(0, nb, body, (ids_all, d_all))
    return ids_all[offset : offset + n], d_all[offset : offset + n]


@functools.partial(
    jax.jit,
    static_argnames=("win", "m", "metric", "use_pallas", "interpret", "offset"),
)
def window_topm(X_t, *, win: int, m: int, metric: str,
                use_pallas: bool = True, interpret: bool = False,
                offset: int = 0):
    """Exact top-m neighbors within fixed contiguous [win]-row windows.

    X_t [n, d] — data permuted into a tree's leaf order, so each window is a
    spatial cell. Returns (ids i32[n, m], dists f32[n, m]) where ids are
    TREE POSITIONS (global, = window_start + column) and missing entries are
    (-1, +inf).

    ``offset`` staggers the window boundaries: conceptually ``offset``
    zero-pad rows are prepended before slicing windows, so the cut points
    move from ``{0, win, 2*win, ...}`` to ``{win-offset, 2*win-offset, ...}``.
    A second sweep at ``offset=win//2`` gives every tree-order-adjacent pair
    cut by a boundary in the first sweep a window it shares — boundary
    misses are the dominant correlated-miss mode of sweep-only schedules.

    This is the gather-free reformulation of the locality-windowed descent
    join (ops.nndescent._join_block): instead of sampling ~2c^2 candidate
    pairs per row per iteration through 25 GB of random row gathers, one
    sweep DMAs each window slab HBM->VMEM once, computes the slab's full
    pairwise tile on the MXU, and keeps the exact per-row top-m. Total HBM
    traffic per sweep is read X once + write [n, m] twice — ~2% of one
    windowed join iteration at 1M x 128.
    """
    n, d = X_t.shape
    if win % 128 or win < 256:
        raise ValueError(f"win must be a multiple of 128 and >= 256, got {win}")
    if win > 1024:
        # the [win, win] distance tile lives in scoped VMEM (16 MB): 1024^2
        # f32 = 4 MB fits with headroom, 2048^2 = 16 MB OOMs the kernel
        raise ValueError(f"win must be <= 1024 (VMEM tile budget), got {win}")
    if offset and not 0 < offset < win:
        raise ValueError(f"offset must be in [0, win), got {offset}")
    m = min(m, win - 1)
    if not (HAVE_PALLAS and use_pallas):
        return _window_topm_xla(X_t, win=win, m=m, metric=metric,
                                offset=offset)
    m_pad = -(-m // 8) * 8
    d_pad = -(-d // 128) * 128
    if d_pad != d:
        X_t = jnp.pad(X_t, ((0, 0), (0, d_pad - d)))
    n_off = n + offset
    n_pad = -(-n_off // win) * win
    if n_pad != n_off or offset:
        X_t = jnp.pad(X_t, ((offset, n_pad - n_off), (0, 0)))

    ids, dd = pl.pallas_call(
        functools.partial(
            _window_topm_kernel, win=win, m_pad=m_pad, n_real=n, off=offset,
            metric=metric,
        ),
        grid=(n_pad // win,),
        in_specs=[pl.BlockSpec((win, d_pad), lambda w: (w, 0))],
        out_specs=(
            pl.BlockSpec((win, m_pad), lambda w: (w, 0)),
            pl.BlockSpec((win, m_pad), lambda w: (w, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(X_t)
    return ids[offset : offset + n, :m], dd[offset : offset + n, :m]


def leaf_tables_from_orders(starts, sizes, n: int, max_leaves: int):
    """Compact per-tree (leaf_start, leaf_size) tables from the per-position
    node-location encoding. starts/sizes [T, n] -> ([T, L], [T, L], overflowed
    bool[T]) with ascending starts, padded with (n, 0)."""
    T, _ = starts.shape
    pos = jnp.arange(starts.shape[1], dtype=jnp.int32)[None, :]
    head = starts == pos
    key = jnp.where(head, pos, n)
    order_key = jnp.sort(key, axis=1)[:, :max_leaves]
    safe = jnp.minimum(order_key, n - 1)
    l_sizes = jnp.where(order_key < n, jnp.take_along_axis(sizes, safe, axis=1), 0)
    l_starts = jnp.where(order_key < n, order_key, n)
    n_leaves = jnp.sum(head, axis=1)
    return l_starts, l_sizes, n_leaves > max_leaves
