"""Distance correctness vs scipy/sklearn oracles
(mirrors reference tests/test_distances.py:14-443)."""

import numpy as np
import pytest
from scipy import stats
from scipy.spatial import distance as spdist
from scipy.version import version as scipy_version

import pynndescent_tpu.ops.distances as dist

_SPATIAL_METRICS = [
    "euclidean",
    "manhattan",
    "chebyshev",
    "canberra",
    "braycurtis",
    "cosine",
    "correlation",
    "sqeuclidean",
]

_SCIPY_NAMES = {
    "manhattan": "cityblock",
    "sqeuclidean": "sqeuclidean",
}

_BINARY_METRICS = [
    "hamming",
    "jaccard",
    "dice",
    "matching",
    "rogerstanimoto",
    "russellrao",
    "sokalsneath",
    "sokalmichener",
    "yule",
]

_SCIPY_BINARY_NAMES = {"matching": "hamming", "sokalmichener": "rogerstanimoto"}


def _our_pairwise(metric, X, **kwds):
    return np.asarray(dist.pairwise(metric, X, X, **kwds))


@pytest.mark.parametrize("metric", _SPATIAL_METRICS)
def test_spatial_metric_vs_scipy(spatial_data, metric):
    scipy_name = _SCIPY_NAMES.get(metric, metric)
    expected = spdist.cdist(spatial_data, spatial_data, scipy_name)
    got = _our_pairwise(metric, spatial_data)
    # scipy emits nan for zero-vector cosine/correlation rows; the reference
    # (and we) define those cases instead.
    mask = np.isfinite(expected)
    # atol accommodates the matmul-based ||x||^2+||y||^2-2xy formulation's
    # f32 cancellation on near-duplicate points
    np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-4, atol=3e-3)


@pytest.mark.parametrize("metric", _BINARY_METRICS)
def test_binary_metric_vs_scipy(binary_data, metric):
    scipy_name = _SCIPY_BINARY_NAMES.get(metric, metric)
    expected = spdist.cdist(binary_data, binary_data, scipy_name)
    got = _our_pairwise(metric, binary_data.astype(np.float32))
    mask = np.isfinite(expected)
    if metric == "russellrao":
        # the reference defines identical-support pairs as distance 0
        # (distances.py:435); scipy does not — exclude those pairs
        supports = binary_data.astype(bool)
        ntt = supports.astype(int) @ supports.T.astype(int)
        same = (ntt == supports.sum(1)[:, None]) & (ntt == supports.sum(1)[None, :])
        mask &= ~same
    np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-4, atol=1e-5)


def test_kulsinski(binary_data):
    # removed from modern scipy; check the reference formula directly
    x, y = binary_data[0], binary_data[1]
    ntt = np.sum(x & y)
    nneq = np.sum(x != y)
    n = x.shape[0]
    expected = 0.0 if nneq == 0 else (nneq - ntt + n) / (nneq + n)
    got = float(dist.kulsinski(x.astype(np.float32), y.astype(np.float32)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_minkowski(spatial_data):
    for p in (1, 2, 3):
        expected = spdist.cdist(spatial_data, spatial_data, "minkowski", p=p)
        got = _our_pairwise("minkowski", spatial_data, p=p)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_seuclidean(spatial_data):
    v = np.abs(np.random.RandomState(42).randn(spatial_data.shape[1])).astype(np.float32) + 0.1
    expected = spdist.cdist(spatial_data, spatial_data, "seuclidean", V=v)
    got = _our_pairwise("seuclidean", spatial_data, sigma=v)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_weighted_minkowski(spatial_data):
    w = np.abs(np.random.RandomState(7).randn(spatial_data.shape[1])).astype(np.float32) + 0.1
    expected = spdist.cdist(spatial_data, spatial_data, "minkowski", p=2, w=w)
    got = _our_pairwise("wminkowski", spatial_data, w=w, p=2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_mahalanobis(spatial_data):
    v = np.cov(np.vstack([spatial_data, np.random.RandomState(3).randn(30, 20)]).T)
    vinv = np.linalg.inv(v + 1e-3 * np.eye(20)).astype(np.float32)
    expected = spdist.cdist(spatial_data, spatial_data, "mahalanobis", VI=vinv)
    got = _our_pairwise("mahalanobis", spatial_data, vinv=vinv)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_haversine():
    rng = np.random.RandomState(0)
    pts = np.stack(
        [rng.uniform(-np.pi / 2, np.pi / 2, 10), rng.uniform(-np.pi, np.pi, 10)], axis=1
    ).astype(np.float32)
    from sklearn.metrics.pairwise import haversine_distances

    expected = haversine_distances(pts)
    got = _our_pairwise("haversine", pts)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_spearmanr():
    rng = np.random.RandomState(5)
    x = rng.randn(30).astype(np.float32)
    y = rng.randn(30).astype(np.float32)
    expected = 1.0 - stats.spearmanr(x, y)[0]
    got = float(dist.spearmanr(x, y))
    assert got == pytest.approx(expected, rel=1e-4, abs=1e-5)


@pytest.mark.parametrize("method", ["average", "min", "max", "dense", "ordinal"])
def test_rankdata_parity(method):
    # mirrors reference tests/test_rank.py (scipy parity across tie methods)
    rng = np.random.RandomState(11)
    for arr in [
        rng.randn(20).astype(np.float32),
        rng.randint(0, 4, 25).astype(np.float32),
        np.zeros(7, np.float32),
        np.array([1.0], np.float32),
    ]:
        expected = stats.rankdata(arr, method=method)
        got = np.asarray(dist.rankdata(arr, method=method))
        np.testing.assert_allclose(got, expected)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_wasserstein_1d_vs_scipy(p):
    rng = np.random.RandomState(8)
    x = rng.uniform(0.1, 1, 16).astype(np.float32)
    y = rng.uniform(0.1, 1, 16).astype(np.float32)
    got = float(dist.wasserstein_1d(x, y, p=p))
    # scipy computes W1 between empirical distributions; cross-check p=1 via
    # direct CDF formula for histogram bins
    xc = np.cumsum(x / x.sum())
    yc = np.cumsum(y / y.sum())
    expected = (np.sum(np.abs(xc - yc) ** p)) ** (1.0 / p)
    assert got == pytest.approx(expected, rel=1e-4)


def test_wasserstein_zero_mass_rows_saturate():
    """Zero-sum rows must return FLOAT32_MAX, not NaN (reference proxies
    saturate, distances.py:875-1030)."""
    z = np.zeros(8, np.float32)
    y = np.abs(np.random.RandomState(3).randn(8)).astype(np.float32)
    for fn in (
        lambda a, b: dist.wasserstein_1d(a, b, p=1),
        lambda a, b: dist.circular_kantorovich(a, b, p=1),
        lambda a, b: dist.circular_kantorovich(a, b, p=2),
    ):
        for a, b in ((z, y), (y, z), (z, z)):
            v = float(fn(a, b))
            assert np.isfinite(v) and v == pytest.approx(dist.FLOAT32_MAX)
        assert np.isfinite(float(fn(y, y)))


@pytest.mark.parametrize(
    "alt",
    ["euclidean", "cosine", "dot", "inner_product", "true_angular", "hellinger", "jaccard"],
)
def test_alternative_correction_identity(spatial_data, alt):
    """fast alternative + correction == plain metric (reference
    tests/test_distances.py:326-344)."""
    entry = dist.fast_distance_alternatives[alt]
    plain = dist.named_distances[alt]
    data = np.abs(spatial_data) if alt in ("hellinger", "jaccard") else spatial_data
    # drop zero rows: both-zero pairs are defined as 0.0 by the plain metrics
    # but the alt transform has no way to encode that (reference behaves the same)
    data = data[np.linalg.norm(data, axis=1) > 0]
    if alt == "dot":
        norms = np.linalg.norm(data, axis=1, keepdims=True)
        data = data / np.where(norms == 0, 1.0, norms)
    x = data[:, None, :]
    y = data[None, :, :]
    alt_d = np.asarray(entry["dist"](x, y))
    corrected = np.asarray(entry["correction"](alt_d))
    expected = np.asarray(plain(x, y))
    finite = alt_d < dist.FLOAT32_MAX / 2
    # arccos is ill-conditioned near similarity 1 (true_angular correction)
    np.testing.assert_allclose(corrected[finite], expected[finite], rtol=1e-3, atol=5e-3)


def test_bit_metrics_popcount_oracle():
    rng = np.random.RandomState(13)
    x = rng.randint(0, 256, 32).astype(np.uint8)
    y = rng.randint(0, 256, 32).astype(np.uint8)
    xb = np.unpackbits(x)
    yb = np.unpackbits(y)
    assert float(dist.bit_hamming(x, y)) == float(np.sum(xb != yb))
    inter = np.sum(xb & yb)
    union = np.sum(xb | yb)
    expected = -np.log(inter / union)
    assert float(dist.bit_jaccard(x, y)) == pytest.approx(expected, rel=1e-5)


def test_jensen_shannon_symmetry_and_zero():
    rng = np.random.RandomState(21)
    x = rng.uniform(0, 1, 10).astype(np.float32)
    y = rng.uniform(0, 1, 10).astype(np.float32)
    assert float(dist.jensen_shannon_divergence(x, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(dist.jensen_shannon_divergence(x, y)) == pytest.approx(
        float(dist.jensen_shannon_divergence(y, x)), rel=1e-5
    )
    # cross-check against scipy jensenshannon (squared, since scipy returns sqrt)
    expected = spdist.jensenshannon(x / x.sum(), y / y.sum()) ** 2
    assert float(dist.jensen_shannon_divergence(x, y)) == pytest.approx(expected, rel=1e-2, abs=1e-4)


def test_sinkhorn_close_to_exact():
    from pynndescent_tpu.ops import optimal_transport as ot

    rng = np.random.RandomState(17)
    d = 8
    x = rng.uniform(0.1, 1, d).astype(np.float32)
    y = rng.uniform(0.1, 1, d).astype(np.float32)
    cost = np.abs(np.arange(d)[:, None] - np.arange(d)[None, :]).astype(np.float32)
    exact = ot.kantorovich(x, y, cost=cost)
    plan = ot.sinkhorn_transport_plan(x, y, cost, regularization=0.02, max_iter=500)
    approx = float((plan * cost).sum())
    assert approx == pytest.approx(exact, rel=0.05, abs=0.02)


def test_kantorovich_1d_equals_wasserstein():
    from pynndescent_tpu.ops import optimal_transport as ot

    rng = np.random.RandomState(19)
    d = 10
    x = rng.uniform(0.1, 1, d).astype(np.float32)
    y = rng.uniform(0.1, 1, d).astype(np.float32)
    cost = np.abs(np.arange(d)[:, None] - np.arange(d)[None, :]).astype(np.float64)
    exact = ot.kantorovich(x, y, cost=cost)
    w1 = float(dist.wasserstein_1d(x, y, p=1))
    assert exact == pytest.approx(w1, rel=1e-4, abs=1e-5)


def test_pairwise_fast_paths_match_generic(spatial_data):
    for metric in ["euclidean", "sqeuclidean", "cosine", "dot", "inner_product"]:
        fast = np.asarray(dist.pairwise(metric, spatial_data))
        fn = dist.named_distances[metric]
        generic = np.asarray(fn(spatial_data[:, None, :], spatial_data[None, :, :]))
        np.testing.assert_allclose(fast, generic, rtol=1e-4, atol=3e-3)


def test_zero_vector_semantics():
    z = np.zeros(4, np.float32)
    v = np.ones(4, np.float32)
    assert float(dist.cosine(z, z)) == 0.0
    assert float(dist.cosine(z, v)) == 1.0
    assert float(dist.correlation(z, z)) == 0.0
    assert float(dist.hellinger(z, z)) == 0.0
    assert float(dist.hellinger(z, np.abs(v))) == 1.0
    assert float(dist.alternative_cosine(z, v)) == dist.FLOAT32_MAX
    assert float(dist.bray_curtis(z, z)) == 0.0


def test_native_transport_matches_lp():
    """The C++ successive-shortest-paths EMD equals the exact LP solution."""
    from pynndescent_tpu import native
    from pynndescent_tpu.ops import optimal_transport as ot

    if not native.have_native_transport():
        pytest.skip("native transport unavailable")
    rs = np.random.RandomState(3)
    for trial in range(10):
        n1 = rs.randint(2, 20)
        n2 = rs.randint(2, 20)
        a = rs.uniform(0.01, 1, n1)
        b = rs.uniform(0.01, 1, n2)
        a /= a.sum()
        b /= b.sum()
        cost = rs.uniform(0, 5, (n1, n2))
        got = native.emd_dense(a, b, cost)
        # exact LP reference
        from scipy.optimize import linprog

        A_eq = ot._transport_constraints(n1, n2)
        res = linprog(
            cost.ravel(), A_eq=A_eq, b_eq=np.concatenate([a, b[:-1]]),
            bounds=(0, None), method="highs",
        )
        assert got == pytest.approx(res.fun, rel=1e-6, abs=1e-9), f"trial {trial}"
