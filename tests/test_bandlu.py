import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
import scipy.linalg

from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.kernels import bandlu
from respatpu.precision import df_from_f64, df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_csr_to_band_roundtrip():
    a = random_banded(100, 6, 4, seed=1)
    band = bandlu.csr_to_band(a, p=16)
    dense = to_scipy(a).toarray()
    # reconstruct
    rec = np.zeros((band.nb * band.p, band.nb * band.p))
    for r in range(band.nb):
        for pr in range(band.p):
            i = r * band.p + pr
            for w in range(band.width):
                j = (r - band.ml) * band.p + w
                if 0 <= j < rec.shape[1] and band.data[r, pr, w] != 0:
                    rec[i, j] = band.data[r, pr, w]
    np.testing.assert_allclose(rec[:100, :100], dense)
    # padding rows are identity
    for i in range(100, band.nb * band.p):
        assert rec[i, i] == 1.0


@pytest.mark.parametrize("p", [16, 32])
def test_band_lu_single_matches_dense(p):
    a = random_banded(70, 5, 4, seed=2)
    dense = to_scipy(a).toarray()
    band = bandlu.csr_to_band(a, p=p)
    dev = bandlu.band_to_device(band, "fp32")
    res = bandlu.band_lu(dev)
    # unpivoted dense LU reference
    n = 70
    lu = dense.astype(np.float64).copy()
    for k in range(n):
        lu[k + 1:, k] /= lu[k, k]
        lu[k + 1:, k + 1:] -= np.outer(lu[k + 1:, k], lu[k, k + 1:])
    out = np.asarray(res.lu.data[0], np.float64)
    got = np.zeros((n, n))
    ml, pp = band.ml, band.p
    for i in range(n):
        r, pr = i // pp, i % pp
        for w in range(band.width):
            j = (r - ml) * pp + w
            if 0 <= j < n:
                got[i, j] = out[r, pr, w]
    scale = np.abs(lu).max()
    np.testing.assert_allclose(got, lu, rtol=2e-3, atol=2e-3 * scale)


def test_band_lu_solve_fp32():
    a = random_banded(200, 8, 5, seed=3)
    band = bandlu.csr_to_band(a, p=32)
    dev = bandlu.band_to_device(band, "fp32")
    res = bandlu.band_lu(dev)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(200)
    x = np.asarray(bandlu.band_solve(res.lu, jnp.asarray(b, jnp.float32)), np.float64)
    ref = np.linalg.solve(to_scipy(a).toarray(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())


def test_band_lu_solve_df64():
    a = random_banded(150, 6, 4, seed=4)
    band = bandlu.csr_to_band(a, p=32)
    dev = bandlu.band_to_device(band, "df64")
    res = bandlu.band_lu(dev)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(150)
    x = df_to_f64(bandlu.band_solve(res.lu, df_from_f64(b)))
    ref = np.linalg.solve(to_scipy(a).toarray(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-10 * np.abs(ref).max())


def test_band_lu_laplacian_df64():
    a = laplacian_2d(16, 12)  # bandwidth 16
    band = bandlu.csr_to_band(a, p=16)
    dev = bandlu.band_to_device(band, "df64")
    res = bandlu.band_lu(dev)
    assert int(res.n_pivot_perturbed) == 0
    b = np.ones(a.nrows)
    x = df_to_f64(bandlu.band_solve(res.lu, df_from_f64(b)))
    ref = np.linalg.solve(to_scipy(a).toarray(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-9)


def test_band_memory_estimate():
    assert bandlu.band_memory_bytes(1000, 100, 100, p=128) == \
        8 * 128 * 3 * 128 * 4
    assert bandlu.band_memory_bytes(1000, 100, 100, p=128, double_word=True) == \
        8 * 128 * 3 * 128 * 8


def test_band_solve_multiple_rhs():
    a = random_banded(150, 6, 4, seed=15)
    band = bandlu.csr_to_band(a, p=32)
    res = bandlu.band_lu(bandlu.band_to_device(band, "fp32"))
    rng = np.random.default_rng(2)
    B = rng.standard_normal((150, 5))
    X = np.asarray(bandlu.band_solve(res.lu, jnp.asarray(B, jnp.float32)), np.float64)
    ref = np.linalg.solve(to_scipy(a).toarray(), B)
    np.testing.assert_allclose(X, ref, rtol=1e-3, atol=1e-3 * np.abs(ref).max())
    # single-RHS path unchanged
    # single-RHS path agrees to fp32 rounding (different GEMM shapes)
    x1 = np.asarray(bandlu.band_solve(res.lu, jnp.asarray(B[:, 0], jnp.float32)))
    np.testing.assert_allclose(x1, X[:, 0], rtol=1e-4, atol=1e-6)
