import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu.bench.synth import laplacian_2d, powerlaw, random_banded
from respatpu.formats import coo_to_csr
from respatpu.kernels.spmv import spmv, to_device
from respatpu.precision import DF, df_from_f64, df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


MATRICES = {
    "lap2d": lambda: laplacian_2d(17, 13),
    "banded": lambda: random_banded(300, 20, 9, seed=5),
    "powerlaw": lambda: powerlaw(257, 7, seed=2),
}


@pytest.mark.parametrize("name", list(MATRICES))
def test_spmv_fp32(rng, name):
    a = MATRICES[name]()
    x = rng.standard_normal(a.shape[1])
    dev = to_device(a, "fp32")
    y = np.asarray(spmv(dev, jnp.asarray(x, jnp.float32)), np.float64)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


@pytest.mark.parametrize("name", list(MATRICES))
def test_spmv_df64(rng, name):
    a = MATRICES[name]()
    x = rng.standard_normal(a.shape[1])
    dev = to_device(a, "df64")
    y = df_to_f64(spmv(dev, df_from_f64(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12 * np.abs(ref).max())


def test_spmv_bf16(rng):
    a = MATRICES["lap2d"]()
    x = rng.standard_normal(a.shape[1])
    dev = to_device(a, "bf16")
    y = np.asarray(spmv(dev, jnp.asarray(x)).astype(jnp.float32), np.float64)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=0.05, atol=0.05 * np.abs(ref).max())


def test_cross_precision_error_reporting(rng):
    """Reference verification idiom #1: fp32 vs fp64 mean abs difference
    (test_spmv.c:200-208), with the reference's race-free semantics."""
    a = MATRICES["banded"]()
    x = rng.standard_normal(a.shape[1])
    y32 = np.asarray(spmv(to_device(a, "fp32"), jnp.asarray(x, jnp.float32)), np.float64)
    y64 = df_to_f64(spmv(to_device(a, "df64"), df_from_f64(x)))
    err = np.abs(y32 - y64).mean()
    assert 0 <= err < 1e-3
    # df64 itself must be far tighter than fp32
    ref = to_scipy(a) @ x
    assert np.abs(y64 - ref).mean() < 1e-12 * max(1.0, np.abs(ref).max())


def test_spmv_rectangular(rng):
    coo_rows = rng.integers(0, 40, 200).astype(np.int32)
    coo_cols = rng.integers(0, 70, 200).astype(np.int32)
    from respatpu.formats import COOMatrix
    a = coo_to_csr(COOMatrix((40, 70), coo_rows, coo_cols, rng.standard_normal(200)))
    x = rng.standard_normal(70)
    y = np.asarray(spmv(to_device(a, "fp32"), jnp.asarray(x, jnp.float32)), np.float64)
    np.testing.assert_allclose(y, to_scipy(a) @ x, rtol=1e-5, atol=1e-5)


def test_spmv_empty_rows(rng):
    from respatpu.formats import COOMatrix
    a = coo_to_csr(COOMatrix((10, 10), np.array([0, 9], np.int32),
                             np.array([1, 8], np.int32), np.array([2.0, 3.0])))
    x = np.ones(10)
    y = np.asarray(spmv(to_device(a, "fp32"), jnp.asarray(x, jnp.float32)), np.float64)
    expect = np.zeros(10)
    expect[0], expect[9] = 2.0, 3.0
    np.testing.assert_allclose(y, expect)
