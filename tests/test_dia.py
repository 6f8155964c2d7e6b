import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu.bench.synth import laplacian_2d, laplacian_3d, random_banded
from respatpu.kernels import dia
from respatpu.kernels.spmv import DeviceHybrid, spmv, to_device
from respatpu.precision import df_from_f64, df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_build_dia_stencil_full_coverage():
    a = laplacian_2d(20, 17)
    d = dia.build_dia(a)
    assert d.remainder is None or d.remainder.nnz == 0
    assert d.nnz_dia == a.nnz
    assert len(d.offsets) == 5  # 5-point stencil


def test_dia_spmv_fp32(rng):
    a = laplacian_3d(9, 8, 7)
    d = dia.dia_to_device(dia.build_dia(a), "fp32")
    x = rng.standard_normal(a.shape[1])
    y = np.asarray(dia.dia_spmv(d, jnp.asarray(x, jnp.float32)), np.float64)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_dia_spmv_df64(rng):
    a = laplacian_2d(13, 11)
    d = dia.dia_to_device(dia.build_dia(a), "df64")
    x = rng.standard_normal(a.shape[1])
    y = df_to_f64(dia.dia_spmv(d, df_from_f64(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12 * np.abs(ref).max())


def test_hybrid_with_remainder(rng):
    # banded random: partial diagonal coverage + stragglers
    a = random_banded(300, 6, 8, seed=7)
    dev = to_device(a, "fp32", fmt="dia")
    assert isinstance(dev, DeviceHybrid)
    x = rng.standard_normal(a.shape[1])
    y = np.asarray(spmv(dev, jnp.asarray(x, jnp.float32)), np.float64)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_auto_format_selection():
    stencil = laplacian_2d(30, 30)
    dev = to_device(stencil, "fp32", fmt="auto")
    assert isinstance(dev, DeviceHybrid)  # stencil -> DIA
    scattered = random_banded(500, 200, 4, seed=1)
    dev2 = to_device(scattered, "fp32", fmt="auto")
    assert not isinstance(dev2, DeviceHybrid)  # scattered -> ELL


def test_hybrid_df64(rng):
    a = random_banded(200, 4, 6, seed=9)
    dev = to_device(a, "df64", fmt="dia")
    x = rng.standard_normal(a.shape[1])
    y = df_to_f64(spmv(dev, df_from_f64(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())
