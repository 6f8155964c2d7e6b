import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu.bench.synth import laplacian_2d, powerlaw, random_banded
from respatpu.kernels import rgell
from respatpu.kernels.spmv import spmv, to_device
from respatpu.precision import df_from_f64, df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


MATS = {
    "banded": lambda: random_banded(300, 20, 9, seed=5),
    "powerlaw": lambda: powerlaw(257, 7, seed=2),
    "lap2d": lambda: laplacian_2d(17, 13),
}


@pytest.mark.parametrize("name", list(MATS))
def test_rgell_fp32(rng, name):
    a = MATS[name]()
    x = rng.standard_normal(a.shape[1])
    dev = to_device(a, "fp32", fmt="rgell")
    y = np.asarray(spmv(dev, jnp.asarray(x, jnp.float32)), np.float64)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=3e-5, atol=3e-5 * np.abs(ref).max())


def test_rgell_df64(rng):
    a = MATS["banded"]()
    x = rng.standard_normal(a.shape[1])
    dev = to_device(a, "df64", fmt="rgell")
    y = df_to_f64(spmv(dev, df_from_f64(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())


def test_rgell_clustering_amortization():
    """RCM-clustered columns share group slots (< 1 slot per entry)."""
    a = laplacian_2d(40, 40)  # contiguous column runs
    r = rgell.build_rgell(a)
    assert r.slots_per_entry < 0.75, r.slots_per_entry


def test_rgell_duplicate_cols_summed(rng):
    from respatpu.formats import COOMatrix, coo_to_csr
    a = coo_to_csr(COOMatrix((10, 10),
                             np.array([0, 0, 0], np.int32),
                             np.array([3, 3, 4], np.int32),
                             np.array([1.0, 2.0, 5.0])))
    dev = to_device(a, "fp32", fmt="rgell")
    y = np.asarray(spmv(dev, jnp.ones(10, jnp.float32)))
    assert y[0] == pytest.approx(8.0)
