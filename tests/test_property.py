"""Property-based tests: random sparsity patterns against scipy oracles,
determinism (the race-free guarantee the reference lacks, SURVEY.md §5.2),
and breakdown reporting."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu import solve as slv
from respatpu.formats import COOMatrix, coo_to_csr
from respatpu.kernels.spmv import spmv, to_device
from respatpu.precision import DF, df_from_f64, df_to_f64


def random_csr(rng, n, density):
    nnz = max(1, int(n * n * density))
    coo = COOMatrix((n, n), rng.integers(0, n, nnz).astype(np.int32),
                    rng.integers(0, n, nnz).astype(np.int32),
                    rng.standard_normal(nnz))
    return coo_to_csr(coo)


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


@pytest.mark.parametrize("trial", range(10))
def test_spmv_random_patterns(trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(10, 400))
    density = float(rng.uniform(0.001, 0.2))
    a = random_csr(rng, n, density)
    x = rng.standard_normal(n)
    for fmt in ("ell", "dia"):
        dev = to_device(a, "fp32", fmt=fmt)
        y = np.asarray(spmv(dev, jnp.asarray(x, jnp.float32)), np.float64)
        ref = to_scipy(a) @ x
        np.testing.assert_allclose(y, ref, rtol=3e-5,
                                   atol=3e-5 * max(1e-12, np.abs(ref).max()),
                                   err_msg=f"n={n} density={density} fmt={fmt}")


@pytest.mark.parametrize("trial", range(5))
def test_df64_spmv_random(trial):
    rng = np.random.default_rng(2000 + trial)
    n = int(rng.integers(20, 200))
    a = random_csr(rng, n, 0.05)
    x = rng.standard_normal(n) * np.exp(rng.standard_normal(n) * 2)
    dev = to_device(a, "df64")
    y = df_to_f64(spmv(dev, df_from_f64(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-11,
                               atol=1e-11 * max(1e-12, np.abs(ref).max()))


def test_spmv_deterministic():
    """Bitwise reproducibility: the reference has OpenMP reduction races
    (test_spmv.c:202-205); our reductions must be deterministic."""
    rng = np.random.default_rng(7)
    a = random_csr(rng, 300, 0.05)
    x = jnp.asarray(rng.standard_normal(300), jnp.float32)
    dev = to_device(a, "fp32")
    y1 = np.asarray(spmv(dev, x))
    y2 = np.asarray(spmv(dev, x))
    np.testing.assert_array_equal(y1, y2)
    dev2 = to_device(a, "fp32")  # fresh device arrays, same data
    y3 = np.asarray(spmv(dev2, x))
    np.testing.assert_array_equal(y1, y3)


def test_singular_matrix_reports_breakdown():
    """Structurally singular diagonal -> pivot perturbation count > 0 and
    finite factors (the zero-pivot probe of GPU/ilu0.cu:221-226)."""
    rng = np.random.default_rng(3)
    n = 30
    a = random_csr(rng, n, 0.1)
    # zero out some diagonal entries
    rows = np.repeat(np.arange(n), a.row_lengths())
    a.data[rows == a.indices] = 0.0
    fac = slv.factorize_band(a, policy="fp32")
    assert fac.report.n_pivot_perturbed > 0
    b = rng.standard_normal(n)
    x = fac.solve(b)
    assert np.isfinite(x).all()


def test_io_roundtrip_random(tmp_path):
    from respatpu.io import load_csr, write_mtx
    rng = np.random.default_rng(11)
    for trial in range(3):
        a = random_csr(rng, int(rng.integers(5, 60)), 0.2)
        p = str(tmp_path / f"m{trial}.mtx")
        write_mtx(p, a)
        b = load_csr(p)
        np.testing.assert_allclose(b.toarray(), a.toarray(), rtol=1e-15)
