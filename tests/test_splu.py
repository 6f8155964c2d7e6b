import numpy as np
import pytest
import scipy.sparse as sp

from respatpu import solve as slv
from respatpu.analysis import symbolic_fill_lu
from respatpu.bench.synth import laplacian_2d, powerlaw, random_banded
from respatpu.kernels.splu import build_scheduled_lu, scheduled_lu_factor
from respatpu.kernels.ilu0 import ilu0_host_reference
from respatpu.precision import df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def dense_lu_unpivoted(dense):
    n = dense.shape[0]
    lu = dense.astype(np.float64).copy()
    for k in range(n):
        lu[k + 1:, k] /= lu[k, k]
        lu[k + 1:, k + 1:] -= np.outer(lu[k + 1:, k], lu[k, k + 1:])
    return lu


@pytest.mark.parametrize("policy,tol", [("df64", 1e-9), ("fp32", 2e-3)])
def test_scheduled_exact_ilu0(policy, tol):
    """On A's own pattern the scheduled factorization equals exact ILU(0)."""
    a = random_banded(150, 8, 5, seed=31)
    res, plan = scheduled_lu_factor(a, policy=policy)
    vals = df_to_f64(res.values) if policy == "df64" else np.asarray(res.values, np.float64)
    ref = ilu0_host_reference(a)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(vals, ref, rtol=tol, atol=tol * scale)


def test_scheduled_exact_lu_on_filled():
    a = laplacian_2d(9, 8)
    filled = symbolic_fill_lu(a)
    res, plan = scheduled_lu_factor(filled, policy="df64")
    vals = df_to_f64(res.values)
    ref = dense_lu_unpivoted(to_scipy(a).toarray())
    got = np.zeros_like(ref)
    rows = np.repeat(np.arange(filled.nrows), np.diff(filled.indptr))
    got[rows, filled.indices] = vals
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9 * scale)


def test_sparse_lu_factorization_solve():
    a = powerlaw(200, 5, seed=17)
    b, x_true = slv.make_rhs_for_known_x(a)
    fac = slv.SparseLuFactorization(a, policy="df64")
    x = fac.solve(b)
    assert fac.report.residual < 1e-9, fac.report
    assert slv.inf_norm_error(x, x_true) < 1e-6


def test_sparse_lu_fp32_with_refinement():
    a = powerlaw(150, 4, seed=23)
    b, _ = slv.make_rhs_for_known_x(a)
    fac = slv.SparseLuFactorization(a, policy="fp32")
    x = fac.solve(b)
    r0 = fac.report.residual
    x2, rep = slv.solve_refined(a, b, fac=fac, tol=1e-12)
    assert rep.residual < max(r0 * 1e-2, 1e-10), (r0, rep.residual)


def test_factorize_auto_dispatch():
    # banded matrix -> band path
    a = random_banded(100, 6, 4, seed=3)
    fac = slv.factorize(a, policy="fp32")
    assert isinstance(fac, slv.BandLuFactorization)
    # scrambled permutation matrix + diag: band infeasible -> sparse path
    rng = np.random.default_rng(0)
    from respatpu.formats import COOMatrix, coo_to_csr
    n = 2000
    rows = np.arange(n, dtype=np.int32)
    cols = rng.permutation(n).astype(np.int32)
    b_ = coo_to_csr(COOMatrix((n, n), np.concatenate([rows, rows]),
                              np.concatenate([cols, rows]),
                              np.concatenate([rng.standard_normal(n),
                                              np.full(n, 50.0)])))
    fac2 = slv.factorize(b_, policy="fp32", order="natural",
                         max_band_bytes=1 << 22)
    # band infeasible -> a sparse direct path (multifrontal preferred)
    assert isinstance(fac2, (slv.SupernodalLuFactorization,
                             slv.SparseLuFactorization))
    rhs, xt = slv.make_rhs_for_known_x(b_)
    x = fac2.solve(rhs)
    assert fac2.report.residual < 1e-3
