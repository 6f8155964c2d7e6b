import numpy as np
import pytest
import scipy.sparse as sp

from respatpu import solve as slv
from respatpu.bench.synth import laplacian_2d, make_spd_like, random_banded


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_band_factorization_fp32_then_refined():
    a = laplacian_2d(20, 15)
    b, x_true = slv.make_rhs_for_known_x(a)
    fac = slv.factorize_band(a, policy="fp32")
    x = fac.solve(b)
    assert fac.report.residual < 1e-4
    # refinement drives fp32 factorization to fp64-level residual
    xr, rep = slv.solve_refined(a, b, fac=fac, tol=1e-12)
    assert rep.residual < 1e-10, rep
    assert slv.inf_norm_error(xr, x_true) < 1e-8
    assert rep.iterations <= 15


def test_band_df64_direct():
    a = random_banded(180, 7, 5, seed=9)
    b, x_true = slv.make_rhs_for_known_x(a)
    fac = slv.factorize_band(a, policy="df64")
    x = fac.solve(b)
    assert fac.report.residual < 1e-12
    assert slv.inf_norm_error(x, x_true) < 1e-8


def test_band_bf16_with_refinement():
    a = laplacian_2d(12, 12)
    b, _ = slv.make_rhs_for_known_x(a)
    xr, rep = slv.solve_refined(a, b, policy="bf16", tol=1e-12, max_iters=60)
    assert rep.residual < 1e-8, rep


def test_band_memory_guard():
    # scrambled matrix with huge bandwidth and order=natural must refuse
    rng = np.random.default_rng(0)
    from respatpu.formats import COOMatrix, coo_to_csr
    n = 3000
    rows = np.arange(n, dtype=np.int32)
    cols = rng.permutation(n).astype(np.int32)
    a = coo_to_csr(COOMatrix((n, n), np.concatenate([rows, rows]),
                             np.concatenate([cols, rows]),
                             np.concatenate([rng.standard_normal(n),
                                             np.full(n, 10.0)])))
    with pytest.raises(MemoryError):
        slv.factorize_band(a, policy="fp32", order="natural",
                           max_band_bytes=1 << 20)


def test_cg_spd():
    a = laplacian_2d(15, 15)
    b, x_true = slv.make_rhs_for_known_x(a)
    x, rep = slv.cg(a, b, tol=1e-7, max_iters=2000)
    assert rep.residual < 1e-5
    assert slv.inf_norm_error(x, x_true) < 1e-3


def test_bicgstab_with_ilu():
    a = random_banded(250, 10, 6, seed=13)
    b, x_true = slv.make_rhs_for_known_x(a)
    pre = slv.ilu0(a, policy="fp32", sweeps=10)
    x, rep = slv.bicgstab(a, b, precond=pre, tol=1e-7, max_iters=300)
    assert rep.converged, rep
    assert rep.residual < 1e-5
    # preconditioner should beat unpreconditioned iteration count
    x2, rep2 = slv.bicgstab(a, b, precond=None, tol=1e-7, max_iters=300)
    assert rep.iterations <= rep2.iterations or rep2.residual > rep.residual


def test_verification_helpers():
    a = laplacian_2d(6, 6)
    b, x_true = slv.make_rhs_for_known_x(a)
    assert slv.relative_residual(a, x_true, b) < 1e-14
    assert slv.inf_norm_error(x_true * (1 + 1e-3), x_true) == pytest.approx(1e-3, rel=0.1)


def test_report_phases_recorded():
    a = laplacian_2d(10, 10)
    fac = slv.factorize_band(a, policy="fp32")
    assert fac.report.t_analyze > 0
    assert fac.report.t_factorize > 0
    b, _ = slv.make_rhs_for_known_x(a)
    fac.solve(b)
    assert fac.report.t_solve > 0
