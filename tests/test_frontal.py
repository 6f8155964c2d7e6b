"""Frontal (pool-resident) triangular solves — the round-5 circuit unlock.

The chunked SpTRSV schedule pads every slot to the widest factor row, which
refused hub-coupled circuit factors (one ~24k-wide row x 2.2M slots =
393 GiB in round 4).  The frontal solver reads the dense front blocks
straight from the factored pool (PARDISO phase 33, test_pardiso.c:241-244),
so row width never amplifies storage.  These tests pin its numerics against
scipy and the transpose-solve identity.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spl

from respatpu import solve as slv
from respatpu.bench.synth import circuit_like, mesh_fem_3d


def _scipy_csr(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


@pytest.mark.parametrize("gen,kw,matching", [
    (mesh_fem_3d, dict(avg_degree=10.0, seed=3), False),
    (circuit_like, dict(avg_nnz_per_row=5, seed=4, diag="dominant"), False),
    (circuit_like, dict(avg_nnz_per_row=5, seed=4), True),  # weak diag
])
def test_frontal_solve_matches_scipy(gen, kw, matching):
    a = gen(700, **kw)
    fac = slv.SupernodalLuFactorization(a, policy="fp32", matching=matching)
    assert fac._frontal is not None, "fp32 snlu must take the frontal path"
    b, _ = slv.make_rhs_for_known_x(a)
    x, rep = slv.solve_refined(a, b, fac=fac)
    assert rep.residual < 1e-10, rep.residual
    xs = spl.spsolve(_scipy_csr(a).tocsc(), b)
    denom = max(1.0, np.abs(xs).max())
    # agreement limited by the matrix's conditioning; the residual gate
    # above is the primary assertion
    assert np.abs(x - xs).max() / denom < 1e-6


def test_frontal_transpose_solve():
    a = mesh_fem_3d(600, avg_degree=9.0, seed=8, spd=False)
    fac = slv.SupernodalLuFactorization(a, policy="fp32")
    s = np.random.default_rng(0).standard_normal(a.nrows)
    w = fac.solve_transpose(s)
    wt = spl.spsolve(_scipy_csr(a).T.tocsc(), s)
    assert np.abs(w - wt).max() / max(1.0, np.abs(wt).max()) < 1e-4


def test_frontal_condest_order_of_magnitude():
    a = mesh_fem_3d(500, seed=12)
    A = np.asarray(_scipy_csr(a).todense())
    true_rcond = 1.0 / (np.abs(A).sum(axis=0).max()
                        * np.abs(np.linalg.inv(A)).sum(axis=0).max())
    fac = slv.SupernodalLuFactorization(a, policy="fp32")
    est = fac.condest()
    assert 0.05 * true_rcond < est < 20 * true_rcond


def test_frontal_refactorize_warm():
    a = mesh_fem_3d(500, seed=2)
    b, _ = slv.make_rhs_for_known_x(a)
    fac = slv.SupernodalLuFactorization(a, policy="fp32")
    r1 = fac.report.residual
    dt = fac.refactorize_timed()
    assert dt > 0
    x = fac.solve(b)
    assert fac.report.residual < 1e-5  # same factor values, same accuracy


def test_weak_diag_circuit_exercises_perturbation_or_matching():
    """The honest circuit synthetic must make static pivoting load-bearing:
    either perturbed pivots appear or the matched factor carries tiny
    diagonals through scaling — and IR still gates (round-4 verdict #5)."""
    a = circuit_like(900, 5, seed=13)
    b, _ = slv.make_rhs_for_known_x(a)
    fac = slv.SupernodalLuFactorization(a, policy="fp32", matching=True)
    x, rep = slv.solve_refined(a, b, fac=fac)
    assert rep.residual < 1e-10
    raw = slv.SupernodalLuFactorization(a, policy="fp32", matching=False)
    xr = raw.solve(b)
    # without matching the weak-diag factorization is visibly unstable
    assert raw.report.pivot_growth > 10 * fac.report.pivot_growth \
        or raw.report.n_pivot_perturbed > 0 \
        or raw.report.residual > 1e3 * rep.residual
