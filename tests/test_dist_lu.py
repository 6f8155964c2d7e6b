"""Distributed direct band LU (SPIKE) on the virtual 8-device CPU mesh.

The fake-mesh test for the MUMPS job=4/job=3 replacement (SURVEY.md §4
implication: multi-host logic via xla_force_host_platform_device_count).
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.dist import make_mesh
from respatpu.dist_lu import DistBandLu, dist_solve_refined
from respatpu.solve import make_rhs_for_known_x, relative_residual


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_spike_matches_scipy_spd(mesh):
    a = laplacian_2d(40, 30)  # n=1200, needs identity padding per shard
    b = np.asarray(np.random.default_rng(0).standard_normal(a.nrows))
    fac = DistBandLu(a, mesh=mesh, p=32)
    x = fac.solve(b)
    x_ref = spla.spsolve(to_scipy(a).tocsc(), b)
    assert np.allclose(x, x_ref, rtol=2e-4, atol=2e-4)
    assert fac.report.residual < 1e-5
    assert fac.report.t_factorize > 0 and fac.report.t_solve > 0


def test_spike_nonsymmetric(mesh):
    a = random_banded(900, bandwidth=40, nnz_per_row=7, seed=3)
    b, x_true = make_rhs_for_known_x(a)
    fac = DistBandLu(a, mesh=mesh, p=32)
    x = fac.solve(b)
    assert relative_residual(a, x, b) < 1e-5
    assert np.abs(x - x_true).max() < 1e-3


def test_spike_n_not_divisible(mesh):
    # n=997 prime: exercises both block padding and partition padding
    a = random_banded(997, bandwidth=25, nnz_per_row=5, seed=7)
    b = np.asarray(np.random.default_rng(1).standard_normal(a.nrows))
    fac = DistBandLu(a, mesh=mesh, p=32)
    x = fac.solve(b)
    assert relative_residual(a, x, b) < 1e-5


def test_spike_multi_rhs(mesh):
    a = laplacian_2d(32, 32)
    rng = np.random.default_rng(2)
    bmat = np.asarray(rng.standard_normal((a.nrows, 4)))
    fac = DistBandLu(a, mesh=mesh, p=32)
    xmat = fac.solve(bmat)
    assert xmat.shape == (a.nrows, 4)
    for k in range(4):
        assert relative_residual(a, xmat[:, k], bmat[:, k]) < 1e-5


def test_spike_refined_reaches_fp64(mesh):
    a = laplacian_2d(36, 28)
    b, _ = make_rhs_for_known_x(a)
    x, rep = dist_solve_refined(a, b, fac=DistBandLu(a, mesh=mesh, p=32))
    assert rep.converged
    assert rep.residual < 1e-12
    assert rep.iterations >= 1


def test_spike_matches_single_chip(mesh):
    """Distributed and single-chip direct solvers agree on the same system."""
    from respatpu.solve import BandLuFactorization
    a = random_banded(640, bandwidth=30, nnz_per_row=6, seed=11)
    b = np.asarray(np.random.default_rng(5).standard_normal(a.nrows))
    xd = DistBandLu(a, mesh=mesh, p=32).solve(b)
    xs = BandLuFactorization(a, p=32).solve(b)
    assert np.allclose(xd, xs, rtol=1e-3, atol=1e-3)
