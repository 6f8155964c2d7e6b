import numpy as np
import pytest
import scipy.sparse as sp

from respatpu import dist
from respatpu import solve as slv
from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.config import ExperimentConfig


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_gmres_unsymmetric():
    a = random_banded(250, 9, 6, seed=41)
    b, x_true = slv.make_rhs_for_known_x(a)
    x, rep = slv.gmres(a, b, tol=1e-7, restart=40, max_restarts=10)
    assert rep.converged, rep
    assert rep.residual < 1e-5
    assert slv.inf_norm_error(x, x_true) < 1e-3


def test_gmres_with_ilu():
    a = random_banded(300, 12, 7, seed=43)
    b, _ = slv.make_rhs_for_known_x(a)
    pre = slv.ilu0(a, policy="fp32", sweeps=10)
    x, rep = slv.gmres(a, b, precond=pre, tol=1e-7)
    x2, rep2 = slv.gmres(a, b, precond=None, tol=1e-7)
    assert rep.converged
    assert rep.iterations <= rep2.iterations


def test_dist_bicgstab_block_jacobi():
    a = random_banded(256, 10, 6, seed=47)
    b, x_true = slv.make_rhs_for_known_x(a)
    mesh = dist.make_mesh(4)
    x, it = dist.dist_bicgstab(a, b, mesh=mesh, tol=1e-8, max_iters=200)
    assert slv.relative_residual(a, x, b) < 1e-6
    x2, it2 = dist.dist_bicgstab(a, b, mesh=mesh, precondition=False,
                                 tol=1e-8, max_iters=200)
    assert it <= it2


def test_experiment_config_roundtrip():
    cfg = ExperimentConfig(workload="lu", group="moderate", policy="fp32",
                           ftz=True, reps=3)
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.policy == "fp32" and cfg2.ftz is True
    p = cfg2.resolved_policy()
    assert p.flush_to_zero
    names = cfg2.matrix_names()
    assert len(names) == 21


def test_experiment_config_run_spmv():
    cfg = ExperimentConfig(workload="spmv", matrices=["Baumann"],
                           policy="fp32", reps=1, max_synth_nnz=20_000)
    rows = cfg.run(verbose=False)
    assert len(rows) == 1


def test_matching_static_pivoting_circuit():
    # dc1-class: unsymmetric circuit with wild row scaling.  GESP recipe
    # (weighted matching + Ruiz scaling + static perturbation + df64 IR)
    # must reach reference residuals where the unmatched factor stalls
    # (test_pardiso.c:141 iparm[12]=1 parity; round-1 verdict missing #4)
    import numpy as np
    from respatpu.bench.synth import circuit_like
    from respatpu.formats import CSRMatrix
    from respatpu.solve import SupernodalLuFactorization, solve_refined, \
        make_rhs_for_known_x
    a0 = circuit_like(1200, 8, seed=7)
    rng = np.random.default_rng(1)
    sc = 10.0 ** rng.uniform(-6, 6, a0.shape[0])
    rows = np.repeat(np.arange(a0.shape[0]), a0.row_lengths())
    a = CSRMatrix(a0.shape, a0.indptr, a0.indices, a0.data * sc[rows])
    b, xt = make_rhs_for_known_x(a)
    fac = SupernodalLuFactorization(a, policy="fp32", matching=True)
    assert "matching" in fac.report.notes
    x, rep = solve_refined(a, b, fac=fac)
    assert rep.residual < 1e-10, rep.residual
    assert fac.report.n_pivot_perturbed == 0


def test_true_hager_condest():
    import numpy as np
    import scipy.sparse as sp
    from respatpu.bench.synth import mesh_fem_3d
    from respatpu.solve import SupernodalLuFactorization, _norm1
    a = mesh_fem_3d(800, seed=9)
    A = np.asarray(sp.csr_matrix((a.data, a.indices, a.indptr),
                                 shape=a.shape).todense())
    true_inv1 = np.abs(np.linalg.inv(A)).sum(axis=0).max()
    fac = SupernodalLuFactorization(a, policy="fp32")
    rc = fac.condest()
    est_inv1 = 1.0 / (rc * _norm1(a))
    # Hager with a true transpose solve: tight lower bound, typically exact
    assert 0.3 * true_inv1 <= est_inv1 <= 1.05 * true_inv1


def test_solve_transpose_correct():
    import numpy as np
    import scipy.sparse as sp
    from respatpu.bench.synth import mesh_fem_3d
    from respatpu.solve import SupernodalLuFactorization
    a = mesh_fem_3d(700, seed=11)
    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    fac = SupernodalLuFactorization(a, policy="fp32")
    rng = np.random.default_rng(3)
    s = rng.standard_normal(a.shape[0])
    z = fac.solve_transpose(s)
    r = np.linalg.norm(A.T @ z - s) / np.linalg.norm(s)
    assert r < 1e-4, r
