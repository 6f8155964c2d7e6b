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
