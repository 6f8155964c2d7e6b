"""Supernodal multifrontal LU: symbolic analysis + host numeric oracle."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from respatpu.bench.synth import circuit_like, laplacian_2d, mesh_fem_3d
from respatpu.kernels.snlu import (analyze_supernodes, etree,
                                   multifrontal_factor, multifrontal_solve,
                                   postorder)
from respatpu.solve import make_rhs_for_known_x, relative_residual


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_etree_postorder_roundtrip():
    a = laplacian_2d(12, 10)
    part = analyze_supernodes(a, order="mindeg")
    par = part.sn_parent
    # postorder invariant: every supernode's parent comes after it
    assert all(p > s for s, p in enumerate(par) if p >= 0)
    # supernode columns partition [0, n)
    assert part.snode_ptr[0] == 0 and part.snode_ptr[-1] == a.nrows
    assert (np.diff(part.snode_ptr) >= 1).all()
    # row structures live strictly below their supernode
    for s in range(part.nsn):
        if part.rowstruct[s].size:
            assert part.rowstruct[s].min() >= part.snode_ptr[s + 1]


@pytest.mark.parametrize("gen,kw", [
    (laplacian_2d, dict()),
    (mesh_fem_3d, dict(avg_degree=10.0, seed=2)),
])
def test_multifrontal_matches_scipy(gen, kw):
    a = gen(18, 17) if gen is laplacian_2d else gen(900, **kw)
    b, x_true = make_rhs_for_known_x(a)
    fac = multifrontal_factor(a)
    x = multifrontal_solve(fac, b)
    assert relative_residual(a, x, b) < 1e-10
    x_ref = spla.spsolve(to_scipy(a).tocsc(), b)
    assert np.allclose(x, x_ref, rtol=1e-8, atol=1e-8)


def test_multifrontal_unsymmetric_values():
    # unsymmetric values on a symmetrized pattern
    a = mesh_fem_3d(512, 8.0, seed=5, spd=False)
    b = np.random.default_rng(0).standard_normal(a.nrows)
    fac = multifrontal_factor(a, order="rcm")
    x = multifrontal_solve(fac, b)
    assert relative_residual(a, x, b) < 1e-10


def test_multifrontal_circuit_mindeg():
    # dominant diag: this test checks the no-matching multifrontal oracle;
    # the default weak-diag circuit generator needs GESP matching + IR
    # (covered in test_solvers2 / test_driver_parity)
    a = circuit_like(600, 4, seed=1, hub_fraction=0.003, hub_degree=40,
                     diag="dominant")
    b = np.random.default_rng(3).standard_normal(a.nrows)
    fac = multifrontal_factor(a, order="mindeg")
    x = multifrontal_solve(fac, b)
    assert relative_residual(a, x, b) < 1e-9


def test_frontal_plan_invariants():
    """Assembly scatter hits every filled entry exactly once, fronts are
    disjoint in the pool, every supernode is in exactly one group."""
    from respatpu.kernels.snlu_device import build_frontal_plan
    a = mesh_fem_3d(700, avg_degree=9.0, seed=4)
    part = analyze_supernodes(a)
    plan = build_frontal_plan(part)
    assert plan.asm_dst.size == part.filled.nnz
    assert np.unique(plan.asm_dst).size == plan.asm_dst.size
    # padded-pivot diagonals never collide with assembled entries
    assert np.intersect1d(plan.asm_dst, plan.ones_dst).size == 0
    seen = np.concatenate([g.snodes for g in plan.groups])
    assert np.sort(seen).tolist() == list(range(part.nsn))
    # schur destinations point at parents only (or drop)
    for g in plan.groups:
        live = g.schur_dst[g.schur_dst < plan.pool_size]
        assert (live >= 0).all()


@pytest.mark.parametrize("gen,kw,order", [
    (laplacian_2d, dict(), "mindeg"),
    (mesh_fem_3d, dict(avg_degree=10.0, seed=2), "mindeg"),
    # dominant diag: this is a mechanics test (device == host oracle to fp32
    # accuracy); weak-diag growth is exercised by the GESP tests instead
    (circuit_like, dict(seed=1, hub_fraction=0.003, hub_degree=40,
                        diag="dominant"), "rcm"),
])
def test_device_multifrontal_matches_oracle(gen, kw, order):
    """Device fp32 batched frontal LU == host fp64 oracle (to fp32 accuracy),
    checked via the reconstructed factor product L@U ~= P A P^T."""
    from respatpu.kernels.snlu_device import (build_frontal_plan,
                                              frontal_factor_device)
    if gen is laplacian_2d:
        a = gen(18, 17)
    elif gen is circuit_like:
        a = gen(600, 4, **kw)
    else:
        a = gen(900, **kw)
    part = analyze_supernodes(a, order=order)
    plan = build_frontal_plan(part)
    vals, nbad = frontal_factor_device(plan)
    f, n = part.filled, a.nrows
    fac = sp.csr_matrix((vals, f.indices, f.indptr), shape=(n, n)).toarray()
    L = np.tril(fac, -1) + np.eye(n)
    U = np.triu(fac)
    ap = to_scipy(a).toarray()[np.ix_(part.perm, part.perm)]
    scale = max(np.abs(ap).max(), 1.0)
    assert np.abs(L @ U - ap).max() / scale < 5e-3  # fp32 accumulation
    assert nbad < n // 10


def test_supernodal_factorization_solve_and_refine():
    """User API: SupernodalLuFactorization solves to fp32 residual; df64
    iterative refinement on top reaches reference-fp64 residuals (the study's
    headline recipe, PARDISO-replacement path)."""
    from respatpu.solve import (SupernodalLuFactorization, factorize,
                                solve_refined)
    a = mesh_fem_3d(1200, avg_degree=10.0, seed=7)
    b, _ = make_rhs_for_known_x(a)
    fac = SupernodalLuFactorization(a)
    x = fac.solve(b)
    assert fac.report.residual < 1e-3  # fp32 factor
    assert fac.report.t_factorize > 0 and fac.report.t_analyze > 0
    x2, rep = solve_refined(a, b, fac=fac)
    assert rep.residual < 1e-10
    f2 = factorize(a, method="snlu")
    assert isinstance(f2, SupernodalLuFactorization)


def test_supernodes_compress_fronts():
    """On a 2-D grid the partition should find multi-column supernodes and
    level batches usable for the future device vmap."""
    a = laplacian_2d(24, 24)
    part = analyze_supernodes(a)
    assert part.nsn < a.nrows  # some merging happened
    assert sum(len(l) for l in part.levels) == part.nsn
    assert part.fill_nnz >= a.nnz
