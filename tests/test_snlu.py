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
    a = circuit_like(600, 4, seed=1, hub_fraction=0.003, hub_degree=40)
    b = np.random.default_rng(3).standard_normal(a.nrows)
    fac = multifrontal_factor(a, order="mindeg")
    x = multifrontal_solve(fac, b)
    assert relative_residual(a, x, b) < 1e-9


def test_supernodes_compress_fronts():
    """On a 2-D grid the partition should find multi-column supernodes and
    level batches usable for the future device vmap."""
    a = laplacian_2d(24, 24)
    part = analyze_supernodes(a)
    assert part.nsn < a.nrows  # some merging happened
    assert sum(len(l) for l in part.levels) == part.nsn
    assert part.fill_nnz >= a.nnz
