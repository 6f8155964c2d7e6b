import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu.analysis import build_tri_chunks
from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.formats import COOMatrix, coo_to_csr, split_triangular
from respatpu.kernels.sptrsv import sptrsv, sptrsv_host_reference, tri_to_device
from respatpu.precision import df_from_f64, df_to_f64


def lower_factor(seed=0, n=150, bw=7, per_row=5):
    a = random_banded(n, bw, per_row, seed=seed)
    L, d, U = split_triangular(a)
    # non-unit lower: L + diag
    coo = L.tocoo()
    dn = np.arange(n, dtype=np.int32)
    return coo_to_csr(COOMatrix((n, n), np.concatenate([coo.row, dn]),
                                np.concatenate([coo.col, dn]),
                                np.concatenate([coo.val, d])))


def upper_factor(seed=0, n=150, bw=7, per_row=5):
    a = random_banded(n, bw, per_row, seed=seed)
    L, d, U = split_triangular(a)
    return U  # includes diagonal


def test_host_reference_matches_scipy():
    L = lower_factor()
    b = np.random.default_rng(0).standard_normal(L.nrows)
    y = sptrsv_host_reference(L, b, lower=True)
    ref = sp.linalg.spsolve_triangular(
        sp.csr_matrix((L.data, L.indices, L.indptr), shape=L.shape), b, lower=True)
    np.testing.assert_allclose(y, ref, rtol=1e-10)


@pytest.mark.parametrize("c", [32, 256])
def test_sptrsv_lower_fp32(rng, c):
    L = lower_factor()
    b = rng.standard_normal(L.nrows)
    dev = tri_to_device(L, lower=True, policy="fp32", c=c)
    y = np.asarray(sptrsv(dev, jnp.asarray(b, jnp.float32)), np.float64)
    ref = sptrsv_host_reference(L, b, lower=True)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_sptrsv_upper_fp32(rng):
    U = upper_factor()
    b = rng.standard_normal(U.nrows)
    dev = tri_to_device(U, lower=False, policy="fp32", c=64)
    y = np.asarray(sptrsv(dev, jnp.asarray(b, jnp.float32)), np.float64)
    ref = sptrsv_host_reference(U, b, lower=False)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_sptrsv_unit_lower(rng):
    L = lower_factor(seed=3)
    b = rng.standard_normal(L.nrows)
    dev = tri_to_device(L, lower=True, unit_diag=True, policy="fp32", c=64)
    y = np.asarray(sptrsv(dev, jnp.asarray(b, jnp.float32)), np.float64)
    ref = sptrsv_host_reference(L, b, lower=True, unit_diag=True)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_sptrsv_df64(rng):
    L = lower_factor(seed=5)
    b = rng.standard_normal(L.nrows)
    dev = tri_to_device(L, lower=True, policy="df64", c=64)
    y = df_to_f64(sptrsv(dev, df_from_f64(b)))
    ref = sptrsv_host_reference(L, b, lower=True)
    np.testing.assert_allclose(y, ref, rtol=1e-10, atol=1e-10 * np.abs(ref).max())


def test_sptrsv_deep_chain(rng):
    # worst case: pure sequential chain (level depth == n)
    n = 100
    rows = np.concatenate([np.arange(n), np.arange(1, n)]).astype(np.int32)
    cols = np.concatenate([np.arange(n), np.arange(n - 1)]).astype(np.int32)
    vals = np.concatenate([np.full(n, 2.0), np.full(n - 1, -1.0)])
    L = coo_to_csr(COOMatrix((n, n), rows, cols, vals))
    b = rng.standard_normal(n)
    dev = tri_to_device(L, lower=True, policy="df64", c=16, )
    y = df_to_f64(sptrsv(dev, df_from_f64(b)))
    ref = sptrsv_host_reference(L, b, lower=True)
    np.testing.assert_allclose(y, ref, rtol=1e-9, atol=1e-9 * np.abs(ref).max())


def test_sptrsv_triangle_from_spd(rng):
    a = laplacian_2d(12, 11)
    L, d, U = split_triangular(a)
    n = a.nrows
    coo = L.tocoo()
    dn = np.arange(n, dtype=np.int32)
    Lfull = coo_to_csr(COOMatrix((n, n), np.concatenate([coo.row, dn]),
                                 np.concatenate([coo.col, dn]),
                                 np.concatenate([coo.val, d])))
    b = rng.standard_normal(n)
    dev = tri_to_device(Lfull, lower=True, policy="df64", c=128)
    y = df_to_f64(sptrsv(dev, df_from_f64(b)))
    ref = sptrsv_host_reference(Lfull, b, lower=True)
    np.testing.assert_allclose(y, ref, rtol=1e-10, atol=1e-10 * np.abs(ref).max())


def test_jacobi_tri_exact_at_depth():
    """Fixed-point sweeps are exact once sweeps >= dependency depth."""
    import numpy as np
    from respatpu.bench.synth import mesh_fem_3d
    from respatpu.formats import split_triangular
    from respatpu.kernels.sptrsv import (jacobi_tri, sptrsv,
                                         sptrsv_host_reference)
    a = mesh_fem_3d(1000, 10.0, seed=3)
    L, d, U = split_triangular(a)
    # U with diagonal: depth bounded by n; use generous sweeps on a small case
    t = jacobi_tri(U, lower=False, sweeps=200, policy="fp32")
    b = np.random.default_rng(0).standard_normal(a.nrows)
    y = np.asarray(sptrsv(t, b.astype(np.float32)), np.float64)
    y_ref = sptrsv_host_reference(U, b, lower=False)
    assert np.allclose(y, y_ref, rtol=1e-4, atol=1e-4 * np.abs(y_ref).max())


def test_ilu_jacobi_preconditioner_converges():
    """BiCGSTAB with the sweep-apply ILU converges like the exact apply.
    (BiCGSTAB, not CG: approximate triangular applies make M mildly
    nonsymmetric, which CG cannot tolerate.)"""
    import numpy as np
    from respatpu import solve as slv
    from respatpu.bench.synth import mesh_fem_3d
    a = mesh_fem_3d(4096, 12.0, seed=4)
    b, _ = slv.make_rhs_for_known_x(a)
    pre_j = slv.Ilu0Preconditioner(a, policy="fp32", apply_mode="jacobi")
    x, rep = slv.bicgstab(a, b, precond=pre_j, tol=1e-7, max_iters=300)
    assert rep.converged
    pre_e = slv.Ilu0Preconditioner(a, policy="fp32", apply_mode="scheduled")
    x2, rep2 = slv.bicgstab(a, b, precond=pre_e, tol=1e-7, max_iters=300)
    assert rep.iterations <= rep2.iterations * 2 + 10


def test_isai_preconditioner_converges():
    """CG with the single-SpMV ISAI apply converges comparably."""
    import numpy as np
    from respatpu import solve as slv
    from respatpu.bench.synth import mesh_fem_3d
    a = mesh_fem_3d(4096, 12.0, seed=7)
    b, _ = slv.make_rhs_for_known_x(a)
    pre = slv.Ilu0Preconditioner(a, policy="fp32", apply_mode="isai")
    x, rep = slv.bicgstab(a, b, precond=pre, tol=1e-7, max_iters=400)
    assert rep.converged
    assert rep.iterations < 50
    assert slv.relative_residual(a, x, b) < 1e-5
