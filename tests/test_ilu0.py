import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from respatpu.analysis import chow_patel_schedule, symbolic_fill_lu
from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.formats import COOMatrix, coo_to_csr
from respatpu.kernels.ilu0 import ilu0_factor, ilu0_host_reference
from respatpu.precision import df_to_f64


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def factors_from_inplace(a, vals):
    """Rebuild dense L (unit) and U from in-place factor values on A's pattern."""
    n = a.nrows
    L = np.eye(n)
    U = np.zeros((n, n))
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    for p, (i, j) in enumerate(zip(rows, a.indices)):
        if i > j:
            L[i, j] = vals[p]
        else:
            U[i, j] = vals[p]
    return L, U


def test_host_reference_vs_scipy_spilu():
    a = laplacian_2d(8, 8)
    vals = ilu0_host_reference(a)
    L, U = factors_from_inplace(a, vals)
    # For an SPD M-matrix, scipy spilu with drop_tol=0, fill_factor=1 is ILU(0)
    # on the same pattern; compare product instead of factors to avoid
    # ordering differences: LU must match A exactly ON the pattern of A.
    prod = L @ U
    dense = to_scipy(a).toarray()
    mask = dense != 0
    np.testing.assert_allclose(prod[mask], dense[mask], rtol=1e-10)


@pytest.mark.parametrize("policy,rtol", [("df64", 1e-9), ("fp32", 1e-3)])
def test_chow_patel_converges_to_exact_ilu0(policy, rtol):
    a = laplacian_2d(9, 7)
    res, sched = ilu0_factor(a, policy=policy, sweeps=30)
    vals = df_to_f64(res.values) if policy == "df64" else np.asarray(res.values, np.float64)
    ref = ilu0_host_reference(a)
    np.testing.assert_allclose(vals, ref, rtol=rtol, atol=rtol)
    assert float(res.residual) < 1e-6


def test_ilu0_banded_unsymmetric():
    a = random_banded(120, 9, 6, seed=11)
    res, _ = ilu0_factor(a, policy="df64", sweeps=40)
    vals = df_to_f64(res.values)
    ref = ilu0_host_reference(a)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(vals, ref, rtol=1e-7, atol=1e-7 * scale)


def test_exact_lu_via_filled_pattern():
    """ILU(0) on the symbolically-filled pattern == exact LU (direct solver path)."""
    a = laplacian_2d(7, 6)
    filled = symbolic_fill_lu(a)
    res, _ = ilu0_factor(filled, policy="df64", sweeps=60)
    vals = df_to_f64(res.values)
    L, U = factors_from_inplace(filled, vals)
    dense = to_scipy(a).toarray()
    np.testing.assert_allclose(L @ U, dense, rtol=1e-8, atol=1e-8 * np.abs(dense).max())


def test_zero_pivot_perturbation():
    # matrix with a zero diagonal entry -> must be perturbed, reported
    dense = np.array([[0.0, 1.0], [1.0, 1.0]])
    r, c = np.nonzero(dense + 1)  # all four entries stored
    a = coo_to_csr(COOMatrix((2, 2), r.astype(np.int32), c.astype(np.int32),
                             dense[r, c]))
    res, _ = ilu0_factor(a, policy="fp32", sweeps=5)
    assert int(res.n_pivot_perturbed) >= 1
    assert np.isfinite(np.asarray(res.values)).all()


def test_scheduled_ilu_preconditioner_deep_matrix():
    """Tridiagonal chain: CP sweeps converge slowly (depth=n), the scheduled
    method is exact regardless of depth."""
    from respatpu import solve as slv
    n = 200
    rows = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)]).astype(np.int32)
    cols = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)]).astype(np.int32)
    vals = np.concatenate([np.full(n, 2.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0)])
    a = coo_to_csr(COOMatrix((n, n), rows, cols, vals))
    b, x_true = slv.make_rhs_for_known_x(a)
    # tridiagonal: ILU(0) == exact LU, so the preconditioner apply IS a solve
    pre = slv.Ilu0Preconditioner(a, policy="df64", method="scheduled")
    import jax.numpy as jnp
    from respatpu.precision import df_from_f64, df_to_f64
    x = df_to_f64(pre.apply(df_from_f64(b)))
    assert slv.inf_norm_error(x, x_true) < 1e-9
