import numpy as np
import pytest

from respatpu import solve as slv
from respatpu.bench.synth import laplacian_2d, random_banded


def test_pivot_growth_and_memory_reported():
    a = random_banded(120, 6, 4, seed=5)
    fac = slv.factorize_band(a, policy="fp32")
    assert np.isfinite(fac.report.pivot_growth)
    assert fac.report.pivot_growth >= 0.9  # |U| at least ~|A| scale
    assert fac.report.factor_bytes > 0


def test_condition_estimate_orders_of_magnitude():
    a = laplacian_2d(12, 12)
    fac = slv.factorize_band(a, policy="df64")
    rcond = fac.condest()
    import scipy.sparse as sp
    dense = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape).toarray()
    true_cond = np.linalg.cond(dense, 1)
    # estimate should be within ~2 orders of magnitude of 1/cond
    assert 1e-2 * (1 / true_cond) <= rcond <= 1e2 * (1 / true_cond)


def test_sparse_lu_diagnostics():
    from respatpu.bench.synth import powerlaw
    a = powerlaw(120, 4, seed=3)
    fac = slv.SparseLuFactorization(a, policy="fp32")
    assert np.isfinite(fac.report.pivot_growth)
    assert fac.report.factor_bytes > 0
    rc = fac.condest()
    assert 0 < rc <= 1.0
