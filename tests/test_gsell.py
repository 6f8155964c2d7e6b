"""GSELL lane-gather SpMV: correctness vs scipy on the fake-CPU backend.

The Pallas kernel runs in interpreter mode off-TPU; the packing logic
(mosaic slots, 64-aligned windows, quota spills) is identical either way.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from respatpu.formats import CSRMatrix
from respatpu.kernels.gsell import (build_gsell, estimate_gsell,
                                    gsell_to_device, spmv_gsell)


def _csr(A):
    A = A.tocsr()
    return CSRMatrix(A.shape, A.indptr.astype(np.int32),
                     A.indices.astype(np.int32), A.data.astype(np.float64))


def _check(A, nbank=None, quota=None, policy="fp32", tol=2e-5):
    a = _csr(A)
    plan = build_gsell(a, nbank=nbank, quota=quota)
    dev = gsell_to_device(plan, policy)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    y = np.asarray(spmv_gsell(dev, jnp.asarray(x)), np.float32)
    ref = (A @ x).astype(np.float32)
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(y - ref).max() / scale < tol, (plan.nbank, plan.quota)
    return plan


def test_local_structure():
    # banded + local clusters: the FEM-like case, no spills expected
    rng = np.random.default_rng(0)
    n = 2000
    diags = [np.ones(n) * (i + 1) for i in range(5)]
    A = sp.diags(diags, [-7, -1, 0, 1, 7], (n, n), format="csr")
    A = A + sp.random(n, n, density=1e-3, random_state=1, format="csr")
    plan = _check(A)
    assert plan.packed_nnz + (0 if plan.spill_coo is None
                              else plan.spill_coo[0].size) == plan.nnz


def test_scattered_spills_are_exact():
    # fully scattered: most entries miss the window -> spill path exercised
    n = 40000
    A = (sp.random(n, n, density=2e-4, random_state=3, format="csr")
         + sp.eye(n, format="csr"))
    plan = _check(A)
    assert plan.spill_coo is not None and plan.spill_coo[0].size > 0


def test_rectangular_and_empty_rows():
    rng = np.random.default_rng(2)
    A = sp.random(900, 1700, density=5e-3, random_state=2, format="csr")
    A.data[:] = rng.standard_normal(A.nnz)
    lil = A.tolil()
    lil[5] = 0
    lil[333] = 0
    _check(lil.tocsr())


def test_quota_override_and_estimate():
    n = 1500
    A = (sp.random(n, n, density=4e-3, random_state=5, format="csr")
         + sp.eye(n, format="csr"))
    plan0 = _check(A, quota=0)        # quota=0 -> cover max demand
    assert plan0.spill_coo is None or plan0.spill_coo[0].size == 0
    assert estimate_gsell(plan0) > 0


def test_bf16_policy():
    n = 1200
    A = (sp.random(n, n, density=4e-3, random_state=6, format="csr")
         + sp.eye(n, format="csr"))
    _check(A, policy="bf16", tol=3e-2)


def test_df64_rejected():
    A = sp.eye(256, format="csr")
    with pytest.raises(ValueError):
        gsell_to_device(_csr(A), "df64")


def test_auto_dispatch_prefers_gsell_for_fem():
    from respatpu.bench.synth import mesh_fem_3d
    from respatpu.kernels.gsell import DeviceGsell
    from respatpu.kernels.spmv import spmv, to_device
    a = mesh_fem_3d(6000, seed=0)
    dev = to_device(a, "fp32", fmt="auto")
    assert isinstance(dev, DeviceGsell)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y = np.asarray(spmv(dev, jnp.asarray(x)), np.float32)
    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    ref = (A @ x).astype(np.float32)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_circuit_hub_split():
    # circuit-class: dense hub columns -> dense (n, K) block on the MXU,
    # hub rows -> row-gather spill, local band -> ordinary windows
    from respatpu.bench.synth import circuit_like
    a = circuit_like(6000, 7, seed=1)
    plan = build_gsell(a)
    assert plan.dense_cols is not None and plan.dense_cols[0].size >= 1
    assert plan.fill > 0.05          # without the split this collapses ~0.01
    A = sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)
    dev = gsell_to_device(plan, "fp32")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    y = np.asarray(spmv_gsell(dev, jnp.asarray(x)), np.float32)
    ref = (A @ x).astype(np.float32)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_hub_split_forced_thresholds():
    # explicit thresholds force the split on a mildly-skewed matrix; the
    # dense block plus spill plus packed core must reproduce every entry
    n = 3000
    A = (sp.random(n, n, density=3e-3, random_state=9, format="csr")
         + sp.eye(n, format="csr")).tocsr()
    # make two columns and one row dense
    lil = A.tolil()
    lil[:, 17] = 1.25
    lil[:, 2200] = -0.5
    lil[42] = 0.75
    a = _csr(lil.tocsr())
    plan = build_gsell(a, split_hubs=True, col_thresh=n // 2, row_thresh=n // 2)
    assert plan.dense_cols is not None and plan.dense_cols[0].size == 2
    dev = gsell_to_device(plan, "fp32")
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_gsell(dev, jnp.asarray(x)), np.float32)
    ref = (lil.tocsr() @ x).astype(np.float32)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5
