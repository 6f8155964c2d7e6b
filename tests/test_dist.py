"""Distributed (fake 8-device CPU mesh) row-partitioned SpMV / CG tests."""
import numpy as np
import jax
import pytest
import scipy.sparse as sp

from respatpu import dist
from respatpu.bench.synth import laplacian_2d, powerlaw, random_banded


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must fake 8 cpu devices"
    return dist.make_mesh(8)


def test_plan_halo_consistency():
    a = laplacian_2d(16, 16)
    plan = dist.build_row_partition(a, 4)
    assert plan.ndev == 4
    # every nnz accounted for
    assert (plan.vals != 0).sum() == a.nnz - (a.data == 0).sum()


@pytest.mark.parametrize("gen,seed", [
    (lambda: laplacian_2d(20, 13), 0),
    (lambda: random_banded(300, 25, 7, seed=3), 1),
    (lambda: powerlaw(200, 5, seed=8), 2),
])
def test_dist_spmv_matches_scipy(mesh8, gen, seed):
    a = gen()
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(a.shape[1])
    y = dist.dist_spmv(a, x, mesh=mesh8)
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_dist_spmv_various_device_counts(mesh8):
    a = random_banded(150, 12, 5, seed=5)
    x = np.random.default_rng(0).standard_normal(150)
    ref = to_scipy(a) @ x
    for nd in (1, 2, 4, 8):
        m = dist.make_mesh(nd)
        y = dist.dist_spmv(a, x, mesh=m)
        np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_dist_cg_converges(mesh8):
    a = laplacian_2d(18, 18)
    x_true = np.random.default_rng(1).standard_normal(a.nrows)
    b = to_scipy(a) @ x_true
    x, iters = dist.dist_cg(a, b, mesh=mesh8, tol=1e-7, max_iters=2000)
    from respatpu.solve import relative_residual
    assert relative_residual(a, x, b) < 1e-5
    assert iters < 2000


def test_scaling_measurement_runs(mesh8):
    from respatpu.bench.scaling import measure_scaling
    rows = measure_scaling("Baumann", device_counts=(1, 2, 4),
                           max_synth_nnz=50_000, reps=1, verbose=False)
    assert len(rows) == 3
    assert all(r["gnnz_per_s"] > 0 for r in rows)


def test_dist_spmv_df64(mesh8):
    from respatpu.precision import df_to_f64
    a = random_banded(200, 15, 6, seed=12)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(200) * np.exp(rng.standard_normal(200))
    op = dist.DistSpmv(a, dist.make_mesh(4), policy="df64")
    y = op.unshard(op(op.shard_vector(x)))
    ref = to_scipy(a) @ x
    np.testing.assert_allclose(y, ref, rtol=1e-11, atol=1e-11 * np.abs(ref).max())
