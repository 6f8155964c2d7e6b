"""df64 GSELL: emulated-fp64 lane-gather SpMV vs the numpy fp64 oracle."""
import numpy as np
import pytest

from respatpu import precision as prec
from respatpu.bench.synth import mesh_fem_3d
from respatpu.formats import COOMatrix, coo_to_csr
from respatpu.kernels.gsell_df import gsell_df_to_device, spmv_gsell_df
from respatpu.kernels.spmv import spmv_csr_reference


def _check(a, seed=0, tol=1e-13):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(a.shape[1])
    dev = gsell_df_to_device(a)
    y = spmv_gsell_df(dev, prec.df_from_f64(x))
    got = prec.df_to_f64(y)
    ref = spmv_csr_reference(a, x)
    scale = np.abs(ref).max() + 1.0
    err = np.abs(got - ref).max() / scale
    assert err < tol, err


def test_gsell_df_fem_exactish():
    a = mesh_fem_3d(2000, seed=3)
    _check(a)


def test_gsell_df_beats_fp32_accuracy():
    """df64 must be ~fp64; the same SpMV in fp32 must be visibly worse."""
    from respatpu.kernels.gsell import gsell_to_device, spmv_gsell
    a = mesh_fem_3d(1500, seed=5)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1])
    ref = spmv_csr_reference(a, x)
    scale = np.abs(ref).max() + 1.0

    ydf = prec.df_to_f64(spmv_gsell_df(gsell_df_to_device(a),
                                       prec.df_from_f64(x)))
    y32 = np.asarray(spmv_gsell(gsell_to_device(a, "fp32"),
                                np.asarray(x, np.float32)), np.float64)
    err_df = np.abs(ydf - ref).max() / scale
    err_32 = np.abs(y32 - ref).max() / scale
    assert err_df < 1e-13
    assert err_32 > 10 * err_df


def test_gsell_df_spill_rows_exact():
    """Rows that miss the window/quota spill; the df64 side path must keep
    full accuracy (an fp32 scatter-add there would round the low words)."""
    rng = np.random.default_rng(7)
    # mesh-ish structure plus a few far-off-window entries to force spills
    a0 = mesh_fem_3d(1200, seed=9)
    n = a0.shape[0]
    coo = a0.tocoo()
    nsp = 200
    rs = rng.integers(0, n, nsp)
    cs = (rs + n // 2) % n  # far from the diagonal window
    vs = rng.standard_normal(nsp) * 1e-7  # small: rounding would vanish them
    a = coo_to_csr(COOMatrix((n, n),
                             np.concatenate([coo.row, rs.astype(np.int32)]),
                             np.concatenate([coo.col, cs.astype(np.int32)]),
                             np.concatenate([coo.val, vs])))
    dev = gsell_df_to_device(a)
    if not isinstance(dev.spill, tuple):
        pytest.skip("structure packed without tiny spills; nothing to check")
    _check(a, seed=11)


def test_gsell_df_circuit_hub_split():
    """Circuit-class hub split (gsell._split_hubs): the dense hub-column
    block must be applied in df64 (two_prod + fixed-order reduction), not
    rounded through an fp32 matvec."""
    from respatpu.bench.synth import circuit_like
    a = circuit_like(5000, 7, seed=2)
    from respatpu.kernels.gsell import build_gsell
    plan = build_gsell(a)
    assert plan.dense_cols is not None
    dev = gsell_df_to_device(plan)
    assert dev.dense_cols is not None
    _check(a, seed=5)
