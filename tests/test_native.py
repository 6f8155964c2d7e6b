"""Native C++ host library vs pure-python reference equivalence."""
import numpy as np
import pytest

from respatpu import analysis
from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.formats import split_triangular
from respatpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


@pytest.fixture(autouse=True)
def _restore_native_flag():
    yield
    analysis._USE_NATIVE = True


def _python_only():
    analysis._USE_NATIVE = False


def test_native_level_schedule_matches_python():
    a = random_banded(300, 12, 7, seed=2)
    L, d, U = split_triangular(a)
    lv_native = analysis.level_schedule(L)
    _python_only()
    lv_py = analysis.level_schedule(L)
    np.testing.assert_array_equal(lv_native, lv_py)
    analysis._USE_NATIVE = True
    lvu_native = analysis.level_schedule(U, upper=True)
    _python_only()
    lvu_py = analysis.level_schedule(U, upper=True)
    np.testing.assert_array_equal(lvu_native, lvu_py)


def test_native_cp_schedule_matches_python():
    a = random_banded(120, 8, 5, seed=4)
    sn = analysis.chow_patel_schedule(a)
    _python_only()
    sp_ = analysis.chow_patel_schedule(a)
    assert sn.t_max == sp_.t_max
    # pairs may be permuted within a row slot; compare as sets per entry
    for p in range(sn.nnz):
        na = set(map(tuple, np.stack([sn.pairs_a[p], sn.pairs_b[p]], 1)[sn.pairs_a[p] >= 0]))
        pa = set(map(tuple, np.stack([sp_.pairs_a[p], sp_.pairs_b[p]], 1)[sp_.pairs_a[p] >= 0]))
        assert na == pa, p


def test_native_symbolic_fill_matches_python():
    a = laplacian_2d(9, 8)
    fn = analysis.symbolic_fill_lu(a)
    _python_only()
    fp = analysis.symbolic_fill_lu(a)
    np.testing.assert_array_equal(np.asarray(fn.indptr, np.int64),
                                  np.asarray(fp.indptr, np.int64))
    np.testing.assert_array_equal(fn.indices, fp.indices)
    np.testing.assert_allclose(fn.data, fp.data)


def test_native_rcm_valid_permutation():
    a = laplacian_2d(15, 14)
    perm = analysis.rcm_ordering(a)
    assert sorted(perm) == list(range(a.nrows))
    restored = analysis.permute_csr(a, perm)
    coo = restored.tocoo()
    bw = int(np.abs(coo.row - coo.col).max())
    assert bw < 40  # lap2d RCM bandwidth ~ grid side


def test_native_mtx_parse_matches_python(tmp_path, rng):
    from respatpu.io import load_csr
    from tests.test_formats import random_coo
    from respatpu.formats import coo_to_csr
    from respatpu.io.mtx import write_mtx
    a = coo_to_csr(random_coo(rng, m=40, n=40, nnz=200))
    p = str(tmp_path / "n.mtx")
    write_mtx(p, a)
    fast = load_csr(p, native=True)
    slow = load_csr(p, native=False)
    np.testing.assert_array_equal(fast.indptr, slow.indptr)
    np.testing.assert_array_equal(fast.indices, slow.indices)
    np.testing.assert_allclose(fast.data, slow.data)
