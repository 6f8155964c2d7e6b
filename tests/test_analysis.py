import numpy as np
import pytest
import scipy.sparse as sp

from respatpu.analysis import (build_tri_chunks, chow_patel_schedule,
                               level_schedule, permute_csr, rcm_ordering,
                               symbolic_fill_lu)
from respatpu.bench.synth import laplacian_2d, random_banded
from respatpu.formats import split_triangular


def to_scipy(a):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_level_schedule_chain():
    # bidiagonal chain: level[i] = i
    n = 6
    from respatpu.formats import COOMatrix, coo_to_csr
    rows = np.concatenate([np.arange(n), np.arange(1, n)]).astype(np.int32)
    cols = np.concatenate([np.arange(n), np.arange(n - 1)]).astype(np.int32)
    vals = np.ones(rows.size)
    L = coo_to_csr(COOMatrix((n, n), rows, cols, vals))
    lev = level_schedule(L)
    np.testing.assert_array_equal(lev, np.arange(n))


def test_level_schedule_diagonal():
    from respatpu.formats import COOMatrix, coo_to_csr
    n = 5
    L = coo_to_csr(COOMatrix((n, n), np.arange(n, dtype=np.int32),
                             np.arange(n, dtype=np.int32), np.ones(n)))
    np.testing.assert_array_equal(level_schedule(L), np.zeros(n))


def test_tri_chunks_cover_all_rows():
    a = random_banded(200, 10, 6, seed=7)
    L, d, U = split_triangular(a)
    # put diagonal into L for a non-unit lower solve
    ch = build_tri_chunks(L, lower=True, unit_diag=True, c=32)
    got = np.sort(ch.perm[ch.perm >= 0])
    np.testing.assert_array_equal(got, np.arange(200))
    # every dependency must be in an earlier position (topological)
    pos_of = np.empty(200, dtype=int)
    valid = ch.perm >= 0
    pos_of[ch.perm[valid]] = np.flatnonzero(valid)
    for i in range(200):
        s, e = L.indptr[i], L.indptr[i + 1]
        for j in L.indices[s:e]:
            assert pos_of[j] < pos_of[i]


def test_chow_patel_schedule_small():
    # dense 3x3: intersections known analytically
    from respatpu.formats import COOMatrix, coo_to_csr
    dense = np.array([[4.0, 1, 2], [1, 5, 1], [2, 1, 6]])
    r, c = np.nonzero(dense)
    a = coo_to_csr(COOMatrix((3, 3), r.astype(np.int32), c.astype(np.int32),
                             dense[r, c]))
    sched = chow_patel_schedule(a)
    assert sched.nnz == 9
    assert not sched.zero_diag.any()
    # entry (2,2): k in {0,1} both in row 2 and col 2 patterns -> 2 pairs
    p22 = 8  # last entry in row-major dense order
    assert (sched.pairs_a[p22] >= 0).sum() == 2


def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(0)
    a = laplacian_2d(20, 20)
    perm = rng.permutation(400).astype(np.int32)
    scrambled = permute_csr(a, perm)
    rcm = rcm_ordering(scrambled)
    restored = permute_csr(scrambled, rcm)

    def bandwidth(m):
        coo = m.tocoo()
        return int(np.abs(coo.row - coo.col).max())

    assert bandwidth(restored) < bandwidth(scrambled) / 2


def test_permute_csr_matches_scipy(rng):
    a = random_banded(50, 5, 4, seed=1)
    perm = rng.permutation(50).astype(np.int32)
    ours = permute_csr(a, perm).toarray()
    ref = to_scipy(a).toarray()[perm][:, perm]
    np.testing.assert_allclose(ours, ref)


def test_symbolic_fill_matches_scipy_lu():
    a = laplacian_2d(6, 5)
    filled = symbolic_fill_lu(a)
    # filled pattern must contain A's pattern
    sa = to_scipy(a)
    for i in range(a.nrows):
        acols = set(a.indices[a.indptr[i]:a.indptr[i + 1]])
        fcols = set(filled.indices[filled.indptr[i]:filled.indptr[i + 1]])
        assert acols <= fcols
        assert i in fcols
    # fill pattern must be sufficient for exact LU: run dense LU without
    # pivoting and check zeros outside the pattern stay zero
    dense = sa.toarray()
    n = a.nrows
    lu = dense.copy()
    for k in range(n):
        lu[k + 1:, k] /= lu[k, k]
        lu[k + 1:, k + 1:] -= np.outer(lu[k + 1:, k], lu[k, k + 1:])
    nzr, nzc = np.nonzero(np.abs(lu) > 1e-12)
    fset = {(i, j) for i in range(n)
            for j in filled.indices[filled.indptr[i]:filled.indptr[i + 1]]}
    for i, j in zip(nzr, nzc):
        assert (i, j) in fset, (i, j)


def test_mindeg_valid_and_reduces_fill():
    from respatpu.analysis import mindeg_ordering, ordering, symbolic_fill_lu
    from respatpu.bench.synth import powerlaw
    a = powerlaw(150, 4, seed=9)
    perm = mindeg_ordering(a)
    assert sorted(perm) == list(range(150))
    fill_md = symbolic_fill_lu(permute_csr(a, perm)).nnz
    fill_nat = symbolic_fill_lu(a).nnz
    assert fill_md <= fill_nat  # min-degree should not be worse than natural
    # dispatch API
    assert ordering(a, "natural").tolist() == list(range(150))
    import numpy as _np
    assert _np.array_equal(ordering(a, "mindeg"), perm)


def test_mindeg_python_fallback_matches_semantics():
    from respatpu import analysis
    from respatpu.analysis import mindeg_ordering
    from respatpu.bench.synth import random_banded
    a = random_banded(60, 5, 3, seed=2)
    p_native = mindeg_ordering(a)
    analysis._USE_NATIVE = False
    try:
        p_py = mindeg_ordering(a)
    finally:
        analysis._USE_NATIVE = True
    assert sorted(p_native) == list(range(60))
    assert sorted(p_py) == list(range(60))
