import numpy as np
import pytest
import scipy.sparse as sp

from respatpu.formats import (COOMatrix, CSRMatrix, build_ellr, coo_to_csr,
                              csr_transpose, split_triangular)
from respatpu.bench.synth import laplacian_2d, powerlaw, random_banded


def random_coo(rng, m=50, n=40, nnz=300, with_dups=True):
    row = rng.integers(0, m, nnz).astype(np.int32)
    col = rng.integers(0, n, nnz).astype(np.int32)
    val = rng.standard_normal(nnz)
    return COOMatrix((m, n), row, col, val)


def to_scipy(a: CSRMatrix):
    return sp.csr_matrix((a.data, a.indices, a.indptr), shape=a.shape)


def test_coo_to_csr_matches_scipy(rng):
    coo = random_coo(rng)
    ours = coo_to_csr(coo)
    ref = sp.coo_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.data, ref.data, rtol=1e-15)


def test_csr_sorted_per_row(rng):
    a = coo_to_csr(random_coo(rng))
    for i in range(a.nrows):
        s, e = a.indptr[i], a.indptr[i + 1]
        assert np.all(np.diff(a.indices[s:e]) > 0)


def test_transpose_roundtrip(rng):
    a = coo_to_csr(random_coo(rng))
    att = csr_transpose(csr_transpose(a))
    np.testing.assert_array_equal(a.indptr, att.indptr)
    np.testing.assert_array_equal(a.indices, att.indices)
    np.testing.assert_allclose(a.data, att.data)
    dense = a.toarray()
    np.testing.assert_allclose(csr_transpose(a).toarray(), dense.T)


@pytest.mark.parametrize("k", [None, 4, 16])
def test_ellr_reconstructs_matrix(rng, k):
    a = coo_to_csr(random_coo(rng, m=64, n=64, nnz=500))
    ell = build_ellr(a, k=k)
    dense = np.zeros(a.shape)
    part = np.zeros(ell.meta.nsub)
    # emulate device: partial = sum vals * x[cols]; combine
    x = rng.standard_normal(a.shape[1])
    for s in range(ell.meta.nsub):
        part[s] = np.dot(ell.vals[s], x[ell.cols[s]])
    y = np.zeros(a.shape[0])
    for i in range(a.shape[0]):
        y[i] = np.dot(part[ell.part_idx[i]], ell.part_mask[i])
    np.testing.assert_allclose(y, to_scipy(a) @ x, rtol=1e-10, atol=1e-12)


def test_ellr_long_row_split(rng):
    # one row much longer than K forces sub-row splitting
    m = 32
    row = np.concatenate([np.zeros(300, np.int32), rng.integers(0, m, 100).astype(np.int32)])
    col = np.concatenate([rng.permutation(512)[:300].astype(np.int32) % m * 0 + np.arange(300) % m,
                          rng.integers(0, m, 100).astype(np.int32)])
    val = rng.standard_normal(400)
    a = coo_to_csr(COOMatrix((m, m), row, col, val))
    ell = build_ellr(a, k=8)
    assert ell.meta.max_parts > 1
    x = rng.standard_normal(m)
    part = (ell.vals * x[ell.cols]).sum(axis=1)
    y = (part[ell.part_idx] * ell.part_mask).sum(axis=1)
    np.testing.assert_allclose(y, to_scipy(a) @ x, rtol=1e-12)


def test_split_triangular(rng):
    a = random_banded(60, 8, 5, seed=3)
    L, d, U = split_triangular(a)
    dense = a.toarray()
    np.testing.assert_allclose(L.toarray(), np.tril(dense, -1))
    np.testing.assert_allclose(U.toarray(), np.triu(dense))
    np.testing.assert_allclose(d, np.diag(dense))


def test_synth_generators():
    a = laplacian_2d(10, 12)
    assert a.shape == (120, 120)
    s = to_scipy(a)
    assert (s - s.T).nnz == 0  # symmetric
    b = powerlaw(200, 6, seed=1)
    assert b.nnz > 200
    assert np.all(b.diagonal() != 0)
