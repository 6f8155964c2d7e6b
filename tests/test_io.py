import numpy as np
import pytest
import scipy.io
import scipy.sparse as sp

from respatpu.io import load_coo, load_csr, read_header, write_mtx
from respatpu.formats import coo_to_csr


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


GENERAL = """%%MatrixMarket matrix coordinate real general
% comment line
4 4 6
1 1 2.0
1 2 -1.0
2 2 3.5
3 1 0.5
4 4 1.25
3 3 -2.0
"""

SYMMETRIC = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 2.0
2 1 -1.0
3 2 -1.5
3 3 4.0
"""

SKEW = """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 1.0
3 2 -2.0
"""

PATTERN = """%%MatrixMarket matrix coordinate pattern general
3 4 3
1 1
2 3
3 4
"""

ARRAY = """%%MatrixMarket matrix array real general
2 3
1.0
2.0
3.0
4.0
5.0
6.0
"""


def test_header(tmp_path):
    p = write(tmp_path, "g.mtx", GENERAL)
    h = read_header(p)
    assert (h.nrows, h.ncols, h.nnz) == (4, 4, 6)
    assert h.symmetry == "general"


@pytest.mark.parametrize("text,name", [(GENERAL, "g"), (SYMMETRIC, "s"),
                                       (SKEW, "k"), (PATTERN, "p")])
def test_load_matches_scipy(tmp_path, text, name):
    p = write(tmp_path, f"{name}.mtx", text)
    ours = load_csr(p)
    ref = sp.csr_matrix(scipy.io.mmread(p))
    ref.sort_indices()
    np.testing.assert_array_equal(ours.indptr, ref.indptr)
    np.testing.assert_array_equal(ours.indices, ref.indices)
    np.testing.assert_allclose(ours.data, ref.toarray()[ours.toarray() != 0])


def test_symmetric_expansion_full(tmp_path):
    """The reference drops mirrored entries (SURVEY.md quirk #1); we must not."""
    p = write(tmp_path, "s.mtx", SYMMETRIC)
    a = load_csr(p)
    assert a.nnz == 6  # 4 stored + 2 mirrored off-diagonals
    dense = a.toarray()
    np.testing.assert_allclose(dense, dense.T)


def test_skew_expansion(tmp_path):
    p = write(tmp_path, "k.mtx", SKEW)
    dense = load_csr(p).toarray()
    np.testing.assert_allclose(dense, -dense.T)


def test_transpose_on_load(tmp_path):
    p = write(tmp_path, "g.mtx", GENERAL)
    a = load_csr(p)
    at = load_csr(p, transpose=True)
    np.testing.assert_allclose(at.toarray(), a.toarray().T)


def test_array_format(tmp_path):
    p = write(tmp_path, "a.mtx", ARRAY)
    a = load_csr(p)
    ref = np.array([[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]])
    np.testing.assert_allclose(a.toarray(), ref)


def test_zero_based_detection(tmp_path):
    text = """%%MatrixMarket matrix coordinate real general
3 3 3
0 0 1.0
1 1 2.0
2 2 3.0
"""
    a = load_csr(write(tmp_path, "z.mtx", text))
    np.testing.assert_allclose(a.toarray(), np.diag([1.0, 2.0, 3.0]))


def test_write_roundtrip(tmp_path, rng):
    from tests.test_formats import random_coo
    a = coo_to_csr(random_coo(rng, m=20, n=30, nnz=80))
    p = str(tmp_path / "rt.mtx")
    write_mtx(p, a, comment="roundtrip")
    b = load_csr(p)
    np.testing.assert_allclose(b.toarray(), a.toarray(), rtol=1e-15)
