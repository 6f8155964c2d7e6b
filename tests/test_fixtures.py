"""Fixture-based loader smoke tests (the C4 role: ReadMatrixMarket/test/test.cpp)."""
import os

import numpy as np
import pytest
import scipy.io
import scipy.sparse as sp

from respatpu.io import load_csr, read_header

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def fixture(name):
    return os.path.join(FIXTURES, name)


def test_one_mtx():
    a = load_csr(fixture("one.mtx"))
    assert a.shape == (1, 1)
    assert a.nnz == 1
    assert a.data[0] == 7.5


@pytest.mark.parametrize("name", ["one.mtx", "tiny_sym.mtx", "tiny_pattern.mtx"])
def test_fixture_matches_scipy(name):
    ours = load_csr(fixture(name)).toarray()
    ref = sp.csr_matrix(scipy.io.mmread(fixture(name))).toarray()
    np.testing.assert_allclose(ours, ref)


def test_header_fields():
    h = read_header(fixture("tiny_sym.mtx"))
    assert h.symmetry == "symmetric"
    assert (h.nrows, h.ncols, h.nnz) == (4, 4, 6)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp
    from respatpu.timing import profile_trace
    d = str(tmp_path / "trace")
    with profile_trace(d):
        _ = jnp.ones(8).sum()
    assert os.path.isdir(d)
