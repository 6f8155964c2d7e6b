import numpy as np
import pytest

from respatpu import persist
from respatpu import solve as slv
from respatpu.bench.synth import laplacian_2d, random_banded


def test_band_factorization_roundtrip(tmp_path):
    a = random_banded(120, 6, 4, seed=21)
    b, x_true = slv.make_rhs_for_known_x(a)
    fac = slv.factorize_band(a, policy="fp32")
    x1 = fac.solve(b)
    p = str(tmp_path / "fac.npz")
    persist.save_band_factorization(p, fac)
    fac2 = persist.load_band_factorization(p, a)
    x2 = fac2.solve(b)
    np.testing.assert_allclose(x1, x2, rtol=1e-6)
    assert fac2.report.residual < 1e-3


def test_csr_roundtrip(tmp_path):
    a = laplacian_2d(7, 9)
    p = str(tmp_path / "a.npz")
    persist.save_csr(p, a)
    b = persist.load_csr_npz(p)
    assert b.shape == a.shape
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.data, b.data)


def test_cli_lu(tmp_path, capsys):
    from respatpu.cli import main
    from respatpu.io import write_mtx
    a = laplacian_2d(10, 10)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, a)
    main(["lu", p, "--policy", "df64"])
    out = capsys.readouterr().out
    assert "rel_residual" in out
    resid = float(out.split("rel_residual=")[1].split()[0])
    assert resid < 1e-10


def test_cli_spmv(tmp_path, capsys):
    from respatpu.cli import main
    from respatpu.io import write_mtx
    a = random_banded(80, 5, 4, seed=2)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, a)
    main(["spmv", p, "--policy", "fp32", "--reps", "1"])
    out = capsys.readouterr().out
    assert "mean_abs_err" in out
