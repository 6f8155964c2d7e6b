import numpy as np
import jax
import pytest

from respatpu.kernels.ozaki import ozaki_matmul
from respatpu.precision import df_from_f64, df_to_f64


def rel_err(got, ref):
    scale = np.abs(ref).max() + 1e-300
    return np.abs(got - ref).max() / scale


def test_ozaki_matmul_accuracy(rng):
    a = rng.standard_normal((96, 120))
    b = rng.standard_normal((120, 64))
    c = df_to_f64(ozaki_matmul(df_from_f64(a), df_from_f64(b)))
    assert rel_err(c, a @ b) < 1e-13


def test_ozaki_matmul_kpanels(rng):
    # K > 256 exercises panel splitting
    a = rng.standard_normal((40, 700))
    b = rng.standard_normal((700, 48))
    c = df_to_f64(ozaki_matmul(df_from_f64(a), df_from_f64(b)))
    assert rel_err(c, a @ b) < 1e-13


def test_ozaki_matmul_scaled_rows(rng):
    # graded rows/cols: per-row/col exponent grids must absorb the scaling
    a = rng.standard_normal((64, 64)) * (10.0 ** rng.integers(-6, 6, (64, 1)))
    b = rng.standard_normal((64, 64)) * (10.0 ** rng.integers(-6, 6, (1, 64)))
    c = df_to_f64(ozaki_matmul(df_from_f64(a), df_from_f64(b)))
    assert rel_err(c, a @ b) < 1e-12


def test_ozaki_beats_fp32_by_many_digits(rng):
    a = rng.standard_normal((128, 256))
    b = rng.standard_normal((256, 128))
    ref = a @ b
    c64 = df_to_f64(ozaki_matmul(df_from_f64(a), df_from_f64(b)))
    c32 = (a.astype(np.float32) @ b.astype(np.float32)).astype(np.float64)
    assert rel_err(c64, ref) < 1e-6 * rel_err(c32, ref)


def test_ozaki_zeros_and_ones():
    import numpy as np
    a = np.zeros((8, 8))
    b = np.eye(8)
    c = df_to_f64(ozaki_matmul(df_from_f64(a), df_from_f64(b)))
    np.testing.assert_array_equal(c, np.zeros((8, 8)))
    c2 = df_to_f64(ozaki_matmul(df_from_f64(b), df_from_f64(b)))
    np.testing.assert_allclose(c2, np.eye(8), atol=1e-15)
