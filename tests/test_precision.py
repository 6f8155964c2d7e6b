import numpy as np
import jax
import jax.numpy as jnp
import pytest

from respatpu import precision as prec
from respatpu.precision import DF, df_from_f64, df_to_f64


def test_two_sum_exact(rng):
    a = rng.standard_normal(1000).astype(np.float32)
    b = (rng.standard_normal(1000) * 1e-6).astype(np.float32)
    s, e = jax.jit(prec.two_sum)(jnp.asarray(a), jnp.asarray(b))
    s, e = np.asarray(s, np.float64), np.asarray(e, np.float64)
    np.testing.assert_array_equal(s + e, a.astype(np.float64) + b.astype(np.float64))


def test_two_prod_exact(rng):
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = jax.jit(prec.two_prod)(jnp.asarray(a), jnp.asarray(b))
    p, e = np.asarray(p, np.float64), np.asarray(e, np.float64)
    np.testing.assert_array_equal(p + e, a.astype(np.float64) * b.astype(np.float64))


def test_df_roundtrip(rng):
    x = rng.standard_normal(100)
    # df64 carries ~49 significand bits: roundtrip is exact to ~2^-49 relative
    np.testing.assert_allclose(df_to_f64(df_from_f64(x)), x, rtol=4e-15)


@pytest.mark.parametrize("op,ref", [
    (prec.df_add, np.add),
    (prec.df_sub, np.subtract),
    (prec.df_mul, np.multiply),
    (prec.df_div, np.divide),
])
def test_df_arith_near_f64(rng, op, ref):
    x = rng.standard_normal(2000) * np.exp(rng.standard_normal(2000))
    y = rng.standard_normal(2000) * np.exp(rng.standard_normal(2000))
    r = df_to_f64(jax.jit(op)(df_from_f64(x), df_from_f64(y)))
    expect = ref(x, y)
    # double-float fp32 gives ~49-bit significand => rel err ~ 2^-48, measured
    # against input magnitude (cancellation in add/sub shrinks the result)
    scale = np.abs(x) + np.abs(y) + np.abs(expect)
    err = np.abs(r - expect) / scale
    assert err.max() < 1e-13, err.max()


def test_df_sum_accuracy(rng):
    # ill-conditioned sum: large + many smalls; df64 error bound scales with
    # the largest intermediate magnitude (1e8 * 2^-49 ~ 1.8e-7)
    x = np.concatenate([[1e8], rng.standard_normal(4096) * 1e-4, [-1e8]])
    s = df_to_f64(jax.jit(prec.df_sum)(df_from_f64(x)))
    np.testing.assert_allclose(float(s), x.sum(), rtol=1e-10, atol=1e-6)
    # well-conditioned case must be near-exact
    y = rng.standard_normal(4096)
    s2 = df_to_f64(jax.jit(prec.df_sum)(df_from_f64(y)))
    np.testing.assert_allclose(float(s2), y.sum(), rtol=1e-12, atol=1e-12)


def test_eft_selfcheck():
    assert prec.eft_selfcheck(warn=False)


def test_df_sum_axis(rng):
    x = rng.standard_normal((7, 33))
    s = df_to_f64(jax.jit(lambda v: prec.df_sum(v, axis=1))(df_from_f64(x)))
    np.testing.assert_allclose(s, x.sum(axis=1), rtol=1e-12)


def test_df_dot_norm(rng):
    x = rng.standard_normal(513)
    y = rng.standard_normal(513)
    d = df_to_f64(jax.jit(prec.df_dot)(df_from_f64(x), df_from_f64(y)))
    np.testing.assert_allclose(float(d), np.dot(x, y), rtol=1e-12)
    n = df_to_f64(jax.jit(prec.df_norm2)(df_from_f64(x)))
    np.testing.assert_allclose(float(n), np.linalg.norm(x), rtol=1e-12)


def test_df_norm2_zero():
    z = df_from_f64(np.zeros(8))
    assert float(df_to_f64(jax.jit(prec.df_norm2)(z))) == 0.0


def test_ftz():
    x = jnp.asarray([1.0, 1e-40, -1e-40, 1e-30], jnp.float32)
    y = np.asarray(prec.ftz(x))
    assert y[1] == 0 and y[2] == 0
    assert y[0] == 1.0 and y[3] != 0


def test_downcast_check():
    v = np.array([1.0, 1e39, -1e39, 2.0])
    out, n_over = prec.downcast_check(v)
    assert n_over == 2
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_policy_lookup():
    assert prec.get_policy("fp64").double_word
    assert prec.get_policy("bf16").dtype == jnp.bfloat16
    assert prec.get_policy("fp32_ftz").flush_to_zero
    with pytest.raises(ValueError):
        prec.get_policy("fp16x")
