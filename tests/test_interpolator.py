"""Interpolator and spline-engine tests."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import interp1d

import tabcorr_tpu as tt
from tabcorr_tpu.interpolator import (spline_eval, spline_interpolate,
                                      spline_interpolation_matrix)


def test_spline_matches_scipy_1d():
    # The not-a-knot spline must agree with scipy interp1d(kind='cubic'),
    # mirroring the reference's own test (tests/test_general.py:46-69).
    rng = np.random.default_rng(0)
    xp = np.sort(rng.uniform(-2, 2, size=7))
    yp = rng.normal(size=(7, 5))
    a = spline_interpolation_matrix(xp)
    scipy_spline = interp1d(xp, yp, kind="cubic", axis=0)
    for x in np.linspace(xp[0], xp[-1], 17):
        got = spline_interpolate(np.array([x]), [xp], [a], yp)
        np.testing.assert_allclose(got, scipy_spline(x), rtol=1e-9,
                                   atol=1e-12)


def test_spline_multidimensional():
    # Multi-D interpolation of a polynomial that a cubic grid spline
    # represents exactly.
    xp0 = np.linspace(0.0, 1.0, 5)
    xp1 = np.linspace(-1.0, 2.0, 4)

    def f(u, v):
        return 2 + u ** 3 - 2 * u + 0.5 * v ** 2 + u * v

    grid = f(xp0[:, None], xp1[None, :])
    a = [spline_interpolation_matrix(xp0), spline_interpolation_matrix(xp1)]
    for u, v in [(0.3, 0.7), (0.91, -0.5), (0.0, 2.0), (1.0, -1.0)]:
        got = spline_interpolate(np.array([u, v]), [xp0, xp1], a, grid)
        assert np.isclose(got, f(u, v), rtol=1e-10)


def test_spline_extrapolation_flag():
    xp = np.linspace(0, 1, 5)
    yp = xp ** 2
    a = spline_interpolation_matrix(xp)
    with pytest.raises(ValueError):
        spline_interpolate(np.array([1.5]), [xp], [a], yp)
    val = spline_interpolate(np.array([1.5]), [xp], [a], yp,
                             extrapolate=True)
    assert np.isfinite(val)


def test_spline_requires_4_points():
    with pytest.raises(ValueError):
        spline_interpolation_matrix(np.array([0.0, 1.0, 2.0]))


def test_spline_eval_jax_matches_host():
    rng = np.random.default_rng(3)
    xp = np.sort(rng.uniform(0, 1, size=6))
    yp = rng.normal(size=(6, 3))
    a = spline_interpolation_matrix(xp)
    xp_j, a_j, yp_j = jnp.asarray(xp), jnp.asarray(a), jnp.asarray(yp)
    for x in np.linspace(xp[0], xp[-1], 9):
        got = spline_eval(jnp.float64(x), xp_j, a_j, yp_j)
        want = spline_interpolate(np.array([x]), [xp], [a], yp)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_interpolator_matches_scipy(ds_interpolator, model):
    # Mirror of the reference's test_interpolator (tests/test_general.py:46-69)
    # along the log_eta axis of the checked-in fixture.
    config = tt.database.configuration("efficient")
    bins = np.log10(config["conc_gal_bias_bins"])

    xi_bins = []
    for x in bins:
        model.param_dict["log_eta"] = x
        xi_bins.append(ds_interpolator.predict(model)[1])
    xi_bins = np.array(xi_bins)

    for x in np.linspace(bins.min(), bins.max(), 10):
        model.param_dict["log_eta"] = x
        xi_tabcorr = ds_interpolator.predict(model)[1]
        xi_scipy = [interp1d(bins, xi_bins[:, i], kind="cubic")(x)
                    for i in range(len(xi_tabcorr))]
        np.testing.assert_allclose(xi_tabcorr, xi_scipy, rtol=1e-7)


def test_interpolator_separate_gal_type_sums(ds_interpolator, model):
    ngal, xi = ds_interpolator.predict(model)
    ngal_sep, xi_sep = ds_interpolator.predict(model, separate_gal_type=True)
    assert np.isclose(ngal, sum(ngal_sep.values()), atol=0, rtol=1e-6)
    np.testing.assert_allclose(
        xi, np.sum(list(xi_sep.values()), axis=0), atol=0, rtol=1e-6)


def test_interpolator_missing_param_raises(ds_interpolator):
    m = tt.Zheng07Model(threshold=-21, redshift=0.5,
                        prim_haloprop_key="halo_m258m")
    with pytest.raises(ValueError, match="log_eta"):
        ds_interpolator.predict(m)


def test_interpolator_extrapolation(ds_interpolator, model):
    model.param_dict["log_eta"] = 5.0
    with pytest.raises(ValueError):
        ds_interpolator.predict(model)
    ngal, xi = ds_interpolator.predict(model, extrapolate=True)
    assert np.all(np.isfinite(xi))


def test_interpolator_grid_validation(ds_interpolator):
    from tabcorr_tpu.io import ColumnTable
    tabs = ds_interpolator.tabcorr_list[:3]
    bad = ColumnTable({"log_eta": np.array([0.0, 1.0, 1.0])})
    with pytest.raises(ValueError):
        tt.Interpolator(tabs, bad)
    with pytest.raises(ValueError):
        tt.Interpolator(tabs[:2], bad)


def test_interpolator_gradient_through_spline(ds_interpolator, model):
    # The spline interpolation over the parameter grid is differentiable:
    # d(prediction)/d(log_eta) through the jitted predictor must match a
    # central finite difference of the host float64 path.  This is the
    # property that lets HMC/NUTS sample phase-space parameters (the
    # reference's numpy pipeline has no derivatives at all).
    import copy

    import jax
    from tabcorr_tpu.predictor import make_predictor, params_batch

    f = make_predictor(ds_interpolator, model, dtype=jnp.float64,
                       vectorized=False, jit=False)
    base = {k: jnp.float64(v) for k, v in model.param_dict.items()}

    def scalar(log_eta):
        p = dict(base)
        p["log_eta"] = log_eta
        ngal, ds = f(p)
        return jnp.sum(ds)

    x0 = jnp.float64(model.param_dict["log_eta"] + 0.013)
    g = jax.grad(scalar)(x0)

    eps = 1e-4
    m_hi, m_lo = copy.deepcopy(model), copy.deepcopy(model)
    m_hi.param_dict["log_eta"] = float(x0) + eps
    m_lo.param_dict["log_eta"] = float(x0) - eps
    _, ds_hi = ds_interpolator.predict(m_hi, check_consistency=False)
    _, ds_lo = ds_interpolator.predict(m_lo, check_consistency=False)
    fd = (np.sum(ds_hi) - np.sum(ds_lo)) / (2 * eps)

    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)
