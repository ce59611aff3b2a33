"""HOD occupation model tests."""

import numpy as np
import pytest
from scipy.special import erf

import tabcorr_tpu as tt
from tabcorr_tpu.models import (AssembiasZheng07Model, Zheng07Model,
                                heaviside_assembias)
from tabcorr_tpu.models.zheng07 import ZHENG07_THRESHOLD_PARAMS


def test_zheng07_centrals_formula():
    model = Zheng07Model(threshold=-20)
    mass = np.logspace(10, 15, 101)
    got = model.mean_occupation_centrals(prim_haloprop=mass)
    p = model.param_dict
    x = (np.log10(mass) - p["logMmin"]) / p["sigma_logM"]
    # The (1 + erf)/2 form underflows the deep tail in float64 (erf(x)
    # rounds to -1); the erfc form is the same function evaluated
    # tail-accurately, so the oracle must use it too.
    from scipy.special import erfc
    want = 0.5 * erfc(-x)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(got, 0.5 * (1 + erf(x)), rtol=1e-9,
                               atol=1e-12)
    assert np.all(got >= 0) and np.all(got <= 1)


def test_zheng07_satellites_formula():
    model = Zheng07Model(threshold=-20)
    mass = np.logspace(10, 15, 101)
    got = model.mean_occupation_satellites(prim_haloprop=mass)
    p = model.param_dict
    m0, m1 = 10 ** p["logM0"], 10 ** p["logM1"]
    want = np.where(mass > m0, ((mass - m0) / m1) ** p["alpha"], 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_zheng07_satellites_modulated():
    plain = Zheng07Model(threshold=-20)
    mod = Zheng07Model(threshold=-20, modulate_with_cenocc=True)
    mass = np.logspace(11, 15, 41)
    ncen = plain.mean_occupation_centrals(prim_haloprop=mass)
    np.testing.assert_allclose(
        mod.mean_occupation_satellites(prim_haloprop=mass),
        ncen * plain.mean_occupation_satellites(prim_haloprop=mass),
        rtol=1e-12)


def test_zheng07_threshold_table():
    # All Zheng07 Table 1 thresholds instantiate with 5 parameters.
    for threshold, params in ZHENG07_THRESHOLD_PARAMS.items():
        model = Zheng07Model(threshold=threshold)
        for key, value in params.items():
            assert model.param_dict[key] == value
    with pytest.raises(ValueError):
        Zheng07Model(threshold=-17.0)


def test_param_overrides():
    model = Zheng07Model(threshold=-20, logMmin=13.0)
    assert model.param_dict["logMmin"] == 13.0
    with pytest.raises(ValueError):
        Zheng07Model(threshold=-20, not_a_param=1.0)


def test_assembias_mean_preservation():
    # Averaging the decorated occupation over the percentile distribution
    # must recover the baseline at every mass (the defining property of the
    # Heaviside decoration).
    model = AssembiasZheng07Model(threshold=-20)
    model.param_dict["mean_occupation_centrals_assembias_param1"] = 0.7
    model.param_dict["mean_occupation_satellites_assembias_param1"] = -0.4
    base = Zheng07Model(threshold=-20)

    mass = np.logspace(11, 15, 41)
    for split in [0.5]:
        perc = np.linspace(0.0005, 0.9995, 1000)
        for fn, base_fn in [
                (model.mean_occupation_centrals,
                 base.mean_occupation_centrals),
                (model.mean_occupation_satellites,
                 base.mean_occupation_satellites)]:
            occ = np.array([fn(prim_haloprop=mass,
                                sec_haloprop_percentile=np.full_like(mass, q))
                            for q in perc])
            np.testing.assert_allclose(
                occ.mean(axis=0), base_fn(prim_haloprop=mass),
                rtol=1e-9, atol=1e-13)


def test_assembias_bounds_respected():
    model = AssembiasZheng07Model(threshold=-20)
    mass = np.logspace(10, 15.5, 201)
    for strength in [-1.0, -0.5, 0.5, 1.0]:
        model.param_dict["mean_occupation_centrals_assembias_param1"] = \
            strength
        model.param_dict["mean_occupation_satellites_assembias_param1"] = \
            strength
        for perc in [0.1, 0.9]:
            q = np.full_like(mass, perc)
            ncen = model.mean_occupation_centrals(
                prim_haloprop=mass, sec_haloprop_percentile=q)
            nsat = model.mean_occupation_satellites(
                prim_haloprop=mass, sec_haloprop_percentile=q)
            assert np.all(ncen >= -1e-12) and np.all(ncen <= 1 + 1e-12)
            assert np.all(nsat >= -1e-12)


def test_assembias_zero_strength_is_baseline():
    model = AssembiasZheng07Model(threshold=-20)
    base = Zheng07Model(threshold=-20)
    mass = np.logspace(11, 15, 41)
    q = np.full_like(mass, 0.8)
    np.testing.assert_allclose(
        model.mean_occupation_centrals(
            prim_haloprop=mass, sec_haloprop_percentile=q),
        base.mean_occupation_centrals(prim_haloprop=mass), rtol=1e-12)


def test_heaviside_assembias_direction():
    # Positive strength boosts the above-split population.
    base = np.array([0.5])
    hi = heaviside_assembias(base, 0.5, np.array([0.9]))
    lo = heaviside_assembias(base, 0.5, np.array([0.1]))
    assert float(hi[0]) > 0.5 > float(lo[0])


def test_functional_hod_model(wp_tabcorr=None):
    import numpy as np
    from tabcorr_tpu.models import FunctionalHodModel
    from tabcorr_tpu.utils.backend import get_namespace

    def smooth_cen(params, log_m, sec):
        xp = get_namespace(log_m)
        return 1.0 / (1.0 + xp.exp(-(log_m - params["logMmin"]) * 5.0))

    def power_sat(params, log_m, sec):
        return 10.0 ** (params["alpha"] * (log_m - params["logM1"]))

    model = FunctionalHodModel(
        smooth_cen, power_sat,
        {"logMmin": 12.0, "logM1": 13.5, "alpha": 1.0}, redshift=0.0)

    mass = np.logspace(11, 15, 21)
    ncen = model.mean_occupation_centrals(prim_haloprop=mass)
    nsat = model.mean_occupation_satellites(prim_haloprop=mass)
    assert np.all((ncen >= 0) & (ncen <= 1))
    np.testing.assert_allclose(nsat, (mass / 10**13.5), rtol=1e-10)

    model.param_dict["alpha"] = 2.0
    nsat2 = model.mean_occupation_satellites(prim_haloprop=mass)
    np.testing.assert_allclose(nsat2, (mass / 10**13.5) ** 2, rtol=1e-9)


def test_functional_model_predicts(request):
    import numpy as np
    import jax.numpy as jnp
    import tabcorr_tpu as tt
    from tabcorr_tpu.models import FunctionalHodModel
    from tabcorr_tpu.predictor import make_predictor, params_batch
    from tabcorr_tpu.utils.backend import erf, get_namespace

    wp_tab = request.getfixturevalue("wp_tabcorr")

    def cen(params, log_m, sec):
        return 0.5 * (1 + erf((log_m - params["logMmin"]) / 0.3))

    def sat(params, log_m, sec):
        xp = get_namespace(log_m)
        return xp.maximum(10.0 ** (log_m - params["logM1"]) - 0.01, 0.0)

    model = FunctionalHodModel(
        cen, sat, {"logMmin": 11.5, "logM1": 12.5},
        redshift=wp_tab.attrs["redshift"], prim_haloprop_key="halo_mvir")

    ngal, wp = wp_tab.predict(model, check_consistency=False)
    assert np.isfinite(ngal) and np.all(np.isfinite(wp))

    f = make_predictor(wp_tab, model, dtype=jnp.float64)
    params = params_batch(model, {}, (3,), dtype=jnp.float64)
    ngal_b, wp_b = f(params)
    np.testing.assert_allclose(np.asarray(wp_b[0]), wp, rtol=1e-12)


def test_erf_erfc_poly_accuracy():
    # The Pallas-lowerable polynomial erf/erfc (utils.backend) against
    # scipy: absolute accuracy everywhere, RELATIVE accuracy on the
    # complementary tail (what deep-tail halo occupations need).
    from scipy.special import erf as erf_sp, erfc as erfc_sp

    from tabcorr_tpu.utils.backend import erf_poly, erfc_poly

    # Bounds are the deg-8 Chebyshev fit error (~5e-8 relative) — an
    # order below the ~3-ulp float32 device evaluation noise that sets
    # the actual occupation error contract.
    x = np.linspace(-6, 6, 200001)
    assert np.max(np.abs(erf_poly(x) - erf_sp(x))) < 5e-8
    z = np.linspace(0, 5.9, 100001)
    rel = np.abs(erfc_poly(z) / erfc_sp(z) - 1)
    assert rel.max() < 1e-7


def test_pallas_lowering_context_switches_erf():
    import jax.numpy as jnp

    from tabcorr_tpu.utils import backend

    x = jnp.linspace(-3, 3, 64)
    plain = np.asarray(backend.erf(x))
    with backend.pallas_lowering():
        poly = np.asarray(backend.erf(x))
    np.testing.assert_allclose(poly, plain, atol=1e-6)
    # numpy inputs keep scipy regardless.
    assert backend.erf(0.5) == backend.erf(np.float64(0.5))


def test_zheng07_centrals_tail_is_relative_accurate():
    # The erfc form keeps the deep tail; the (1+erf)/2 form would return
    # exactly 0 below ~1e-17.
    from scipy.special import erfc

    model = Zheng07Model(threshold=-20)
    p = model.param_dict
    mass = 10.0 ** np.array([p["logMmin"] - 5 * p["sigma_logM"]])
    got = model.mean_occupation_centrals(prim_haloprop=mass)
    want = 0.5 * erfc(5 / np.sqrt(1))  # x = -5 sigma
    np.testing.assert_allclose(got, 0.5 * erfc(5.0), rtol=1e-10)
    assert got[0] > 0


def test_occupation_residual_matches_jvp_fallback():
    # The analytic residual absorption (zheng07 / assembias overrides)
    # must agree with the generic first-order JVP fallback to second
    # order in the ~ulp/2 node residual, for both galaxy types.
    import jax.numpy as jnp

    from tabcorr_tpu.models.assembias import AssembiasZheng07Model
    from tabcorr_tpu.models.protocol import HodModel

    model = AssembiasZheng07Model(threshold=-20)
    model.param_dict["mean_occupation_centrals_assembias_param1"] = 0.4
    model.param_dict["mean_occupation_satellites_assembias_param1"] = -0.3
    params = {k: jnp.float64(v) for k, v in model.param_dict.items()}
    logm = jnp.linspace(10.5, 15.2, 64, dtype=jnp.float64)
    res = jnp.asarray(
        np.random.default_rng(3).uniform(-5e-7, 5e-7, 64))
    sec = jnp.full(64, 0.7, dtype=jnp.float64)

    for gal_type in model.gal_types:
        exact = model.occupation_residual(params, gal_type, logm, res, sec)
        generic = HodModel.occupation_residual(
            model, params, gal_type, logm, res, sec)
        base = model.occupation(params, gal_type, logm, sec)
        # Difference bounded by the second-order term ~ occ'' res^2.
        np.testing.assert_allclose(np.asarray(exact), np.asarray(generic),
                                   atol=1e-10, rtol=1e-6)
        # And the residual actually moves the occupation (not a no-op).
        assert np.max(np.abs(np.asarray(exact - base))) > 0
