"""Decorated (assembly-bias) HOD predictions through tabulated percentile
bins (BASELINE config #3: decorated HOD with secondary-property bins)."""

import jax.numpy as jnp
import numpy as np

import tabcorr_tpu as tt
from tabcorr_tpu.predictor import make_multi_predictor, make_predictor, params_batch


def _assembias_model(strength):
    model = tt.AssembiasZheng07Model(
        threshold=-21, redshift=0.5, prim_haloprop_key="halo_m258m",
        sec_haloprop_key="halo_nfw_conc")
    model.param_dict["mean_occupation_centrals_assembias_param1"] = strength
    model.param_dict["mean_occupation_satellites_assembias_param1"] = \
        strength
    model.param_dict["log_eta"] = 0.0
    return model


def test_fixture_has_percentile_bins(ds_interpolator):
    tab = ds_interpolator.tabcorr_list[0]
    assert len(np.unique(tab.gal_type["sec_haloprop_percentile"])) == 2


def test_assembias_changes_predictions(ds_interpolator):
    tab = ds_interpolator.tabcorr_list[0]
    base = _assembias_model(0.0)
    decorated = _assembias_model(0.8)

    ngal_0, ds_0 = tab.predict(base, check_consistency=False)
    ngal_1, ds_1 = tab.predict(decorated, check_consistency=False)
    # Assembly bias re-weights high- vs low-concentration bins at fixed
    # mass: the number density is (nearly) conserved but the clustering
    # amplitude shifts.
    assert np.isclose(ngal_0, ngal_1, rtol=1e-3)
    assert not np.allclose(ds_0, ds_1, rtol=1e-4)


def test_assembias_batched_predictor(ds_interpolator):
    tab = ds_interpolator.tabcorr_list[0]
    model = _assembias_model(0.5)
    f = make_predictor(tab, model, dtype=jnp.float64)
    strengths = np.linspace(-0.9, 0.9, 8)
    params = params_batch(
        model, {"mean_occupation_centrals_assembias_param1": strengths},
        (8,), dtype=jnp.float64)
    ngal, ds = f(params)
    assert ds.shape == (8, 13)
    # Each batch element matches the scalar host path.
    for i in [0, 4, 7]:
        model.param_dict["mean_occupation_centrals_assembias_param1"] = \
            strengths[i]
        ngal_i, ds_i = tab.predict(model, check_consistency=False)
        np.testing.assert_allclose(np.asarray(ds[i]), ds_i, rtol=1e-10)


def test_multi_predictor(wp_tabcorr, ds_tabcorr, bol_model):
    f = make_multi_predictor([wp_tabcorr, ds_tabcorr], bol_model,
                             dtype=jnp.float64)
    params = params_batch(bol_model, {}, (4,), dtype=jnp.float64)
    (ngal_wp, wp), (ngal_ds, ds) = f(params)
    assert wp.shape == (4, 19)
    assert ds.shape == (4, 19)
    want_wp = wp_tabcorr.predict(bol_model, check_consistency=False)
    want_ds = ds_tabcorr.predict(bol_model, check_consistency=False)
    np.testing.assert_allclose(np.asarray(wp[0]), want_wp[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ds[0]), want_ds[1], rtol=1e-10)
