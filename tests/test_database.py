"""Database and cosmology registry tests."""

import numpy as np
import pytest

import tabcorr_tpu as tt
from tabcorr_tpu import cosmology as cosmo_mod
from tabcorr_tpu.database import (configuration, cosmology, directory, read,
                                  simulation_name)

from conftest import COSMO, REDSHIFT, SUITE


def test_configuration_registry():
    config = configuration("default")
    assert len(config["s_bins"]) == 15
    assert config["pi_max"] == 80
    assert config["sats_per_prim_haloprop"] == 2e-13

    config = configuration("efficient")
    assert len(config["rp_ds_bins"]) == 14
    assert config["sats_per_prim_haloprop"] == 1e-13
    assert callable(config["downsample"])
    assert config["downsample"](1e13) == 1.0

    # Mixins: first match wins (reference: database.py:37-69).
    config = configuration("efficient_aemulus")
    assert len(config["s_bins"]) == 10
    assert config["sats_per_prim_haloprop"] == 1e-13
    assert config["cosmo_obs"] is None

    with pytest.raises(ValueError):
        configuration("bogus")


@pytest.mark.parametrize("suite", ["AemulusAlpha", "AbacusSummit"])
def test_cosmology_registry(suite):
    # Mirrors the reference test (tests/test_database.py:34-41).
    cosmo = cosmology(suite)
    for attr in ["sigma8", "ns", "alphas"]:
        assert attr in str(cosmo)
        assert np.isfinite(getattr(cosmo, attr))


def test_cosmology_abacus_values():
    cosmo = cosmology("AbacusSummit", 0)
    # abacus_cosm000: Planck 2018 baseline.
    assert np.isclose(cosmo.H0, 67.36)
    assert np.isclose(cosmo.Om0, (0.02237 + 0.12) / 0.6736**2)
    assert np.isclose(cosmo.sigma8, 0.811355)
    assert np.isclose(cosmo.m_nu[0], 0.00064420 * 93.04)
    assert len(cosmo.m_nu) == 3
    with pytest.raises(ValueError):
        cosmology("AbacusSummit", 999)


def test_cosmology_aemulus_ranges():
    for i in [0, 39, 40, 46]:
        cosmo = cosmology("AemulusAlpha", i)
        assert 50 < cosmo.H0 < 90
    with pytest.raises(ValueError):
        cosmology("AemulusAlpha", 47)
    with pytest.raises(ValueError):
        cosmology("nope", 0)


def test_simulation_name():
    assert simulation_name("AbacusSummit", 0, 0) == "base_c000_ph000"
    assert simulation_name("AbacusSummit", 1, 2, "high") == "high_c001_ph002"
    assert simulation_name("AemulusAlpha", 5) == "Box005"
    assert simulation_name("AemulusAlpha", 42, 3) == "TestBox002-003"
    with pytest.raises(ValueError):
        simulation_name("AemulusAlpha", 42, 7)


def test_directory_and_read(ds_interpolator):
    path = directory(SUITE, REDSHIFT, i_cosmo=COSMO)
    assert path.name == "0p50"
    assert path.parent.name == "base_c000_ph000"
    halotab = read(SUITE, REDSHIFT, "ds", tab_config="efficient")
    assert len(halotab.tabcorr_list) == 4
    # Back-compat alias (reference: database.py:290).
    assert tt.database.tabcorr is tt.database.read


def test_directory_requires_env(monkeypatch):
    monkeypatch.delenv("TABCORR_DATABASE")
    with pytest.raises(RuntimeError):
        directory(SUITE, REDSHIFT)


def test_flat_flrw_closure():
    # Density parameters must sum to exactly 1 at z=0 (flatness).
    cosmo = cosmo_mod.Planck15
    assert np.isclose(cosmo.efunc(0.0), 1.0, rtol=1e-12)
    total = cosmo.Om0 + cosmo.Ode0 + cosmo.Ogamma0 + cosmo.Onu0
    assert np.isclose(total, 1.0, rtol=1e-14)


def test_flat_flrw_eds_analytic():
    # Einstein-de Sitter: D_C(z) = 2 c/H0 (1 - 1/sqrt(1+z)) exactly.
    cosmo = cosmo_mod.FlatFLRW(H0=70.0, Om0=1.0, Tcmb0=0.0, Neff=0)
    for z in [0.1, 0.5, 2.0]:
        want = 2 * cosmo.hubble_distance * (1 - 1 / np.sqrt(1 + z))
        assert np.isclose(cosmo.comoving_distance(z), want, rtol=1e-10)


def test_flat_flrw_planck15_values():
    # Independently derived anchors: E(0.5) analytically from the Friedmann
    # equation with Om0=0.3089, and chi(0.5) via Simpson integration of
    # c/H0 * 1/E; matter-only E ignores the ~1e-4 radiation terms.
    cosmo = cosmo_mod.Planck15
    e_matter = np.sqrt(0.3089 * 1.5**3 + (1 - 0.3089))
    # Massive neutrinos + photons shift E by ~1e-3 relative to matter-only.
    assert np.isclose(cosmo.efunc(0.5), e_matter, rtol=3e-3)
    assert cosmo.efunc(0.5) > e_matter
    assert np.isclose(cosmo.comoving_distance(0.5), 1945.0, rtol=1e-3)
    assert np.isclose(cosmo.Ogamma0, 5.39e-5, rtol=2e-2)


def test_w0wa_dark_energy_scaling():
    cosmo = cosmo_mod.Flatw0waCDM(H0=70, Om0=0.3, w0=-0.9, wa=0.2)
    z = np.array([0.0, 1.0])
    want = (1 + z) ** (3 * (1 - 0.9 + 0.2)) * np.exp(-3 * 0.2 * z / (1 + z))
    np.testing.assert_allclose(cosmo.de_density_scale(z), want, rtol=1e-12)
