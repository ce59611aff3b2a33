"""Tabulation engine tests on a synthetic halo catalog."""

import numpy as np
import pytest

import tabcorr_tpu as tt
from tabcorr_tpu.mock import G_KMS_MPC_MSUN
from tabcorr_tpu.ops import paircount
from tabcorr_tpu.tabulate import (bin_labels, compute_conditional_percentiles,
                                  distribution_index, sort_into_bins)


def synthetic_halocat(n_halos=800, lbox=150.0, seed=1, cosmology=None,
                      log_mass_range=(12.0, 13.5), position_fn=None):
    """Synthetic halo catalog.

    ``position_fn(rng, n_halos, lbox) -> (n_halos, 3)`` optionally
    replaces the default uniform (unclustered) positions — used by the
    golden tests' clustered catalog (tests/test_golden.py).
    """
    rng = np.random.default_rng(seed)
    mass = 10.0 ** rng.uniform(*log_mass_range, n_halos)
    # r_vir for Delta=200 rho_crit-ish, just a plausible scaling [Mpc/h].
    rvir = 0.3 * (mass / 1e13) ** (1.0 / 3.0)
    if position_fn is None:
        # Three 1-D draws, NOT one (n, 3) draw: the regression fixtures
        # lock this exact rng sequence.
        pos = np.stack([rng.uniform(0, lbox, n_halos) for _ in range(3)],
                       axis=1)
    else:
        pos = position_fn(rng, n_halos, lbox)
    table = {
        "halo_x": pos[:, 0],
        "halo_y": pos[:, 1],
        "halo_z": pos[:, 2],
        "halo_vx": 300 * rng.normal(size=n_halos),
        "halo_vy": 300 * rng.normal(size=n_halos),
        "halo_vz": 300 * rng.normal(size=n_halos),
        "halo_mvir": mass,
        "halo_rvir": rvir,
        "halo_nfw_conc": np.clip(
            8 * (mass / 1e13) ** -0.1 * np.exp(0.3 * rng.normal(size=n_halos)),
            2.0, 25.0),
        "halo_upid": np.full(n_halos, -1, dtype=np.int64),
    }
    if cosmology is None:
        cosmology = tt.cosmology.FlatFLRW(H0=70, Om0=0.3, Tcmb0=0, Neff=0)
    return tt.HaloCatalog(table, Lbox=lbox, particle_mass=1e9,
                          redshift=0.0, cosmology=cosmology,
                          simname="synthetic")


@pytest.fixture(scope="module")
def halocat():
    return synthetic_halocat()


@pytest.fixture(scope="module")
def wp_tabulated(halocat):
    rp_bins = np.logspace(-0.5, 1.2, 6)
    return tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 15.0, mode="auto",
        prim_haloprop_bins=6, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=42)


def test_tabulate_structure(wp_tabulated, halocat):
    tab = wp_tabulated
    assert tab.attrs["tpcf"] == "wp"
    assert tab.attrs["mode"] == "auto"
    assert tab.tpcf_shape == (5,)
    n_bins = tab.n_bins
    assert tab.tpcf_matrix.shape == (5, (n_bins**2 + n_bins) // 2)
    # n_h stores number densities (reference: tabcorr/tabcorr.py:353-354).
    total_density = np.sum(tab.gal_type["n_h"][
        tab.gal_type["gal_type"] == b"centrals"])
    n_hosts = len(halocat.host_halos("halo_mvir", 300))
    assert np.isclose(total_density, n_hosts / halocat.Lbox.prod(),
                      rtol=1e-10)
    # Schema columns match the reference file format.
    for col in ["n_h", "log_prim_haloprop_min", "log_prim_haloprop_max",
                "sec_haloprop_percentile_min",
                "sec_haloprop_percentile_max", "prim_haloprop",
                "sec_haloprop_percentile", "prim_haloprop_dist_index",
                "gal_type"]:
        assert col in tab.gal_type


def test_tabulate_roundtrip_and_predict(wp_tabulated, tmp_path):
    path = tmp_path / "synthetic_wp.hdf5"
    wp_tabulated.write(path)
    again = tt.TabCorr.read(path)

    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            sigma_logM=0.3, logM0=12.0, logM1=13.6,
                            alpha=1.0)
    ngal, xi = wp_tabulated.predict(model, check_consistency=False)
    ngal_2, xi_2 = again.predict(model, check_consistency=False)
    assert np.isfinite(ngal) and ngal > 0
    assert np.all(np.isfinite(xi))
    # float32 storage round trip.
    np.testing.assert_allclose(xi, xi_2, rtol=1e-5)


def test_generic_path_matches_fast_path(halocat):
    # The generic per-bin-pair fallback and the labeled-histogram fast path
    # must produce identical matrices for the same mock realization.
    rp_bins = np.logspace(-0.3, 1.0, 4)

    def custom_wp(*args, **kwargs):
        return paircount.wp(*args, **kwargs)

    kwargs = dict(mode="auto", prim_haloprop_bins=4,
                  Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12,
                  seed=7)
    tab_fast = tt.TabCorr.tabulate(halocat, tt.corrfunc.wp, rp_bins, 10.0,
                                   **kwargs)
    tab_generic = tt.TabCorr.tabulate(halocat, custom_wp, rp_bins,
                                      pi_max=10.0, **kwargs)
    np.testing.assert_allclose(tab_generic.tpcf_matrix,
                               tab_fast.tpcf_matrix, rtol=1e-10,
                               atol=1e-10)


def test_tabulate_delta_sigma(halocat):
    rng = np.random.default_rng(3)
    ptcl = tt.ParticleCatalog(
        rng.uniform(0, 150, 4000), rng.uniform(0, 150, 4000),
        rng.uniform(0, 150, 4000), Lbox=150.0, particle_mass=1e9,
        redshift=0.0, n_total=400000)
    rp_bins = np.logspace(-0.3, 1.0, 4)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.mean_delta_sigma, ptcl.positions,
        ptcl.effective_particle_mass, rp_bins, mode="cross",
        prim_haloprop_bins=4, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=11)
    assert tab.attrs["mode"] == "cross"
    assert tab.tpcf_matrix.shape == (3, tab.n_bins)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            logM1=13.6)
    ngal, ds = tab.predict(model, check_consistency=False)
    assert np.all(np.isfinite(ds))


def test_tabulate_s_mu_and_multipoles(halocat):
    from tabcorr_tpu.ops.multipole import tabcorr_s_mu_to_multipole
    s_bins = np.logspace(-0.3, 1.0, 4)
    mu_bins = np.linspace(0, 1, 6)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.s_mu_tpcf, s_bins, mu_bins, mode="auto",
        prim_haloprop_bins=4, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=13)
    assert tab.tpcf_shape == (3, 5)

    tab0 = tabcorr_s_mu_to_multipole(tab, mu_bins, 0)
    assert tab0.tpcf_shape == (3,)
    # Monopole: sum over mu of xi * dmu with P_0 = 1.
    want = tab.tpcf_matrix.reshape(3, 5, -1).mean(axis=1)
    np.testing.assert_allclose(tab0.tpcf_matrix, want, rtol=1e-10)

    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            logM1=13.6)
    ngal, xi0 = tab0.predict(model, check_consistency=False)
    assert xi0.shape == (3,)


def test_tpcf_wrapper_matches_bruteforce_oracle():
    # xi(r) wrapper vs a direct O(N^2) minimum-image shell count.
    rng = np.random.default_rng(5)
    lbox = 60.0
    pos1 = rng.uniform(0, lbox, (220, 3))
    pos2 = rng.uniform(0, lbox, (150, 3))
    r_bins = np.array([1.0, 3.0, 7.0, 14.0])

    def brute_counts(a, b, exclude_self):
        d = a[:, None, :] - b[None, :, :]
        d -= lbox * np.round(d / lbox)
        r = np.sqrt((d**2).sum(axis=-1))
        if exclude_self:
            np.fill_diagonal(r, -1.0)
        return np.histogram(r, bins=r_bins)[0].astype(float)

    for sample2, do_auto in [(None, True), (pos2, False)]:
        b = pos1 if sample2 is None else sample2
        dd = brute_counts(pos1, b, sample2 is None)
        n_exp = (len(pos1) * len(b) / lbox**3 * 4 * np.pi / 3 *
                 np.diff(r_bins**3))
        want = dd / n_exp - 1
        got = paircount.tpcf(pos1, r_bins, sample2=sample2, period=lbox,
                             do_auto=do_auto, do_cross=not do_auto)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    with pytest.raises(ValueError):
        paircount.tpcf(pos1, r_bins, period=lbox, do_auto=True,
                       do_cross=True)


def test_tabulate_tpcf_native_backend_matches_device(halocat):
    from tabcorr_tpu import native
    if not native.native_available():
        pytest.skip("native counter unavailable")
    r_bins = np.logspace(-0.3, 1.0, 4)
    kwargs = dict(mode="auto", prim_haloprop_bins=4,
                  Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12,
                  seed=7)
    tab_native = tt.TabCorr.tabulate(halocat, "tpcf", r_bins,
                                     backend="native", **kwargs)
    tab_device = tt.TabCorr.tabulate(halocat, tt.corrfunc.tpcf, r_bins,
                                     **kwargs)
    np.testing.assert_allclose(tab_native.tpcf_matrix,
                               tab_device.tpcf_matrix, rtol=1e-9,
                               atol=1e-9)


def test_tabulate_tpcf_fast_matches_generic(halocat):
    # The xi(r) labeled fast path against the generic per-bin-pair
    # fallback (same pattern as test_generic_path_matches_fast_path).
    r_bins = np.logspace(-0.3, 1.0, 4)

    def custom_tpcf(*args, **kwargs):
        return paircount.tpcf(*args, **kwargs)

    kwargs = dict(mode="auto", prim_haloprop_bins=4,
                  Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12,
                  seed=7)
    tab_fast = tt.TabCorr.tabulate(halocat, tt.corrfunc.tpcf, r_bins,
                                   **kwargs)
    tab_generic = tt.TabCorr.tabulate(halocat, custom_tpcf, r_bins,
                                      **kwargs)
    assert tab_fast.attrs["tpcf"] == "tpcf"
    assert tab_fast.tpcf_shape == (3,)
    np.testing.assert_allclose(tab_generic.tpcf_matrix,
                               tab_fast.tpcf_matrix, rtol=1e-10,
                               atol=1e-10)

    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            logM1=13.6)
    ngal, xi = tab_fast.predict(model, check_consistency=False)
    assert np.all(np.isfinite(xi))


def test_sec_percentile_split(halocat):
    rp_bins = np.logspace(-0.3, 1.0, 4)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
        prim_haloprop_bins=4, sec_haloprop_percentile_bins=0.5,
        Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12, seed=17)
    # Two percentile bins per mass bin per galaxy type.
    sec_min = np.unique(tab.gal_type["sec_haloprop_percentile_min"])
    assert len(sec_min) == 2


def test_ap_stretch_applied(halocat):
    cosmo_obs = tt.cosmology.FlatFLRW(H0=67, Om0=0.32, Tcmb0=0, Neff=0)
    rp_bins = np.logspace(-0.3, 1.0, 4)
    kwargs = dict(mode="auto", prim_haloprop_bins=4,
                  Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12,
                  seed=19)
    tab = tt.TabCorr.tabulate(halocat, tt.corrfunc.wp, rp_bins, 10.0,
                              cosmology_obs=cosmo_obs, **kwargs)
    tab_plain = tt.TabCorr.tabulate(halocat, tt.corrfunc.wp, rp_bins, 10.0,
                                    **kwargs)
    # Densities differ by the AP volume stretch.
    z = halocat.redshift
    rp_stretch = ((cosmo_obs.comoving_distance(z) * cosmo_obs.H0) /
                  (halocat.cosmology.comoving_distance(z) *
                   halocat.cosmology.H0)) if z > 0 else 1.0
    # At z=0 comoving distances are 0; stretch is 1 -> densities equal.
    np.testing.assert_allclose(
        np.sort(tab.gal_type["n_h"]), np.sort(tab_plain.gal_type["n_h"]),
        rtol=1e-10)


def test_bin_labels_and_sort_into_bins():
    log_prim = np.array([12.1, 12.9, 13.5, 11.0])
    bins = np.array([12.0, 12.5, 13.0, 14.0])
    sec = np.array([0.2, 0.8, 0.5, 0.5])
    sec_bins = np.array([-1e-3, 0.5, 1 + 1e-3])
    labels, n = bin_labels(log_prim, bins, sec, sec_bins)
    assert n == 6
    assert labels[3] == -1  # below the lowest mass bin
    assert labels[0] == 0   # first mass bin, first sec bin
    assert labels[1] == 3 + 1  # second mass bin, second sec bin
    values = np.arange(4)
    ragged = sort_into_bins(log_prim, bins, sec, sec_bins, values)
    assert len(ragged) == 6
    assert ragged[0].tolist() == [0]
    assert ragged[4].tolist() == [1]


def test_conditional_percentiles():
    rng = np.random.default_rng(0)
    prim = 10 ** rng.uniform(12, 13, 5000)
    sec = rng.normal(size=5000)
    perc = compute_conditional_percentiles(prim, sec)
    assert perc.min() > 0 and perc.max() <= 1
    # Percentiles are approximately uniform.
    hist, _ = np.histogram(perc, bins=10, range=(0, 1))
    assert hist.std() / hist.mean() < 0.1
    # Higher sec at fixed prim -> higher percentile, within one of the
    # function's own 0.05-dex conditioning bins.
    log_prim = np.log10(prim)
    lo = log_prim.min() + 0.05 * 4
    sel = (log_prim >= lo) & (log_prim < lo + 0.05)
    assert np.sum(sel) > 10
    order = np.argsort(sec[sel])
    assert np.all(np.diff(perc[sel][order]) > 0)


def test_distribution_index():
    # Uniform-in-x distribution on [1, 2] has mean 1.5 -> n = 0.
    assert abs(distribution_index(1.0, 2.0, 1.5)) < 1e-6
    # Mean at lower edge -> strongly negative; upper edge -> positive.
    assert distribution_index(1.0, 2.0, 1.05) < -5
    assert distribution_index(1.0, 2.0, 1.95) > 5


def test_tabulate_validation_errors(halocat):
    rp_bins = np.logspace(-0.3, 1.0, 4)
    # Empty-satellite bins raise the actionable error
    # (reference: tabcorr/tabcorr.py:300-304).
    with pytest.raises(RuntimeError, match="sats_per_prim_haloprop"):
        tt.TabCorr.tabulate(
            halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
            prim_haloprop_bins=4, Num_ptcl_requirement=300,
            sats_per_prim_haloprop=1e-16, seed=3)
    # Invalid bin specifications (reference: tabcorr/tabcorr.py:167-185).
    with pytest.raises(ValueError):
        tt.TabCorr.tabulate(halocat, tt.corrfunc.wp, rp_bins, 10.0,
                            prim_haloprop_bins="nope")
    with pytest.raises(ValueError):
        tt.TabCorr.tabulate(halocat, tt.corrfunc.wp, rp_bins, 10.0,
                            sec_haloprop_percentile_bins=1.5)


def test_tabulate_explicit_prim_bins(halocat):
    # Passing explicit log-mass bin edges works (the reference's
    # isinstance chain references an unassigned name on this path,
    # tabcorr/tabcorr.py:165; deliberately not replicated).
    rp_bins = np.logspace(-0.3, 1.0, 4)
    edges = np.linspace(12.0, 13.5, 5)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
        prim_haloprop_bins=edges, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=5)
    got_edges = np.unique(np.concatenate([
        tab.gal_type["log_prim_haloprop_min"],
        tab.gal_type["log_prim_haloprop_max"]]))
    assert np.all(np.isin(np.round(got_edges, 10), np.round(edges, 10)))


def test_compute_tpcf_matrix_ragged_api(halocat):
    # Reference-style module helper over ragged per-bin samples
    # (reference: tabcorr/tabcorr.py:846-922).
    from tabcorr_tpu import compute_tpcf_matrix, sort_into_bins

    rng = np.random.default_rng(1)
    pos = [rng.uniform(0, 150, (n, 3)) for n in (400, 300, 500)]
    rp_bins = np.logspace(-0.3, 1.0, 4)
    matrix, shape = compute_tpcf_matrix(
        "auto", pos, tt.corrfunc.wp, np.full(3, 150.0), (rp_bins,),
        {"pi_max": 10.0})
    assert matrix.shape == (3, 3, 3)
    assert shape == (3,)
    np.testing.assert_allclose(matrix, np.swapaxes(matrix, 1, 2),
                               rtol=1e-12)
    # Diagonal equals a direct auto wp of that bin's sample.
    direct = tt.corrfunc.wp(pos[0], rp_bins, 10.0, period=150.0)
    np.testing.assert_allclose(matrix[:, 0, 0], direct, rtol=1e-6)


def _numpy_pair_fraction(sample1, rp_bins, sample2=None, period=None,
                         do_auto=True, do_cross=False, **kwargs):
    """Pure-numpy halotools-signature statistic for pool tests (no JAX)."""
    import time
    time.sleep(float(kwargs.get("sleep", 0.0)))
    period = np.broadcast_to(np.asarray(period, dtype=np.float64), (3,))
    other = sample1 if sample2 is None else sample2
    d = sample1[:, None, :] - other[None, :, :]
    d -= period * np.round(d / period)
    rp = np.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)
    if sample2 is None:
        np.fill_diagonal(rp, np.inf)
    counts = np.histogram(rp.ravel(), bins=rp_bins)[0]
    return counts / (len(sample1) * len(other))


def test_generic_path_parallel_matches_sequential(halocat):
    # num_threads > 1 farms the generic-callable path over a worker pool
    # (reference: tabcorr/tabcorr.py:880-922); results must be identical
    # to the sequential loop.
    rp_bins = np.logspace(-0.3, 1.0, 4)
    kwargs = dict(mode="auto", prim_haloprop_bins=4,
                  Num_ptcl_requirement=300, sats_per_prim_haloprop=1e-12,
                  seed=11)
    tab_seq = tt.TabCorr.tabulate(
        halocat, _numpy_pair_fraction, rp_bins, num_threads=1, **kwargs)
    tab_par = tt.TabCorr.tabulate(
        halocat, _numpy_pair_fraction, rp_bins, num_threads=4, **kwargs)
    np.testing.assert_allclose(tab_par.tpcf_matrix, tab_seq.tpcf_matrix,
                               rtol=1e-12, atol=1e-15)


def test_generic_path_parallel_scales():
    # With a task-dominated callable, the pool must deliver real speedup.
    import time

    from tabcorr_tpu.tabulate import _generic_tpcf_matrix

    rng = np.random.default_rng(2)
    n_bins = 6  # 21 auto tasks
    pos = rng.uniform(0, 50, (n_bins * 20, 3))
    labels = np.repeat(np.arange(n_bins, dtype=np.int32), 20)
    rp_bins = np.logspace(-0.3, 1.0, 4)
    args = ("auto", pos, labels, n_bins, _numpy_pair_fraction,
            np.full(3, 50.0), (rp_bins,), {"sleep": 0.05}, False)

    t0 = time.perf_counter()
    m1, _ = _generic_tpcf_matrix(*args, num_threads=1)
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    m4, _ = _generic_tpcf_matrix(*args, num_threads=4)
    t_par = time.perf_counter() - t0

    np.testing.assert_allclose(m4, m1, rtol=1e-12, atol=1e-15)
    # 21 x 0.05s sequential floor ~1.05s; 4 workers should beat 60% of it
    # comfortably even with fork overhead.
    assert t_par < 0.6 * t_seq, (t_par, t_seq)


def test_downsample_keeps_two_tracers_per_bin(halocat):
    # Extreme downsampling: every non-empty bin must still retain >= 2
    # tracers so the auto pair estimator stays defined.
    rp_bins = np.logspace(-0.3, 1.0, 4)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
        prim_haloprop_bins=4, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, downsample=1e-6, seed=13)
    assert np.all(np.isfinite(tab.tpcf_matrix))


def test_period_kwarg_override_warns(halocat, capsys):
    # The reference warns and overrides a user-passed 'period'
    # (reference: tabcorr/tabcorr.py:134-138).
    rp_bins = np.logspace(-0.3, 1.0, 4)
    tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
        prim_haloprop_bins=4, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=5, period=123.0)
    assert "period" in capsys.readouterr().out


def test_odd_multipoles_vanish():
    # halotools' tpcf_multipole mirrors mu to [-1, 1], so odd orders are
    # identically zero; ours must match (see ops/multipole.py).
    from tabcorr_tpu.ops.multipole import tpcf_multipole

    rng = np.random.default_rng(8)
    mu_bins = np.linspace(0, 1, 21)
    xi = rng.normal(size=(5, 20))
    for order in (1, 3):
        np.testing.assert_array_equal(
            tpcf_multipole(xi, mu_bins, order), np.zeros(5))
    # Even orders: (2l+1) * sum xi P_l dmu.
    mu_c = 0.5 * (mu_bins[1:] + mu_bins[:-1])
    want = 5 * np.sum(xi * 0.5 * (3 * mu_c**2 - 1) * np.diff(mu_bins),
                      axis=-1)
    np.testing.assert_allclose(tpcf_multipole(xi, mu_bins, 2), want,
                               rtol=1e-12)
