"""Exact-semantics tests for the delta-sigma estimators.

The ``annulus_mean`` estimator is the exact area-weighted average of
delta-sigma(r) over each radial bin, computable in closed form from pair
counts (ops/paircount.py:delta_sigma_from_mass_profiles); these tests pin
it against hand-integrable particle configurations.
"""

import numpy as np
import pytest

from tabcorr_tpu.ops import paircount


LBOX = 200.0
RP_BINS = np.array([0.5, 1.0, 2.0, 4.0, 8.0])


def _ring(center, r0, n, rng):
    """n particles at exact projected radius r0, random angle/z offset."""
    phi = rng.uniform(0, 2 * np.pi, n)
    dz = rng.uniform(-5, 5, n)
    return center + np.column_stack(
        [r0 * np.cos(phi), r0 * np.sin(phi), dz])


def _analytic_annulus_mean(rp_bins, shell_r, shell_mass):
    """<ds> per annulus for point-mass shells around the one galaxy.

    For total mass M at projected radius r0, Sigma_bar(<r) = M/(pi r^2)
    for r > r0, so the area-weighted annulus mean over [r1, r2] is
    2 M [ln(r2/max(r1, r0)) - (1/2) 1{r1 <= r0 < r2}] / (pi (r2^2-r1^2)).
    """
    r1, r2 = rp_bins[:-1], rp_bins[1:]
    ds = np.zeros(len(r1))
    for r0, m in zip(shell_r, shell_mass):
        inside = r0 < r2
        lo = np.maximum(r1, r0)
        contrib = np.where(
            inside,
            np.log(np.maximum(r2 / lo, 1.0)) -
            0.5 * ((r1 <= r0) & (r0 < r2)),
            0.0)
        ds += 2 * m * contrib / (np.pi * (r2**2 - r1**2))
    return ds


def test_annulus_mean_matches_analytic_shells():
    rng = np.random.default_rng(0)
    center = np.full(3, LBOX / 2)
    shells = [(0.0, 200), (0.7, 300), (1.5, 400), (3.0, 500), (6.0, 600)]
    ptcls = np.vstack([_ring(center, r0, n, rng) for r0, n in shells])
    mass = 2.5e9

    ds = paircount.mean_delta_sigma(
        center[None, :], ptcls, mass, RP_BINS, period=LBOX,
        estimator="annulus_mean")
    want = _analytic_annulus_mean(
        RP_BINS, [s[0] for s in shells],
        [mass * s[1] for s in shells])
    # float32 pair geometry bounds the agreement (~1e-6 relative in rp).
    np.testing.assert_allclose(ds, want, rtol=3e-5)


def test_midpoint_matches_analytic_point_mass():
    rng = np.random.default_rng(1)
    center = np.full(3, LBOX / 2)
    n_in = 500
    ptcls = _ring(center, 0.1, n_in, rng)
    mass = 1e10

    ds = paircount.mean_delta_sigma(
        center[None, :], ptcls, mass, RP_BINS, period=LBOX,
        estimator="midpoint")
    # Sigma_bar(< sqrt(r1 r2)) = M / (pi r1 r2), Sigma(annulus) = 0.
    want = n_in * mass / (np.pi * RP_BINS[:-1] * RP_BINS[1:])
    np.testing.assert_allclose(ds, want, rtol=1e-5)

    ds_am = paircount.mean_delta_sigma(
        center[None, :], ptcls, mass, RP_BINS, period=LBOX,
        estimator="annulus_mean")
    want_am = (2 * n_in * mass * np.log(RP_BINS[1:] / RP_BINS[:-1]) /
               (np.pi * (RP_BINS[1:]**2 - RP_BINS[:-1]**2)))
    np.testing.assert_allclose(ds_am, want_am, rtol=1e-5)


def test_estimators_agree_on_smooth_profile():
    # For a smooth profile both estimators are O((dr/r)^2)-consistent
    # point estimates of the same physical quantity.
    rng = np.random.default_rng(2)
    gals = rng.uniform(0, LBOX, (20, 3))
    rows = np.repeat(np.arange(20), 3000)
    r = rng.power(0.5, len(rows)) * 10.0  # p(r) ~ r^-0.5, projected-ish
    phi = rng.uniform(0, 2 * np.pi, len(rows))
    ptcls = gals[rows] + np.column_stack(
        [r * np.cos(phi), r * np.sin(phi), rng.uniform(-8, 8, len(rows))])
    ptcls %= LBOX

    rp_bins = np.logspace(-0.3, 0.9, 9)
    kwargs = dict(period=LBOX)
    ds_am = paircount.mean_delta_sigma(gals, ptcls, 1e9, rp_bins,
                                       estimator="annulus_mean", **kwargs)
    ds_mid = paircount.mean_delta_sigma(gals, ptcls, 1e9, rp_bins,
                                        estimator="midpoint", **kwargs)
    np.testing.assert_allclose(ds_am, ds_mid, rtol=0.05)


def test_estimator_difference_is_below_table_validation_tolerance():
    # Deliberate-convention record (VERDICT r2 #3): quantify
    # annulus_mean vs midpoint ANALYTICALLY (no sampling noise) on the
    # published production binning (database 'default'/'efficient'
    # rp_ds_bins: logspace(-1, 1.8, 15), dln r = 0.46/bin) for power-law
    # surface-density profiles spanning the 1-halo regime.  The two
    # conventions are O((dln r)^2) apart — up to ~6% on this binning —
    # so the estimator used IS part of a table's definition; tabulate()
    # records it in the file attrs ('delta_sigma_estimator').  The
    # difference must shrink quadratically with bin width (the
    # convention ambiguity vanishes for fine binning).
    from tabcorr_tpu.ops.paircount import delta_sigma_from_mass_profiles

    def both(rp_bins, gamma):
        # M(<r) = r^gamma cylinder mass; SL = integral ln r dM.
        M = lambda r: r ** gamma                       # noqa: E731
        SL = lambda r: (r ** gamma * np.log(r) -       # noqa: E731
                        r ** gamma / gamma)
        annulus = M(rp_bins[1:]) - M(rp_bins[:-1])
        logmass = SL(rp_bins[1:]) - SL(rp_bins[:-1])
        ds_am = delta_sigma_from_mass_profiles(
            rp_bins, M(rp_bins[:-1]), annulus, logmass, 1.0)
        mids = np.sqrt(rp_bins[:-1] * rp_bins[1:])
        sigma_bar = M(mids) / (np.pi * mids**2)
        sigma = annulus / (np.pi * np.diff(rp_bins**2))
        return ds_am, sigma_bar - sigma

    coarse = np.logspace(-1.0, 1.8, 15)
    fine = np.logspace(-1.0, 1.8, 57)       # 4x finer
    for gamma in (0.6, 1.0, 1.5):
        am_c, mid_c = both(coarse, gamma)
        rel_c = np.max(np.abs(mid_c / am_c - 1))
        assert 1e-3 < rel_c < 0.08          # the measured ~5-6% scale
        am_f, mid_f = both(fine, gamma)
        rel_f = np.max(np.abs(mid_f / am_f - 1))
        assert rel_f < rel_c / 10           # O((dln r)^2) convergence


def test_tabulated_ds_records_estimator_attr():
    # The convention is part of the table definition: tabulate() must
    # stamp it into the file attrs for both estimators.
    import jax.numpy as jnp  # noqa: F401
    import tabcorr_tpu as tt
    from test_tabulate import synthetic_halocat

    halocat = synthetic_halocat(n_halos=300, seed=9)
    rng = np.random.default_rng(4)
    ptcl = rng.uniform(0, halocat.Lbox, (2000, 3))
    rp_bins = np.logspace(-0.5, 0.8, 4)
    for estimator in ("annulus_mean", "midpoint"):
        tab = tt.TabCorr.tabulate(
            halocat, tt.corrfunc.mean_delta_sigma, ptcl, 1e10, rp_bins,
            mode="cross", prim_haloprop_bins=3,
            sats_per_prim_haloprop=2e-13, Num_ptcl_requirement=300,
            seed=5, estimator=estimator)
        assert tab.attrs["delta_sigma_estimator"] == estimator


def test_unknown_estimator_raises():
    with pytest.raises(ValueError, match="estimator"):
        paircount.mean_delta_sigma(
            np.zeros((1, 3)), np.zeros((1, 3)), 1.0, RP_BINS,
            period=LBOX, estimator="nope")


def test_tabulated_ds_columns_match_direct_estimator():
    # Every column of the cross tpcf matrix must equal mean_delta_sigma
    # called directly on that bin's galaxy sample (same estimator).
    from tabcorr_tpu.tabulate import compute_tpcf_matrix

    rng = np.random.default_rng(3)
    pos = [rng.uniform(0, LBOX, (n, 3)) for n in (50, 80, 30)]
    ptcls = rng.uniform(0, LBOX, (5000, 3))
    matrix, shape = compute_tpcf_matrix(
        "cross", pos, "mean_delta_sigma", LBOX,
        (ptcls, 1e9, RP_BINS), {})
    assert shape == (len(RP_BINS) - 1,)
    for b in range(3):
        direct = paircount.mean_delta_sigma(pos[b], ptcls, 1e9, RP_BINS,
                                            period=LBOX)
        np.testing.assert_allclose(matrix[:, b], direct, rtol=1e-6,
                                   atol=1e-8)


def test_log_weighted_histogram_matches_numpy():
    # The 'log_rp' pair weight against a brute-force numpy reference.
    rng = np.random.default_rng(4)
    gals = rng.uniform(0, 60.0, (40, 3)).astype(np.float32)
    ptcls = rng.uniform(0, 60.0, (3000, 3)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, 3000).astype(np.float32)
    edges = np.array([0.0, 1.0, 3.0, 9.0])

    got = paircount.labeled_pair_count(
        gals, np.zeros(40, np.int32), 1, pos2=ptcls, weights2=w,
        period=60.0, kind="proj", r_edges=edges,
        pair_weight="log_rp")[0, 0]

    d = gals[:, None, :] - ptcls[None, :, :]
    d -= 60.0 * np.round(d / 60.0)
    rp = np.hypot(d[..., 0], d[..., 1])
    want = np.zeros(3)
    for k, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        sel = (rp >= lo) & (rp < hi) & (rp > 0)
        want[k] = np.sum((w[None, :] * np.log(rp, where=rp > 0,
                                              out=np.zeros_like(rp)))[sel])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dual_channel_sweep_matches_two_single_sweeps():
    # pair_weight='unit+log_rp' must reproduce the two single-channel
    # sweeps exactly (same pairs, same arithmetic), on the device kernel
    # and on the C++ backend.
    from tabcorr_tpu.ops import paircount as pc

    rng = np.random.default_rng(11)
    gal = rng.uniform(0, 60, (300, 3))
    ptcl = rng.uniform(0, 60, (800, 3))
    masses = rng.uniform(0.5, 2.0, 800)
    labels = rng.integers(0, 3, 300).astype(np.int32)
    edges = np.concatenate([[0.0], np.logspace(-0.5, 1.0, 6)])

    kw = dict(pos2=ptcl, weights2=masses, period=60.0, kind="proj",
              r_edges=edges)
    unit = pc.labeled_pair_count(gal, labels, 3, **kw)
    logr = pc.labeled_pair_count(gal, labels, 3, pair_weight="log_rp",
                                 **kw)
    both = pc.labeled_pair_count(gal, labels, 3,
                                 pair_weight="unit+log_rp", **kw)
    np.testing.assert_allclose(both[0], unit, rtol=1e-12)
    np.testing.assert_allclose(both[1], logr, rtol=1e-12)

    from tabcorr_tpu import native
    if native.native_available():
        n_unit = native.labeled_pair_count(gal, labels, 3, **kw)
        n_logr = native.labeled_pair_count(
            gal, labels, 3, pair_weight="log_rp", **kw)
        n_both = native.labeled_pair_count(
            gal, labels, 3, pair_weight="unit+log_rp", **kw)
        np.testing.assert_allclose(n_both[0], n_unit, rtol=1e-12)
        np.testing.assert_allclose(n_both[1], n_logr, rtol=1e-12)
        # cross-backend: float32 device geometry vs float64 C++
        np.testing.assert_allclose(n_both[1], logr, rtol=2e-5)
