"""Round-over-round regression lock.

The fixture in tests/data/regression/ was produced by this package's own
tabulation pipeline (synthetic catalog, fixed seeds); these tests pin the
file format and the prediction values so behavioral drift across
development rounds is caught immediately.  Regenerate deliberately (see
the generation snippet in the git history) only when a semantic change is
intended.
"""

from pathlib import Path

import numpy as np

import tabcorr_tpu as tt

REGRESSION = Path(__file__).absolute().parent / "data" / "regression"


def test_regression_predict_locked():
    tab = tt.TabCorr.read(REGRESSION / "synthetic_wp.hdf5")
    expected = np.load(REGRESSION / "synthetic_wp_expected.npz")

    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            sigma_logM=0.3, logM0=12.0, logM1=13.6,
                            alpha=1.0)
    ngal, wp = tab.predict(model, check_consistency=False)
    # The matrix round-trips through float32 storage; predictions must
    # match the generation-time values far below that storage precision.
    assert np.isclose(ngal, float(expected["ngal"]), rtol=1e-10)
    np.testing.assert_allclose(wp, expected["wp"], rtol=1e-5)

    ngal_sep, wp_sep = tab.predict(model, separate_gal_type=True,
                                   check_consistency=False)
    assert np.isclose(ngal_sep["centrals"],
                      float(expected["ngal_centrals"]), rtol=1e-10)
    np.testing.assert_allclose(wp_sep["centrals-satellites"],
                               expected["wp_cen_sat"], rtol=1e-5)


def test_regression_tabulation_reproducible(monkeypatch):
    # Re-tabulating with the same seeds must reproduce the stored matrix
    # (float32 storage precision).  The fixture was produced by the
    # DEVICE sweep (f32 pair classification); pin that engine so this
    # lock tests pipeline drift, not CPU backend routing — the native
    # f64 counter legitimately classifies a handful of f32-edge pairs
    # differently (it has its own oracle-exact lock in test_native).
    import tabcorr_tpu.ops.paircount as pc
    orig = pc.labeled_pair_count
    monkeypatch.setattr(
        pc, "labeled_pair_count",
        lambda *a, **kw: orig(*a, **{**kw, "strategy": "scatter"}))
    from test_tabulate import synthetic_halocat

    halocat = synthetic_halocat(n_halos=800, seed=1)
    rp_bins = np.logspace(-0.5, 1.2, 6)
    tab = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.wp, rp_bins, 15.0, mode="auto",
        prim_haloprop_bins=6, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=1e-12, seed=42)
    stored = tt.TabCorr.read(REGRESSION / "synthetic_wp.hdf5")
    np.testing.assert_allclose(tab.tpcf_matrix, stored.tpcf_matrix,
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(tab.gal_type["n_h"] > 0,
                                  stored.gal_type["n_h"] > 0)
