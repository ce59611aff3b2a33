"""Miniature end-to-end grid pipeline: tabulate a phase-space grid,
assemble an Interpolator, predict through the splines.

Exercises the same workflow as scripts/tabulate_snapshot.py (grid of
conc_gal_bias values -> per-node tabulations -> Interpolator assembly ->
interpolated prediction), shrunk to CI size.
"""

import numpy as np

import tabcorr_tpu as tt
from tabcorr_tpu.io import ColumnTable
from tabcorr_tpu.mock import NFWPhaseSpace

from test_tabulate import synthetic_halocat


def test_grid_tabulate_interpolate(tmp_path):
    halocat = synthetic_halocat(n_halos=600, seed=8)
    rp_bins = np.logspace(-0.3, 1.0, 5)
    conc_gal_bias_grid = np.geomspace(1 / 2, 2, 4)

    tabcorr_list = []
    for i, eta in enumerate(conc_gal_bias_grid):
        sats_prof_model = NFWPhaseSpace(redshift=halocat.redshift,
                                        conc_gal_bias=eta)
        tab = tt.TabCorr.tabulate(
            halocat, tt.corrfunc.wp, rp_bins, 10.0, mode="auto",
            prim_haloprop_bins=4, Num_ptcl_requirement=300,
            sats_per_prim_haloprop=1e-12,
            sats_prof_model=sats_prof_model, seed=100 + i)
        tab.write(tmp_path / f"wp_{i}.hdf5")
        tabcorr_list.append(tt.TabCorr.read(tmp_path / f"wp_{i}.hdf5"))

    param_table = ColumnTable({"log_eta": np.log10(conc_gal_bias_grid)})
    interp = tt.Interpolator(tabcorr_list, param_table)
    interp.write(tmp_path / "wp_grid.hdf5")
    interp = tt.Interpolator.read(tmp_path / "wp_grid.hdf5")

    model = tt.Zheng07Model(threshold=-20, redshift=0.0, logMmin=12.6,
                            logM0=12.0, logM1=13.6)
    model.param_dict["log_eta"] = 0.05
    ngal, wp = interp.predict(model, check_consistency=False)
    assert np.all(np.isfinite(wp))
    assert ngal > 0

    # Interpolation at a grid node reproduces that node's direct
    # prediction.
    model.param_dict["log_eta"] = float(np.log10(conc_gal_bias_grid[1]))
    ngal_i, wp_i = interp.predict(model, check_consistency=False)
    ngal_d, wp_d = tabcorr_list[1].predict(model, check_consistency=False)
    np.testing.assert_allclose(wp_i, wp_d, rtol=1e-8)
    assert np.isclose(ngal_i, ngal_d, rtol=1e-10)

    # Stronger satellite concentration -> more small-scale clustering:
    # the grid end members must differ on the smallest scale.
    wp_lo = tabcorr_list[0].predict(model, check_consistency=False)[1]
    wp_hi = tabcorr_list[-1].predict(model, check_consistency=False)[1]
    assert not np.isclose(wp_lo[0], wp_hi[0], rtol=0.02)
