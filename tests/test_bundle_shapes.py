"""Shape-robustness property test for the fused bundle kernel.

Random halo binnings, statistic counts, modes and accuracy contracts —
synthetic TabCorr objects with multi-decade row amplitudes — compared to
the float64 host path in Pallas interpret mode (bf16 split groups are
emulated faithfully on CPU).  Guards the padding, segment-boundary and
row-permutation logic against shapes the fixed fixtures never hit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tabcorr_tpu as tt
from tabcorr_tpu.io import ColumnTable
from tabcorr_tpu.ops.fused import make_fused_bundle_predictor
from tabcorr_tpu.predictor import occupation_functions, params_batch
from tabcorr_tpu.utils.packing import symmetric_matrix_to_array


def synthetic_tabcorr(rng, n_prim, n_sec, n_xi, mode):
    """A structurally-valid TabCorr with random contents.

    Row amplitudes span ~6 decades so the 'scaled' contract's pass
    classes engage; matrix values are smooth-ish positive-dominant
    (realistic sign structure for a correlation matrix).
    """
    n_half = n_prim * n_sec
    n_bins = 2 * n_half
    log_m = np.linspace(11.0, 14.5, n_prim + 1)
    gal_type = ColumnTable()
    gal_type["n_h"] = np.tile(
        10.0 ** -np.linspace(0, 4, n_half), 2) * 1e-3
    gal_type["log_prim_haloprop_min"] = np.tile(
        np.repeat(log_m[:-1], n_sec), 2)
    gal_type["log_prim_haloprop_max"] = np.tile(
        np.repeat(log_m[1:], n_sec), 2)
    sec = (np.arange(n_sec) + 0.5) / n_sec
    gal_type["sec_haloprop_percentile_min"] = np.tile(
        np.tile(sec - 0.5 / n_sec, n_prim), 2)
    gal_type["sec_haloprop_percentile_max"] = np.tile(
        np.tile(sec + 0.5 / n_sec, n_prim), 2)
    gal_type["sec_haloprop_percentile"] = np.tile(np.tile(sec, n_prim), 2)
    gal_type["prim_haloprop"] = 10.0 ** (
        0.5 * (gal_type["log_prim_haloprop_min"] +
               gal_type["log_prim_haloprop_max"]))
    gal_type["prim_haloprop_dist_index"] = rng.uniform(-2, 2, n_bins)
    gal_type["gal_type"] = np.concatenate(
        [np.repeat(b"centrals", n_half), np.repeat(b"satellites", n_half)])

    row_amp = 10.0 ** rng.uniform(-5, 1, n_xi)
    if mode == "auto":
        base = rng.uniform(0.2, 1.0, (n_xi, n_bins, n_bins))
        base = 0.5 * (base + np.transpose(base, (0, 2, 1)))
        dense = base * row_amp[:, None, None]
        matrix = np.stack([symmetric_matrix_to_array(dense[k])
                           for k in range(n_xi)])
    else:
        matrix = rng.uniform(0.2, 1.0, (n_xi, n_bins)) * row_amp[:, None]

    halotab = tt.TabCorr()
    halotab.gal_type = gal_type
    halotab.attrs = {"mode": mode, "tpcf": "synthetic", "redshift": 0.0,
                     "simname": "prop", "Num_ptcl_requirement": 300,
                     "prim_haloprop_key": "halo_mvir",
                     "sec_haloprop_key": "halo_nfw_conc"}
    halotab.tpcf_args = ()
    halotab.tpcf_kwargs = {}
    halotab.tpcf_shape = (n_xi,)
    halotab.tpcf_matrix = matrix
    return halotab


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bundle_random_shapes_match_host(seed):
    rng = np.random.default_rng(seed)
    specs = [
        (int(rng.integers(3, 40)), int(rng.integers(1, 3)),
         int(rng.integers(1, 48)),
         rng.choice(["auto", "cross"]))
        for _ in range(2)]
    tabs = [synthetic_tabcorr(rng, *spec) for spec in specs]
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    tables = [t.table_data(n_gauss=10, dtype=jnp.float32) for t in tabs]
    accuracy = tuple(rng.choice(["elementwise", "scaled"])
                     for _ in specs)
    f = make_fused_bundle_predictor(
        tables, *occupation_functions(model),
        tuple(model.param_dict.keys()), batch_tile=8, interpret=True,
        accuracy=accuracy, fuse_occupation=bool(seed % 2))
    params = params_batch(model, {
        "logM1": model.param_dict["logM1"] +
        0.1 * np.random.default_rng(seed + 7).normal(size=8)},
        (8,), dtype=jnp.float32)
    out = f(params)
    for i in [0, 5]:
        m = tt.Zheng07Model(threshold=-20, redshift=0.0)
        m.param_dict["logM1"] = float(params["logM1"][i])
        for (ng, xi), tab, acc in zip(out, tabs, accuracy):
            ng_h, xi_h = tab.predict(m, check_consistency=False)
            scale = float(np.max(np.abs(xi_h)))
            assert np.isclose(float(ng[i]), ng_h, rtol=1e-5), (tab.attrs,
                                                               acc)
            err = np.max(np.abs(np.asarray(xi[i], np.float64).ravel() -
                                xi_h.ravel()))
            if acc == "scaled" and tab.attrs["mode"] == "auto":
                assert err < 1e-6 * scale, (tab.attrs, acc, err / scale)
            else:
                # elementwise: per-element relative
                rel = np.max(np.abs(
                    np.asarray(xi[i], np.float64).ravel() /
                    xi_h.ravel() - 1))
                assert rel < 2e-5, (tab.attrs, acc, rel)
