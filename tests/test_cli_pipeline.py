"""Full production-CLI integration test (slow): parse -> tabulate ->
Interpolator assembly -> database read -> prediction.

Runs the actual ``scripts/tabulate_snapshot.py`` main() on a synthetic
AemulusAlpha-layout snapshot written by the parse-side helpers, producing
a published-style ``wp_efficient.hdf5``, then loads it through
``database.read`` and predicts.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).absolute().parent.parent / "scripts"))

import tabcorr_tpu as tt  # noqa: E402


@pytest.mark.slow
def test_full_wp_pipeline(tmp_path, monkeypatch):
    import parse_snapshot
    import tabulate_snapshot

    monkeypatch.setenv("TABCORR_DATABASE", str(tmp_path))

    # Synthetic AemulusAlpha-style snapshot (Lbox = 1050 is implied by the
    # suite). Masses above the 99-particle cut (m_p ~ 3.2e10 for cosmo 0).
    rng = np.random.default_rng(0)
    n = 3000
    mdef = "200m"
    mass = 10.0 ** rng.uniform(12.8, 14.5, n)
    halos = {
        "halo_x": rng.uniform(0, 1050, n),
        "halo_y": rng.uniform(0, 1050, n),
        "halo_z": rng.uniform(0, 1050, n),
        "halo_vx": 300 * rng.normal(size=n),
        "halo_vy": 300 * rng.normal(size=n),
        "halo_vz": 300 * rng.normal(size=n),
        f"halo_m{mdef}": mass,
        f"halo_r{mdef}": 1.2 * (mass / 1e14) ** (1 / 3),
        "halo_rs": 0.15 * (mass / 1e14) ** (1 / 3),
        "halo_vmax": 400 * (mass / 1e14) ** 0.3 *
        np.exp(0.1 * rng.normal(size=n)),
    }
    out_path = (tt.database.directory("AemulusAlpha", 0.25, i_cosmo=0) /
                "snapshot.hdf5")
    parse_snapshot.write_snapshot(out_path, halos, {"BoxSize": 1050.0})

    monkeypatch.setattr(sys, "argv", [
        "tabulate_snapshot.py", "AemulusAlpha", "0.25", "--tpcf", "wp",
        "--tab_config", "efficient", "--seed", "1"])
    tabulate_snapshot.main()

    halotab = tt.database.read("AemulusAlpha", 0.25, "wp",
                               tab_config="efficient")
    # pi_max >= 80 prunes alpha_c; the grid spans (alpha_s, log_eta).
    assert sorted(halotab.keys) == ["alpha_s", "log_eta"]
    assert len(halotab.tabcorr_list) == 16

    model = tt.Zheng07Model(threshold=-20, redshift=0.25,
                            prim_haloprop_key=f"halo_m{mdef}",
                            logMmin=13.2, logM0=13.0, logM1=14.0)
    model.param_dict["alpha_s"] = 1.05
    model.param_dict["log_eta"] = 0.1
    ngal, wp = halotab.predict(model, check_consistency=False)
    assert np.all(np.isfinite(wp))
    assert ngal > 0

    # Resume flag: a second run with --resume skips everything quickly.
    monkeypatch.setattr(sys, "argv", [
        "tabulate_snapshot.py", "AemulusAlpha", "0.25", "--tpcf", "wp",
        "--tab_config", "efficient", "--seed", "1", "--resume"])
    tabulate_snapshot.main()
