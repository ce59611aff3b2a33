"""Generate the benchmark's xi_0/2/4 tabulation fixture.

Runs the repo's own tabulation machinery (the same code path as
``tabulate_snapshot.py --tpcf xi``) on a physical synthetic halo catalog
with the published 'default' production shape — 30 prim-haloprop bins x 2
secondary percentiles x 2 galaxy types = 120 bins, auto mode, 14 s bins,
multipoles 0/2/4 stacked into one (3, 14)-shaped TabCorr — and writes it
to ``tests/data/examples/synthetic_xi_ell.hdf5`` for ``bench.py``.

The matrix VALUES come from real pair counts of a real mock population
(not synthetic noise), so the benchmark runs on an artifact of the
pipeline itself.  Deterministic given the seed.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).absolute().parent.parent
sys.path.insert(0, str(REPO))

import tabcorr_tpu as tt  # noqa: E402
from tabcorr_tpu.ops.multipole import tabcorr_s_mu_to_multipole  # noqa: E402


def synthetic_halocat(n_halos=40000, lbox=400.0, seed=20):
    rng = np.random.default_rng(seed)
    # Power-law-ish mass function over 11.5 - 14.5 (weight toward low M).
    u = rng.uniform(0, 1, n_halos)
    mass = 10.0 ** (11.5 + 3.0 * u**2)
    table = {
        "halo_x": rng.uniform(0, lbox, n_halos),
        "halo_y": rng.uniform(0, lbox, n_halos),
        "halo_z": rng.uniform(0, lbox, n_halos),
        "halo_vx": 300 * rng.normal(size=n_halos),
        "halo_vy": 300 * rng.normal(size=n_halos),
        "halo_vz": 300 * rng.normal(size=n_halos),
        "halo_mvir": mass,
        "halo_rvir": 0.3 * (mass / 1e13) ** (1.0 / 3.0),
        "halo_nfw_conc": np.clip(
            9 * (mass / 1e13) ** -0.1 *
            np.exp(0.3 * rng.normal(size=n_halos)), 2.0, 25.0),
        "halo_upid": np.full(n_halos, -1, dtype=np.int64),
    }
    cosmology = tt.cosmology.FlatFLRW(H0=70, Om0=0.3, Tcmb0=0, Neff=0)
    return tt.HaloCatalog(table, Lbox=lbox, particle_mass=5e8,
                          redshift=0.25, cosmology=cosmology,
                          simname="bench_synthetic")


def main():
    config = tt.database.configuration("default")
    halocat = synthetic_halocat()
    halotab_smu = tt.TabCorr.tabulate(
        halocat, tt.corrfunc.s_mu_tpcf, config["s_bins"],
        config["mu_bins"], mode="auto", prim_haloprop_bins=30,
        sec_haloprop_percentile_bins=0.5, Num_ptcl_requirement=300,
        sats_per_prim_haloprop=config["sats_per_prim_haloprop"],
        project_xyz=True, verbose=True, seed=99)

    # Stack xi_0/2/4 into one (3, 14) statistic like the published tables
    # combine per-multipole files (reference: scripts/tabulate_snapshot.py
    # :213-221 writes xi0/xi2/xi4; the bench bundles them).
    parts = [tabcorr_s_mu_to_multipole(halotab_smu, config["mu_bins"], o)
             for o in (0, 2, 4)]
    halotab = parts[0]
    halotab.tpcf_matrix = np.concatenate(
        [p.tpcf_matrix for p in parts], axis=0)
    halotab.tpcf_shape = (3, len(config["s_bins"]) - 1)
    halotab.attrs["tpcf"] = "xi_ell"

    out = REPO / "tests" / "data" / "examples" / "synthetic_xi_ell.hdf5"
    halotab.write(out, overwrite=True)
    print(f"Wrote {out} (n_bins={halotab.n_bins}, "
          f"shape={halotab.tpcf_shape})")


if __name__ == "__main__":
    main()
