"""Production tabulation pipeline CLI.

Equivalent of the reference's scripts/tabulate_snapshot.py: reads a parsed
``snapshot.hdf5`` from the database directory, loops over the velocity-bias
phase-space grid (alpha_c x alpha_s x conc_gal_bias), tabulates the
requested statistic per grid node (xi -> multipoles 0/2/4, wp, ds, or
xi_r -> real-space xi(r), a superset of the reference's choices), and
assembles the per-node tabulations into the final Interpolator file.

Usage:
    python scripts/tabulate_snapshot.py AbacusSummit 0.5 --tpcf wp \
        --tab_config efficient
"""

import argparse
import csv

import h5py
import numpy as np

import tabcorr_tpu as tt
from tabcorr_tpu import database
from tabcorr_tpu.halocat import HaloCatalog, ParticleCatalog
from tabcorr_tpu.io import ColumnTable
from tabcorr_tpu.mock import CentralVelocityBiasPhaseSpace, NFWPhaseSpace
from tabcorr_tpu.ops.multipole import tabcorr_s_mu_to_multipole


def read_simulation_snapshot(suite, redshift, i_cosmo=0, i_phase=0,
                             config=None):
    """Build a HaloCatalog from the database's parsed snapshot.hdf5.

    Mirrors the reference's reader (scripts/tabulate_snapshot.py:17-67):
    suite-specific mass definitions, concentrations from r_delta / r_s, and
    the optional particle subsample for lensing.
    """
    name = database.simulation_name(suite, i_cosmo=i_cosmo,
                                    i_phase=i_phase, config=config)
    path = database.directory(suite, redshift, i_cosmo=i_cosmo,
                              i_phase=i_phase, config=config) / \
        "snapshot.hdf5"
    cosmology = database.cosmology(suite, i_cosmo=i_cosmo)

    with h5py.File(path, "r") as fstream:
        halos = ColumnTable.from_structured_array(fstream["halos"][()])
        meta = dict(fstream["halos"].attrs)
        ptcls = None
        if "particles" in fstream:
            ptcls = ColumnTable.from_structured_array(
                fstream["particles"][()])

    if suite == "AbacusSummit":
        mdef = "{:.0f}m".format(meta["SODensityL1"])
        lbox = meta["BoxSize"]
        particle_mass = meta["ParticleMassHMsun"]
        n_ptcls = meta["ppd"] ** 3
    else:
        mdef = "200m"
        lbox = 1050
        particle_mass = 3.51e10 * cosmology.Om0 / 0.3
        n_ptcls = 1400 ** 3

    mass_key = f"halo_m{mdef}"
    radius_key = f"halo_r{mdef}"
    table = {
        "halo_x": halos["halo_x"], "halo_y": halos["halo_y"],
        "halo_z": halos["halo_z"], "halo_vx": halos["halo_vx"],
        "halo_vy": halos["halo_vy"], "halo_vz": halos["halo_vz"],
        "halo_upid": np.full(len(halos), -1, dtype=np.int64),
        "halo_nfw_conc": np.asarray(halos[radius_key]) /
        np.asarray(halos["halo_rs"]),
        "halo_mvir": halos[mass_key],
        "halo_rvir": halos[radius_key],
        mass_key: halos[mass_key],
        radius_key: halos[radius_key],
    }
    if "halo_vmax" in halos:
        table["halo_vmax"] = halos["halo_vmax"]

    ptcl_catalog = None
    if ptcls is not None:
        ptcl_catalog = ParticleCatalog(
            ptcls["x"], ptcls["y"], ptcls["z"], Lbox=lbox,
            particle_mass=particle_mass, redshift=redshift,
            n_total=n_ptcls)

    return HaloCatalog(table, Lbox=lbox, particle_mass=particle_mass,
                       redshift=redshift, cosmology=cosmology,
                       simname=name, ptcl_catalog=ptcl_catalog,
                       n_ptcls=n_ptcls)


def main():
    parser = argparse.ArgumentParser(
        description="Tabulate halo correlation functions.")
    parser.add_argument("suite", choices=["AemulusAlpha", "AbacusSummit"],
                        help="simulation suite")
    parser.add_argument("redshift", type=float,
                        help="simulation redshift")
    parser.add_argument("--cosmo", type=int, default=0,
                        help="simulation cosmology, default is 0")
    parser.add_argument("--phase", type=int, default=0,
                        help="simulation phase, default is 0")
    parser.add_argument("--sim_config", default=None,
                        help="simulation configuration to assume")
    parser.add_argument("--tab_config", default="default",
                        help="tabulation configuration to assume")
    parser.add_argument("--tpcf", default="xi",
                        choices=["xi", "wp", "ds", "xi_r"],
                        help="TPCF to tabulate")
    parser.add_argument("--seed", type=int, default=None,
                        help="random seed for the mock population")
    parser.add_argument("--resume", action="store_true",
                        help="skip grid nodes whose output files already "
                             "exist (file-granularity checkpointing)")
    args = parser.parse_args()

    config = database.configuration(args.tab_config)
    halocat = read_simulation_snapshot(
        args.suite, args.redshift, i_cosmo=args.cosmo,
        i_phase=args.phase, config=args.sim_config)

    mdef = next(key[6:] for key in halocat.halo_table.colnames
                if key.startswith("halo_m") and key.endswith("m")
                and key != "halo_mvir")

    # Statistic-specific grid pruning (reference: :146-151).
    if args.tpcf == "wp" and config["pi_max"] >= 80:
        config["alpha_c_bins"] = [0.0]
    if args.tpcf in ("ds", "xi_r"):
        # ds: reference pruning (scripts/tabulate_snapshot.py:146-151).
        # xi_r: velocity-bias parameters (central velocity noise
        # alpha_c, satellite dispersion scaling alpha_s) only move
        # velocities and cannot affect a real-space statistic.
        config["alpha_c_bins"] = [0.0]
        config["alpha_s_bins"] = [1.0]

    path = database.directory(
        args.suite, args.redshift, i_cosmo=args.cosmo, i_phase=args.phase,
        config=args.sim_config) / args.tab_config
    path.mkdir(parents=True, exist_ok=True)

    grid = np.array(np.meshgrid(
        config["alpha_c_bins"], config["alpha_s_bins"],
        config["conc_gal_bias_bins"])).T.reshape(-1, 3)

    with open(path / f"{args.tpcf}_grid.csv", "w", newline="") as stream:
        writer = csv.writer(stream)
        writer.writerow(["alpha_c", "alpha_s", "conc_gal_bias"])
        writer.writerows(grid)

    for i, (alpha_c, alpha_s, conc_gal_bias) in enumerate(grid):
        if args.resume:
            expected = ([path / f"xi{o}_{i}.hdf5" for o in (0, 2, 4)]
                        if args.tpcf == "xi"
                        else [path / f"{args.tpcf}_{i}.hdf5"])
            if all(f.exists() for f in expected):
                print(f"Skipping grid node {i} (files exist).")
                continue
        cens_prof_model = CentralVelocityBiasPhaseSpace(
            redshift=halocat.redshift, alpha_c=alpha_c)
        sats_prof_model = NFWPhaseSpace(
            redshift=halocat.redshift, conc_gal_bias=conc_gal_bias,
            alpha_s=alpha_s)

        if args.tpcf == "ds":
            prim_haloprop_bins, mode = 300, "cross"
        else:
            prim_haloprop_bins, mode = 30, "auto"

        kwargs = dict(
            mode=mode, cens_prof_model=cens_prof_model,
            sats_prof_model=sats_prof_model, verbose=True,
            sats_per_prim_haloprop=config["sats_per_prim_haloprop"],
            # xi(r) is isotropic without RSD: axis projections are
            # redundant, and distorted coordinates would put velocity
            # anisotropy into a real-space statistic.
            redshift_space_distortions=args.tpcf != "xi_r",
            project_xyz=args.tpcf != "xi_r",
            prim_haloprop_bins=prim_haloprop_bins,
            prim_haloprop_key=f"halo_m{mdef}",
            sec_haloprop_key=("halo_nfw_conc"
                              if args.suite == "AbacusSummit"
                              else "halo_vmax"),
            sec_haloprop_percentile_bins=0.5,
            cosmology_obs=config["cosmo_obs"],
            Num_ptcl_requirement=(299 if args.suite == "AbacusSummit"
                                  else 99),
            downsample=config["downsample"],
            seed=args.seed if args.seed is None else args.seed + i)

        if args.tpcf == "xi":
            halotab_s_mu = tt.TabCorr.tabulate(
                halocat, tt.corrfunc.s_mu_tpcf, config["s_bins"],
                config["mu_bins"], **kwargs)
            for order in [0, 2, 4]:
                halotab_multipole = tabcorr_s_mu_to_multipole(
                    halotab_s_mu, config["mu_bins"], order)
                halotab_multipole.write(path / f"xi{order}_{i}.hdf5",
                                        overwrite=True)
        elif args.tpcf == "xi_r":
            halotab = tt.TabCorr.tabulate(
                halocat, tt.corrfunc.tpcf, config["s_bins"], **kwargs)
            halotab.write(path / f"xi_r_{i}.hdf5", overwrite=True)
        elif args.tpcf == "wp":
            halotab = tt.TabCorr.tabulate(
                halocat, tt.corrfunc.wp, config["rp_wp_bins"],
                config["pi_max"], **kwargs)
            halotab.write(path / f"wp_{i}.hdf5", overwrite=True)
        elif args.tpcf == "ds":
            ptcl = halocat.ptcl_catalog
            halotab = tt.TabCorr.tabulate(
                halocat, tt.corrfunc.mean_delta_sigma, ptcl.positions,
                ptcl.effective_particle_mass, config["rp_ds_bins"],
                **kwargs)
            halotab.write(path / f"ds_{i}.hdf5", overwrite=True)

    # Assemble the Interpolator (reference: :240-254); log_eta replaces
    # conc_gal_bias and constant grid axes are dropped.
    param_table = ColumnTable({
        "alpha_c": grid[:, 0], "alpha_s": grid[:, 1],
        "log_eta": np.log10(grid[:, 2])})
    for key in ["alpha_c", "alpha_s", "log_eta"]:
        if len(np.unique(param_table[key])) == 1:
            param_table.remove_column(key)

    statistics = [args.tpcf] if args.tpcf != "xi" else ["xi0", "xi2",
                                                        "xi4"]
    out_dir = database.directory(
        args.suite, args.redshift, i_cosmo=args.cosmo, i_phase=args.phase,
        config=args.sim_config)
    for tpcf in statistics:
        tabcorr_list = [tt.TabCorr.read(path / f"{tpcf}_{i}.hdf5")
                        for i in range(len(grid))]
        halotab = tt.Interpolator(tabcorr_list, param_table)
        halotab.write(out_dir / f"{tpcf}_{args.tab_config}.hdf5",
                      overwrite=True)


if __name__ == "__main__":
    main()
