"""Snapshot ingestion CLI: raw N-body outputs -> database snapshot.hdf5.

Equivalent of the reference's scripts/parse_snapshot.py: converts raw
simulation products (Gadget-2 binaries, Rockstar halo lists, AbacusSummit
CompaSO catalogs, AemulusAlpha downloads) into the database's uniform
``snapshot.hdf5`` with tables ``halos`` and (optionally) ``particles``.

Self-contained readers: Gadget-2 format-1 binary blocks and Rockstar ASCII
halo lists.  Network ingestion (AemulusAlpha basic-auth download) and
AbacusSummit CompaSO reading require ``requests`` / ``abacusnbody``, which
are optional: a clear error tells the user what to install.

Usage:
    python scripts/parse_snapshot.py AemulusAlpha 0.25 --cosmo 0
"""

import argparse
import io
import os
import struct
from pathlib import Path

import h5py
import numpy as np

from tabcorr_tpu import database

GADGET_HEADER = struct.Struct("<6I6dddii6Iiiddddii6Ii")


def read_gadget_snapshot(path, read_pos=True, read_vel=True,
                         read_id=False, subsample=1.0, seed=42):
    """Read a Gadget-2 format-1 binary snapshot (single file).

    Returns a dict with 'header' plus requested blocks for all particle
    types concatenated. Block layout: header, positions (3f4 per
    particle), velocities (3f4), ids. Each block is wrapped in 4-byte
    Fortran record markers.
    """
    rng = np.random.default_rng(seed)
    out = {}
    with open(path, "rb") as stream:
        def read_block(expected=None):
            raw = stream.read(4)
            if len(raw) < 4:
                return None
            size = struct.unpack("<I", raw)[0]
            data = stream.read(size)
            end = struct.unpack("<I", stream.read(4))[0]
            if end != size:
                raise IOError("Corrupt Gadget block markers.")
            return data

        # Canonical Gadget-2 header layout: npart[6]u4, mass[6]f8, time f8,
        # redshift f8, flag_sfr/feedback i4 x2, npartTotal[6]u4,
        # flag_cooling/num_files i4 x2, BoxSize f8, Omega0 f8,
        # OmegaLambda f8, HubbleParam f8.
        header_raw = read_block()
        npart = struct.unpack("<6I", header_raw[0:24])
        mass = struct.unpack("<6d", header_raw[24:72])
        time, redshift = struct.unpack("<dd", header_raw[72:88])
        boxsize = struct.unpack("<d", header_raw[128:136])[0]
        omega0, omega_l, hubble = struct.unpack("<ddd",
                                                header_raw[136:160])
        n_total = int(np.sum(npart))
        out["header"] = dict(
            npart=npart, mass=mass, time=time, redshift=redshift,
            boxsize=boxsize, omega0=omega0, omega_lambda=omega_l,
            hubble_param=hubble)

        keep = (rng.random(n_total) < subsample if subsample < 1.0
                else slice(None))
        if read_pos:
            data = np.frombuffer(read_block(), dtype="<f4").reshape(-1, 3)
            out["pos"] = np.array(data[keep])
        if read_vel:
            data = np.frombuffer(read_block(), dtype="<f4").reshape(-1, 3)
            out["vel"] = np.array(data[keep])
        if read_id:
            data = np.frombuffer(read_block(), dtype="<u4")
            out["id"] = np.array(data[keep])
    return out


def read_rockstar_halos(path, mdef="200m"):
    """Read a Rockstar out_*.list ASCII halo catalog into column arrays."""
    with open(path) as stream:
        header = stream.readline().lstrip("#").split()
    columns = {name.split("(")[0].lower(): i
               for i, name in enumerate(header)}
    data = np.loadtxt(path)
    mass_col = columns.get(f"m{mdef}", columns.get("mvir"))
    out = {
        "halo_x": data[:, columns["x"]],
        "halo_y": data[:, columns["y"]],
        "halo_z": data[:, columns["z"]],
        "halo_vx": data[:, columns["vx"]],
        "halo_vy": data[:, columns["vy"]],
        "halo_vz": data[:, columns["vz"]],
        f"halo_m{mdef}": data[:, mass_col],
        "halo_rs": data[:, columns["rs"]] / 1e3,  # kpc/h -> Mpc/h
    }
    if "rvir" in columns:
        out[f"halo_r{mdef}"] = data[:, columns["rvir"]] / 1e3
    if "vmax" in columns:
        out["halo_vmax"] = data[:, columns["vmax"]]
    return out


def download_aemulus_alpha(suite_dir, name, redshift):
    """Download AemulusAlpha halo catalogs (basic-auth, env credentials).

    Mirrors the reference's ingestion (scripts/parse_snapshot.py:143-222);
    requires the AEMULUS_USERNAME / AEMULUS_PASSWORD environment variables
    and the ``requests`` package.
    """
    try:
        import requests
    except ImportError:
        raise RuntimeError("AemulusAlpha download requires 'requests'.")
    try:
        auth = (os.environ["AEMULUS_USERNAME"],
                os.environ["AEMULUS_PASSWORD"])
    except KeyError:
        raise RuntimeError("Set AEMULUS_USERNAME and AEMULUS_PASSWORD.")

    scale_factor = 1.0 / (1.0 + redshift)
    base = "https://www.slac.stanford.edu/~sean/aemulus"
    url = f"{base}/{name}/out_{scale_factor:.4f}.list"
    response = requests.get(url, auth=auth, timeout=600)
    response.raise_for_status()
    return io.StringIO(response.text)


def read_abacus_summit_halos(raw_dir, n_min=300):
    """Read an AbacusSummit CompaSO halo catalog (requires abacusnbody)."""
    try:
        from abacusnbody.data.compaso_halo_catalog import CompaSOHaloCatalog
    except ImportError:
        raise RuntimeError(
            "AbacusSummit ingestion requires the 'abacusutils' package.")
    cat = CompaSOHaloCatalog(
        raw_dir, fields=["N", "x_L2com", "v_L2com", "SO_radius",
                         "rvcirc_max_L2com"])
    halos = cat.halos[cat.halos["N"] >= n_min]
    meta = cat.header
    lbox = meta["BoxSize"]
    particle_mass = meta["ParticleMassHMsun"]
    mdef = "{:.0f}m".format(meta["SODensityL1"])
    pos = np.asarray(halos["x_L2com"]) % lbox
    out = {
        "halo_x": pos[:, 0], "halo_y": pos[:, 1], "halo_z": pos[:, 2],
        "halo_vx": np.asarray(halos["v_L2com"])[:, 0],
        "halo_vy": np.asarray(halos["v_L2com"])[:, 1],
        "halo_vz": np.asarray(halos["v_L2com"])[:, 2],
        f"halo_m{mdef}": np.asarray(halos["N"]) * particle_mass,
        f"halo_r{mdef}": np.asarray(halos["SO_radius"]),
        # NFW scale radius from the peak-circular-velocity radius:
        # r_s = r_vmax / 2.16258 (the NFW relation).
        "halo_rs": np.asarray(halos["rvcirc_max_L2com"]) / 2.16258,
    }
    return out, meta


def write_snapshot(path, halos, meta, particles=None):
    """Write the database's snapshot.hdf5 (tables 'halos'/'particles')."""
    from tabcorr_tpu.io import ColumnTable

    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as fstream:
        table = ColumnTable({k: np.asarray(v) for k, v in halos.items()})
        fstream["halos"] = table.as_structured_array()
        for key, value in meta.items():
            fstream["halos"].attrs[key] = value
        if particles is not None:
            ptcl = ColumnTable(
                {k: np.asarray(v) for k, v in particles.items()})
            fstream["particles"] = ptcl.as_structured_array()


def main():
    parser = argparse.ArgumentParser(
        description="Parse a raw simulation snapshot into the database.")
    parser.add_argument("suite", choices=["AemulusAlpha", "AbacusSummit"])
    parser.add_argument("redshift", type=float)
    parser.add_argument("--cosmo", type=int, default=0)
    parser.add_argument("--phase", type=int, default=0)
    parser.add_argument("--config", default=None,
                        help="simulation configuration")
    parser.add_argument("--raw_dir", default=None,
                        help="local directory with the raw simulation "
                             "products (skips any download)")
    parser.add_argument("--particles", action="store_true",
                        help="also ingest a particle subsample")
    parser.add_argument("--subsample", type=float, default=0.01,
                        help="particle subsample fraction")
    args = parser.parse_args()

    name = database.simulation_name(
        args.suite, i_cosmo=args.cosmo, i_phase=args.phase,
        config=args.config)
    out_path = database.directory(
        args.suite, args.redshift, i_cosmo=args.cosmo,
        i_phase=args.phase, config=args.config) / "snapshot.hdf5"

    if args.suite == "AemulusAlpha":
        if args.raw_dir is not None:
            source = Path(args.raw_dir) / \
                f"out_{1.0 / (1.0 + args.redshift):.4f}.list"
        else:
            source = download_aemulus_alpha(args.suite, name,
                                            args.redshift)
        halos = read_rockstar_halos(source)
        meta = {"BoxSize": 1050.0}
        particles = None
        if args.particles and args.raw_dir is not None:
            snap = read_gadget_snapshot(
                Path(args.raw_dir) / "snapshot.gadget",
                subsample=args.subsample)
            particles = {"x": snap["pos"][:, 0], "y": snap["pos"][:, 1],
                         "z": snap["pos"][:, 2]}
    else:
        if args.raw_dir is None:
            raise RuntimeError(
                "AbacusSummit ingestion reads local CompaSO products; "
                "pass --raw_dir.")
        halos, meta = read_abacus_summit_halos(args.raw_dir)
        particles = None

    write_snapshot(out_path, halos, meta, particles)
    print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
