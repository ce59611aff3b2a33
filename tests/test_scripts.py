"""Pipeline script tests: snapshot readers and the tabulation CLI."""

import os
import struct
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).absolute().parent.parent / "scripts"))

import parse_snapshot  # noqa: E402
import tabulate_snapshot  # noqa: E402

import tabcorr_tpu as tt  # noqa: E402


def _write_fake_gadget(path, pos, vel, boxsize=100.0, redshift=0.5):
    n = len(pos)

    def block(data):
        return struct.pack("<I", len(data)) + data + \
            struct.pack("<I", len(data))

    header = struct.pack("<6I", 0, n, 0, 0, 0, 0)
    header += struct.pack("<6d", 0, 1e9, 0, 0, 0, 0)
    header += struct.pack("<dd", 1.0 / (1 + redshift), redshift)
    header += struct.pack("<ii", 0, 0)
    header += struct.pack("<6I", 0, n, 0, 0, 0, 0)
    header += struct.pack("<ii", 0, 1)
    header += struct.pack("<dddd", boxsize, 0.3, 0.7, 0.7)
    header = header.ljust(256, b"\0")

    with open(path, "wb") as stream:
        stream.write(block(header))
        stream.write(block(pos.astype("<f4").tobytes()))
        stream.write(block(vel.astype("<f4").tobytes()))


def test_gadget_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 100, (500, 3)).astype(np.float32)
    vel = rng.normal(size=(500, 3)).astype(np.float32)
    path = tmp_path / "snap.gadget"
    _write_fake_gadget(path, pos, vel)

    snap = parse_snapshot.read_gadget_snapshot(path)
    assert snap["header"]["boxsize"] == 100.0
    assert np.isclose(snap["header"]["redshift"], 0.5)
    np.testing.assert_allclose(snap["pos"], pos, rtol=1e-6)
    np.testing.assert_allclose(snap["vel"], vel, rtol=1e-6)

    sub = parse_snapshot.read_gadget_snapshot(path, subsample=0.5)
    assert 100 < len(sub["pos"]) < 400


def test_rockstar_reader(tmp_path):
    path = tmp_path / "out_0.8000.list"
    header = ("#ID DescID M200m Vmax Vrms Rvir Rs Np X Y Z VX VY VZ\n")
    rows = ["%d 0 %e %f 100 %f %f 500 %f %f %f %f %f %f\n" % (
        i, 1e13 * (1 + i), 200 + i, 250.0, 40.0, 10.0 + i, 20.0, 30.0,
        100.0, -50.0, 25.0) for i in range(5)]
    path.write_text(header + "".join(rows) + "")
    halos = parse_snapshot.read_rockstar_halos(path)
    assert len(halos["halo_x"]) == 5
    np.testing.assert_allclose(halos["halo_m200m"],
                               1e13 * np.arange(1, 6))
    np.testing.assert_allclose(halos["halo_rs"], 0.04)  # kpc -> Mpc
    np.testing.assert_allclose(halos["halo_r200m"], 0.25)


def test_snapshot_write_and_read(tmp_path, monkeypatch):
    monkeypatch.setenv("TABCORR_DATABASE", str(tmp_path))
    rng = np.random.default_rng(1)
    n = 300
    mdef = "200m"
    halos = {
        "halo_x": rng.uniform(0, 1050, n),
        "halo_y": rng.uniform(0, 1050, n),
        "halo_z": rng.uniform(0, 1050, n),
        "halo_vx": rng.normal(size=n), "halo_vy": rng.normal(size=n),
        "halo_vz": rng.normal(size=n),
        f"halo_m{mdef}": 10 ** rng.uniform(13, 14.5, n),
        f"halo_r{mdef}": rng.uniform(0.3, 1.5, n),
        "halo_rs": rng.uniform(0.05, 0.3, n),
        "halo_vmax": rng.uniform(200, 800, n),
    }
    out_path = (tt.database.directory("AemulusAlpha", 0.25, i_cosmo=0) /
                "snapshot.hdf5")
    parse_snapshot.write_snapshot(out_path, halos, {"BoxSize": 1050.0})
    assert out_path.exists()

    halocat = tabulate_snapshot.read_simulation_snapshot(
        "AemulusAlpha", 0.25, i_cosmo=0)
    assert len(halocat.halo_table) == n
    assert halocat.Lbox[0] == 1050
    np.testing.assert_allclose(
        halocat.halo_table["halo_nfw_conc"],
        halos[f"halo_r{mdef}"] / halos["halo_rs"])
    assert halocat.cosmology.sigma8 > 0
