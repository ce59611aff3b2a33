"""ctypes bindings for the native (C++/OpenMP) cell-list pair counters.

The device kernels in :mod:`tabcorr_tpu.ops.paircount` are the primary
compute path; this module provides the same labeled-histogram interface
backed by ``tabcorr_tpu/native_src/paircount.cpp`` for hosts without an
accelerator (the role Corrfunc plays for the reference).  The source
ships as package data so pip installs get the backend too; the shared
library is compiled on first use with the system g++ and cached next to
the source when that directory is writable (a development checkout),
else under ``$XDG_CACHE_HOME/tabcorr_tpu`` (a read-only site-packages).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).absolute().parent / "native_src"
_SOURCE = _NATIVE_DIR / "paircount.cpp"
# Must match tabcorr_native_version() in native_src/paircount.cpp; bumped
# on every C ABI change.  The version is part of the artifact NAME: a
# stale .so called through a newer ctypes signature would misread its
# argument stack, and rebuilding under one filename cannot help
# in-process (glibc's dlopen caches by pathname and returns the old
# mapping).
NATIVE_ABI_VERSION = 3


def _artifact_dir() -> Path:
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache")) / "tabcorr_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    return cache


_LIB_PATH = (_artifact_dir() /
             f"libtabcorr_paircount_v{NATIVE_ABI_VERSION}.so")
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build_library():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
           "-march=native", str(_SOURCE), "-o", str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", str(exc))
        raise NativeUnavailable(
            f"Could not build the native pair counter: {detail}")


def load_library():
    """Load (building if necessary) the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists() or (_SOURCE.exists() and
                                  _SOURCE.stat().st_mtime >
                                  _LIB_PATH.stat().st_mtime):
        if not _SOURCE.exists():
            raise NativeUnavailable(f"{_SOURCE} not found.")
        _build_library()
    lib = ctypes.CDLL(str(_LIB_PATH))
    try:
        lib.tabcorr_native_version.restype = ctypes.c_int
        found = int(lib.tabcorr_native_version())
    except AttributeError:
        found = -1
    if found != NATIVE_ABI_VERSION:
        # The version lives in the filename, so a mismatch means the
        # source and NATIVE_ABI_VERSION are out of sync — a packaging
        # bug, not a stale artifact (re-dlopening one filename would
        # return glibc's cached stale mapping anyway).
        raise NativeUnavailable(
            f"{_LIB_PATH.name} reports ABI version {found}, expected "
            f"{NATIVE_ABI_VERSION}; native_src/paircount.cpp and "
            f"tabcorr_tpu/native.py are out of sync.")
    lib.tabcorr_count_pairs.restype = None
    lib.tabcorr_count_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_double),   # pos1
        ctypes.POINTER(ctypes.c_int32),    # labels1
        ctypes.c_int64,                    # n1
        ctypes.POINTER(ctypes.c_double),   # pos2
        ctypes.POINTER(ctypes.c_int32),    # labels2
        ctypes.POINTER(ctypes.c_double),   # weights2
        ctypes.c_int64,                    # n2
        ctypes.c_int,                      # autocorr
        ctypes.c_int,                      # n_labels_1
        ctypes.c_int,                      # n_labels_2
        ctypes.POINTER(ctypes.c_double),   # r_edges_sq
        ctypes.c_int,                      # n_r
        ctypes.c_double,                   # pi_max
        ctypes.c_int,                      # n_mu
        ctypes.POINTER(ctypes.c_double),   # period
        ctypes.c_int,                      # kind
        ctypes.c_int,                      # pair_weight (0 unit, 1 log_rp,
                                           #   2 unit+log_rp: doubled out buf)
        ctypes.POINTER(ctypes.c_double),   # out
    ]
    lib.tabcorr_native_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


_KINDS = {"rppi": 0, "proj": 1, "smu": 2}


def labeled_pair_count(pos1, labels1, n_labels_1, pos2=None, labels2=None,
                       n_labels_2=None, weights2=None, period=1.0,
                       kind="rppi", r_edges=None, pi_max=None,
                       mu_edges=None, pair_weight="unit"):
    """Native twin of :func:`tabcorr_tpu.ops.paircount.labeled_pair_count`."""
    lib = load_library()
    period = np.ascontiguousarray(
        np.broadcast_to(np.asarray(period, dtype=np.float64), (3,)))
    r_edges = np.ascontiguousarray(r_edges, dtype=np.float64)
    n_r = len(r_edges) - 1
    if kind == "smu":
        # The C++ kernel bins mu as floor(mu * n_mu): uniform [0, 1] bins
        # only (the device kernel searchsorts arbitrary edges instead).
        mu_edges = np.asarray(mu_edges, dtype=np.float64)
        if not np.allclose(mu_edges, np.linspace(0, 1, len(mu_edges))):
            raise ValueError("The native backend requires uniform mu bins "
                             "from 0 to 1.")
        n_mu = len(mu_edges) - 1
    else:
        n_mu = 1

    auto = pos2 is None
    pos1 = np.ascontiguousarray(pos1, dtype=np.float64)
    labels1 = np.ascontiguousarray(labels1, dtype=np.int32)
    if auto:
        pos2, labels2, n_labels_2 = pos1, labels1, n_labels_1
    else:
        pos2 = np.ascontiguousarray(pos2, dtype=np.float64)
        labels2 = (np.zeros(len(pos2), dtype=np.int32) if labels2 is None
                   else np.ascontiguousarray(labels2, dtype=np.int32))
        n_labels_2 = n_labels_2 or int(labels2.max()) + 1

    if weights2 is None:
        weights2 = np.ones(len(pos2), dtype=np.float64)
    else:
        weights2 = np.asarray(weights2, dtype=np.float64)
        if weights2.ndim == 0:
            weights2 = np.full(len(pos2), weights2)
        weights2 = np.ascontiguousarray(weights2)

    n_sub = n_r * n_mu
    n_channels = 2 if pair_weight == "unit+log_rp" else 1
    out = np.zeros(n_channels * n_labels_1 * n_labels_2 * n_sub,
                   dtype=np.float64)
    edges_sq = np.ascontiguousarray(r_edges**2)

    def ptr(array, ctype):
        return array.ctypes.data_as(ctypes.POINTER(ctype))

    lib.tabcorr_count_pairs(
        ptr(pos1, ctypes.c_double), ptr(labels1, ctypes.c_int32),
        len(pos1), ptr(pos2, ctypes.c_double),
        ptr(labels2, ctypes.c_int32), ptr(weights2, ctypes.c_double),
        len(pos2), int(auto), int(n_labels_1), int(n_labels_2),
        ptr(edges_sq, ctypes.c_double), n_r,
        float(pi_max if pi_max is not None else 0.0), n_mu,
        ptr(period, ctypes.c_double), _KINDS[kind],
        {"unit": 0, "log_rp": 1, "unit+log_rp": 2}[pair_weight],
        ptr(out, ctypes.c_double))

    shape = (n_labels_1, n_labels_2, n_r) if kind != "smu" else \
        (n_labels_1, n_labels_2, n_r, n_mu)
    if n_channels == 2:
        return out.reshape((2,) + shape)
    return out.reshape(shape)
