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


def _isa_tag() -> str:
    """Host-ISA component of the artifact filename.

    The library is compiled with ``-march=native``; a cache directory
    shared across heterogeneous machines (NFS $HOME on a cluster) must
    not serve an AVX-512 binary to an older node — that is a SIGILL,
    not a catchable exception.
    """
    import hashlib
    import platform
    tag = platform.machine() or "unknown"
    try:
        with open("/proc/cpuinfo") as stream:
            for line in stream:
                if line.startswith("flags"):
                    tag += "-" + hashlib.sha1(
                        line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    return tag


class NativeUnavailable(RuntimeError):
    pass


def _artifact_path() -> Path:
    """Writable location for the compiled library (computed lazily:
    creating cache directories as an import side effect would turn a
    read-only $HOME into an ImportError instead of a clean fallback)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        base = _NATIVE_DIR
    else:
        base = Path(os.environ.get("XDG_CACHE_HOME",
                                   Path.home() / ".cache")) / "tabcorr_tpu"
        try:
            base.mkdir(parents=True, exist_ok=True)
        except OSError as exc:
            raise NativeUnavailable(
                f"No writable directory for the native library: {exc}")
    return base / (f"libtabcorr_paircount_v{NATIVE_ABI_VERSION}"
                   f"_{_isa_tag()}.so")


_LIB = None


def _build_library(lib_path):
    # Link into a private temp name, then atomically rename: concurrent
    # first-use builds (multiprocessing pipelines, pytest-xdist) must
    # never dlopen a half-written ELF.
    tmp = lib_path.with_name(lib_path.name + f".tmp{os.getpid()}")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
           "-march=native", str(_SOURCE), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, lib_path)
    except (subprocess.CalledProcessError, FileNotFoundError,
            OSError) as exc:
        tmp.unlink(missing_ok=True)
        detail = getattr(exc, "stderr", str(exc))
        raise NativeUnavailable(
            f"Could not build the native pair counter: {detail}")


def load_library():
    """Load (building if necessary) the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SOURCE.exists():
        raise NativeUnavailable(f"{_SOURCE} not found.")
    lib_path = _artifact_path()
    if (not lib_path.exists() or
            _SOURCE.stat().st_mtime > lib_path.stat().st_mtime):
        _build_library(lib_path)
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        # A truncated artifact (interrupted build, pre-atomic-rename
        # cache): rebuild once under a fresh name, then give up cleanly
        # so native_available() keeps its False contract.
        try:
            lib_path.unlink(missing_ok=True)
            _build_library(lib_path)
            lib = ctypes.CDLL(str(lib_path))
        except (OSError, NativeUnavailable) as exc:
            raise NativeUnavailable(
                f"Could not load the native pair counter: {exc}")
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
            f"{lib_path.name} reports ABI version {found}, expected "
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
    if kind == "rppi" and pi_max is None:
        # The C++ kernel would read pi_max = 0 and count nothing; fail
        # loudly like the device path does.
        raise ValueError("kind='rppi' requires pi_max.")
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
        # labels2=None stays a NULL pointer: the kernel synthesizes
        # label 0 per tracer, saving an O(n2) materialization.
        if labels2 is not None:
            labels2 = np.ascontiguousarray(labels2, dtype=np.int32)
        if n_labels_2 is None:
            n_labels_2 = (1 if labels2 is None
                          else int(labels2.max()) + 1)

    if weights2 is not None:
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
        None if labels2 is None else ptr(labels2, ctypes.c_int32),
        None if weights2 is None else ptr(weights2, ctypes.c_double),
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
