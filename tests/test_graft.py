"""Driver-contract tests: entry() compile check and multi-chip dry run."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    ngal, xi = jax.jit(fn)(*args)
    assert ngal.shape == (256,)
    assert xi.shape == (256, 19)
    assert bool(np.all(np.isfinite(np.asarray(xi))))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
