"""Dual-backend dispatch for occupation functions.

The pure model functions run under ``jit``/``vmap`` on device (jax.numpy)
*and* in the float64 host parity path (numpy).  On this class of host (few
cores), eager jax dispatch pays an XLA compile per unique op, so the host
path must stay in plain numpy.  ``get_namespace`` picks the array namespace
from the input; ``erf`` dispatches between scipy and jax.scipy.
"""

from __future__ import annotations

import numpy as np


def is_numpy(*arrays) -> bool:
    """True if all array arguments are host numpy (no tracers/device arrays)."""
    return all(isinstance(a, (np.ndarray, np.generic, float, int))
               for a in arrays)


def get_namespace(*arrays):
    """Return numpy for host inputs, jax.numpy otherwise."""
    if is_numpy(*arrays):
        return np
    import jax.numpy as jnp
    return jnp


def erf(x):
    """Error function on the matching backend."""
    if is_numpy(x):
        from scipy.special import erf as np_erf
        return np_erf(x)
    from jax.scipy.special import erf as jax_erf
    return jax_erf(x)
