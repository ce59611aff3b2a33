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


# Pallas/Mosaic has no erf lowering; inside a Pallas kernel trace the
# polynomial implementation below is substituted (see pallas_lowering()).
_PALLAS_LOWERING = False

# Degree-12 least-squares fit of erfcx(z) = erfc(z) exp(z^2) in
# t = 2 / (2 + z) over z in [0, 6]; max relative error 8e-10 (float64
# fit; in float32 the exp(-z^2) argument rounding dominates at
# ~z^2 * 2^-24 relative — the same tail behavior as XLA's own f32 erf).
_ERFCX_COEF = (
    -1.2776009901e-02, 9.8378898822e-02, -2.9996512049e-01,
    4.1463671448e-01, -1.1503488132e-01, -3.5961157476e-01,
    3.5721686113e-01, -1.3651431025e-01, 2.6072371143e-01,
    2.2567408409e-01, 2.8547811849e-01, 2.8178059160e-01,
    1.2917484458e-05)


def _erfcx_poly(t, xp):
    acc = xp.zeros_like(t)
    for c in _ERFCX_COEF:
        acc = acc * t + c
    return acc


def erf_poly(x):
    """erf via the erfcx polynomial (Pallas-lowerable: exp + arithmetic).

    Relatively accurate complementary tail: erfc(z) = erfcx(z) exp(-z^2)
    with erfcx fitted to 1.2e-9 relative, so occupations of deep-tail
    (Ncen -> 0) halo bins keep ~z^2 * 2^-24 relative accuracy instead of
    the ~1e-4 tail error of low-order absolute-error approximations.
    """
    xp = get_namespace(x)
    z = xp.abs(x)
    t = 2.0 / (2.0 + z)
    erfc_z = _erfcx_poly(t, xp) * xp.exp(-z * z)
    return xp.sign(x) * (1.0 - erfc_z)


def erfc_poly(x):
    """erfc with a relatively-accurate positive tail (see erf_poly)."""
    xp = get_namespace(x)
    z = xp.abs(x)
    t = 2.0 / (2.0 + z)
    erfc_abs = _erfcx_poly(t, xp) * xp.exp(-z * z)
    return xp.where(x >= 0, erfc_abs, 2.0 - erfc_abs)


class pallas_lowering:
    """Context manager: route backend.erf through the polynomial form.

    Activate around tracing occupation callables into a Pallas kernel
    (Mosaic has no erf primitive); models that import
    ``tabcorr_tpu.utils.backend.erf`` pick it up automatically because the
    dispatch happens inside the shared function object.
    """

    def __enter__(self):
        global _PALLAS_LOWERING
        self._prev = _PALLAS_LOWERING
        _PALLAS_LOWERING = True
        return self

    def __exit__(self, *exc):
        global _PALLAS_LOWERING
        _PALLAS_LOWERING = self._prev
        return False


def erf(x):
    """Error function on the matching backend."""
    if is_numpy(x):
        from scipy.special import erf as np_erf
        return np_erf(x)
    if _PALLAS_LOWERING:
        return erf_poly(x)
    from jax.scipy.special import erf as jax_erf
    return jax_erf(x)


def erfc(x):
    """Complementary error function on the matching backend.

    Occupation models should prefer ``0.5 * erfc(-x)`` over
    ``0.5 * (1 + erf(x))``: the latter loses the entire x -> -inf tail to
    float32 cancellation against 1 (absolute ulp-of-1 error), while erfc
    keeps it relatively accurate — deep-tail halo bins carry huge halo
    densities, so their tiny occupations still need relative accuracy.
    """
    if is_numpy(x):
        from scipy.special import erfc as np_erfc
        return np_erfc(x)
    if _PALLAS_LOWERING:
        return erfc_poly(x)
    from jax.scipy.special import erfc as jax_erfc
    return jax_erfc(x)
