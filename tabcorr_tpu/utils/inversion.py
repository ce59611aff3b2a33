"""Differentiable inversion of monotone scalar relations.

Used by the SHMR-based HOD models (models.leauthaud11) to evaluate the
stellar mass at a given halo mass when only the halo-mass-at-stellar-mass
direction is closed-form; exposed as a utility so user-supplied models
(e.g. through :class:`~.models.FunctionalHodModel`) can invert their own
relations the same way.
"""

from __future__ import annotations

from .backend import get_namespace


def monotone_inverse(fn, y, x_grid, dfn=None, newton_steps=3):
    """Solve fn(x) = y for a strictly monotone, differentiable ``fn``.

    Piecewise-linear interpolation of ``fn`` sampled on ``x_grid`` seeds
    a fixed number of Newton steps (an unrolled trip count, so the whole
    solve is forward- and reverse-differentiable — a ``while_loop``
    would not be).  Gradients with respect to parameters closed over by
    ``fn`` are exact to the Newton tolerance by the implicit function
    theorem: they flow through the final residual evaluations, not the
    interpolation seed.

    Parameters
    ----------
    fn : callable
        Strictly monotone increasing map ``x -> y`` (vectorized).
    y : array
        Query values.
    x_grid : array
        Static, sorted abscissae covering the solution range; queries
        whose root lies outside clamp to the nearest grid end before
        refinement.
    dfn : callable, optional
        Analytic derivative ``x -> dfn/dx``.  Default differentiates
        ``fn`` with jax (forward mode, per element).
    newton_steps : int, optional
        Number of unrolled Newton refinements.  Three converge a
        grid-resolution seed to float precision for smooth relations.

    Returns
    -------
    x : array
        The root, same shape as ``y``.
    """
    xp = get_namespace(y, x_grid)
    y_grid = fn(x_grid)
    x = xp.interp(y, y_grid, x_grid)
    if dfn is None:
        import jax

        def dfn(x_value):
            out, tangent = jax.jvp(fn, (x_value,),
                                   (xp.ones_like(x_value),))
            return tangent
    for _ in range(newton_steps):
        x = x - (fn(x) - y) / dfn(x)
    return x
