"""User-defined occupation models from plain functions.

The reference accepts any halotools ``HodModelFactory`` whose
``mean_occupation_centrals/satellites`` it can call
(reference: tabcorr/tabcorr.py:556-563).  The equivalents here:

* :class:`FunctionalHodModel` builds a model from two pure functions —
  the natural entry point for custom occupation statistics, fully
  compatible with the jitted batched predictors.
* Any *object* exposing halotools-style ``mean_occupation_centrals`` /
  ``mean_occupation_satellites`` numpy methods (including an actual
  halotools model) already works with the float64 host path
  (``TabCorr.predict``/``mean_occupation``) unchanged.
"""

from __future__ import annotations

from .protocol import CENTRALS, HodModel


class FunctionalHodModel(HodModel):
    """HOD model defined by two pure occupation functions.

    Parameters
    ----------
    occupation_cen, occupation_sat : callables
        Pure functions ``(params, log_prim_haloprop,
        sec_haloprop_percentile) -> mean occupation``.  Must be
        jax-traceable for the device paths; called with numpy inputs by
        the host path.
    param_defaults : dict
        Parameter names and default values.
    **kwargs
        ``prim_haloprop_key``, ``sec_haloprop_key``, ``redshift`` and
        parameter overrides (see :class:`~.protocol.HodModel`).

    Examples
    --------
    >>> def step_cen(params, log_m, sec):
    ...     return (log_m > params["logMmin"]).astype(log_m.dtype)
    >>> def power_sat(params, log_m, sec):
    ...     return 10.0 ** (params["alpha"] * (log_m - params["logM1"]))
    >>> model = FunctionalHodModel(step_cen, power_sat,
    ...                            {"logMmin": 12.0, "logM1": 13.5,
    ...                             "alpha": 1.0})
    """

    def __init__(self, occupation_cen, occupation_sat, param_defaults,
                 **kwargs):
        self._occupation_cen = occupation_cen
        self._occupation_sat = occupation_sat
        self.param_defaults = dict(param_defaults)
        super().__init__(**kwargs)

    def occupation(self, params, gal_type, log_prim_haloprop,
                   sec_haloprop_percentile):
        if gal_type == CENTRALS:
            return self._occupation_cen(params, log_prim_haloprop,
                                        sec_haloprop_percentile)
        return self._occupation_sat(params, log_prim_haloprop,
                                    sec_haloprop_percentile)
