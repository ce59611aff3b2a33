"""Drop-in, signature-compatible correlation-function statistics.

The reference ships Corrfunc-backed wrappers with halotools call signatures
(reference: tabcorr/corrfunc.py).  This module exposes the same three
functions with identical signatures and conventions, backed by the
device-accelerated labeled pair counters in
:mod:`tabcorr_tpu.ops.paircount` — no Corrfunc installation required.
"""

from .ops.paircount import mean_delta_sigma, s_mu_tpcf, tpcf, wp

__all__ = ["wp", "s_mu_tpcf", "tpcf", "mean_delta_sigma"]
