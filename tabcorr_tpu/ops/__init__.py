"""Pure-JAX compute kernels.

Import submodules explicitly (``from tabcorr_tpu.ops import predict``
imports the *module*); only non-shadowing names are re-exported here.
"""

from . import predict
from .predict import (TableData, mean_occupation, predict_from_occupation,
                      predict_from_occupation_separate, quadrature_grid)

__all__ = ["predict", "TableData", "mean_occupation",
           "predict_from_occupation", "predict_from_occupation_separate",
           "quadrature_grid"]
