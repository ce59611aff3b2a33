"""JAX-native HOD occupation models."""

from .assembias import AssembiasZheng07Model, heaviside_assembias
from .functional import FunctionalHodModel
from .protocol import CENTRALS, SATELLITES, HodModel
from .zheng07 import (ZHENG07_THRESHOLD_PARAMS, Zheng07Model,
                      zheng07_centrals, zheng07_satellites)

__all__ = ["HodModel", "Zheng07Model", "AssembiasZheng07Model",
           "FunctionalHodModel", "zheng07_centrals", "zheng07_satellites",
           "heaviside_assembias", "ZHENG07_THRESHOLD_PARAMS", "CENTRALS",
           "SATELLITES"]
