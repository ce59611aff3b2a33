"""JAX-native HOD occupation models."""

from .assembias import (AssembiasLeauthaud11Model, AssembiasZheng07Model,
                        HeavisideAssembiasMixin, heaviside_assembias)
from .functional import FunctionalHodModel
from .leauthaud11 import (LEAUTHAUD11_PARAMS, Leauthaud11Model,
                          behroozi10_log_halo_mass, fshmr_log_mstar,
                          leauthaud11_centrals, leauthaud11_satellites)
from .protocol import CENTRALS, SATELLITES, HodModel
from .zheng07 import (ZHENG07_THRESHOLD_PARAMS, Zheng07Model,
                      zheng07_centrals, zheng07_satellites)

__all__ = ["HodModel", "Zheng07Model", "AssembiasZheng07Model",
           "Leauthaud11Model", "AssembiasLeauthaud11Model",
           "HeavisideAssembiasMixin", "FunctionalHodModel",
           "zheng07_centrals", "zheng07_satellites",
           "leauthaud11_centrals", "leauthaud11_satellites",
           "behroozi10_log_halo_mass", "fshmr_log_mstar",
           "heaviside_assembias", "ZHENG07_THRESHOLD_PARAMS",
           "LEAUTHAUD11_PARAMS", "CENTRALS", "SATELLITES"]
