"""Galaxy-galaxy lensing example (counterpart of the reference's
docs/examples/example_ds.py).

Predicts the excess surface density delta sigma(rp) from a cross-mode
tabulation and plots the central/satellite decomposition.
"""

from pathlib import Path

import matplotlib.pyplot as plt
import numpy as np

import tabcorr_tpu as tt

FIXTURE = (Path(__file__).absolute().parent.parent / "tests" / "data" /
           "examples" / "bolplanck_ds.hdf5")

halotab = tt.TabCorr.read(FIXTURE)
rp_bins = halotab.tpcf_args[-1]
rp_ave = 0.5 * (rp_bins[1:] + rp_bins[:-1])

model = tt.Zheng07Model(threshold=-21,
                        redshift=halotab.attrs["redshift"],
                        prim_haloprop_key=halotab.attrs["prim_haloprop_key"])

ngal, ds = halotab.predict(model)
plt.plot(rp_ave, rp_ave * ds / 1e12, label="total")

ngal_sep, ds_sep = halotab.predict(model, separate_gal_type=True)
for key, value in ds_sep.items():
    plt.plot(rp_ave, rp_ave * value / 1e12, label=key, ls="--")

plt.xscale("log")
plt.xlabel(r"$r_{\rm p} \ [h^{-1} \ \mathrm{Mpc}]$")
plt.ylabel(
    r"$r_{\rm p} \times \Delta\Sigma \ [10^6 \, M_\odot / \mathrm{pc}]$")
plt.legend(loc="best", frameon=False)
plt.tight_layout(pad=0.3)
plt.savefig("ds_decomposition.png", dpi=300)
plt.close()
print("wrote ds_decomposition.png")
