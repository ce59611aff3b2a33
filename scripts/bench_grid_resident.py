"""A/B the two fused engines for VMEM-resident Interpolator grids on-chip.

Small grids (e.g. the published 4-node phase-space tables) fit the
VMEM-resident bundle, which returns per-node outputs and applies the
grid spline in XLA (~10% measured overhead).  The packed streamed-grid
kernel with ``fold_spline=True`` instead does ~2.3x fewer contraction
MACs (packed symmetric storage) and reduces the node axis in-kernel, so
it may win even where the resident bundle fits.  This script measures
both through the public ``make_predictor`` entry point on a synthetic
grid with the published 4-node geometry and prints one JSON line; the
result decides ``predictor._interpolator_fused_predict_fn``'s routing.

Usage: python scripts/bench_grid_resident.py [--batch 65536] [--nodes 4]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))
sys.path.insert(0, str(Path(__file__).absolute().parent.parent / "tests"))


def build_interpolator(n_nodes, n_prim=30, n_xi=42, seed=42):
    from test_bundle_shapes import synthetic_tabcorr

    import tabcorr_tpu as tt
    from tabcorr_tpu.io import ColumnTable

    tabs = []
    for j in range(n_nodes):
        t = synthetic_tabcorr(np.random.default_rng(seed), n_prim, 1,
                              n_xi, "auto")
        r2 = np.random.default_rng(1000 + j)
        t.tpcf_matrix = t.tpcf_matrix * (
            1.0 + 0.1 * r2.normal(size=t.tpcf_matrix.shape))
        t.tpcf_shape = (3, n_xi // 3)
        tabs.append(t)
    pt = ColumnTable()
    pt["log_eta"] = np.linspace(-0.4, 0.4, n_nodes)
    return tt.Interpolator(tabs, pt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tabcorr_tpu as tt
    import tabcorr_tpu.predictor as pred_mod
    from tabcorr_tpu.predictor import make_predictor, params_batch

    interp = build_interpolator(args.nodes)
    assert pred_mod._fused_constants_fit_vmem(interp, 10), \
        "grid unexpectedly exceeds the resident bundle budget"
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    model.param_dict["log_eta"] = 0.0

    B = args.batch
    params = params_batch(
        model,
        {"logM1": model.param_dict["logM1"] +
         0.1 * np.random.default_rng(7).normal(size=B),
         "log_eta": np.random.default_rng(9).uniform(-0.3, 0.3, B)},
        (B,), dtype=jnp.float32)

    def rate(f):
        jax.block_until_ready(f(params))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(params)
        jax.block_until_ready(out)
        return B * args.reps / (time.perf_counter() - t0)

    import unittest.mock as mock

    f_resident = make_predictor(interp, model, engine="fused",
                                accuracy="scaled")
    with mock.patch.object(pred_mod, "_fused_constants_fit_vmem",
                           lambda *a, **k: False):
        f_packed = make_predictor(interp, model, engine="fused",
                                  accuracy="scaled")

    ng_r, xi_r = f_resident(params)
    ng_p, xi_p = f_packed(params)
    scale = float(np.max(np.abs(np.asarray(xi_r))))
    agree = float(np.max(np.abs(np.asarray(xi_p) - np.asarray(xi_r)))
                  ) / scale

    out = {
        "metric": "interpolator_resident_grid_predictions_per_sec",
        "resident_bundle_xla_spline": rate(f_resident),
        "packed_fold_spline": rate(f_packed),
        "cross_engine_scaled_agreement": agree,
        "batch": B,
        "n_nodes": args.nodes,
        "device": str(jax.devices()[0]),
    }
    out["speedup_packed_over_resident"] = (
        out["packed_fold_spline"] / out["resident_bundle_xla_spline"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
