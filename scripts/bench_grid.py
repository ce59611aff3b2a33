"""Benchmark the node-streamed Interpolator grid engine on-chip.

Builds a synthetic Interpolator grid with the published 'default'
database geometry — 4 x 4 x 4 = 64 phase-space nodes (alpha_c, alpha_s,
log_eta; reference: tabcorr/database.py:56-59), 30 primary-property bins
x 2 galaxy types = 60 halo bins, and xi_0/2/4 x 14 separation bins = 42
statistic rows per node — whose stacked constants (~88 MB float32 slabs)
exceed the VMEM-resident bundle, and measures the streamed flagship
kernel (packed symmetric layout) against the XLA float32 fallback
through the SAME public ``make_predictor`` entry point.

Usage: python scripts/bench_grid.py [--batch 16384] [--json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))
sys.path.insert(0, str(Path(__file__).absolute().parent.parent / "tests"))


def build_interpolator(n_nodes=64, n_prim=30, n_xi=42, seed=42):
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
    side = round(n_nodes ** (1 / 3))
    ac, as_, le = np.meshgrid(np.linspace(0, .4, side),
                              np.linspace(.8, 1.2, side),
                              np.linspace(-.4, .4, side), indexing="ij")
    pt["alpha_c"] = ac.ravel()
    pt["alpha_s"] = as_.ravel()
    pt["log_eta"] = le.ravel()
    return tt.Interpolator(tabs, pt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tabcorr_tpu as tt
    import tabcorr_tpu.predictor as pred_mod
    from tabcorr_tpu.predictor import make_predictor, params_batch

    interp = build_interpolator()
    assert not pred_mod._fused_constants_fit_vmem(interp, 10), \
        "grid unexpectedly fits the resident bundle"
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    for k, v in dict(alpha_c=0.2, alpha_s=1.0, log_eta=0.0).items():
        model.param_dict[k] = v

    B = args.batch
    params = params_batch(
        model,
        {"logM1": model.param_dict["logM1"] +
         0.1 * np.random.default_rng(7).normal(size=B),
         "alpha_c": np.random.default_rng(8).uniform(0.05, 0.35, B),
         "log_eta": np.random.default_rng(9).uniform(-0.3, 0.3, B)},
        (B,), dtype=jnp.float32)

    def rate(f):
        jax.block_until_ready(f(params))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(params)
        jax.block_until_ready(out)
        return B * args.reps / (time.perf_counter() - t0)

    f_stream = make_predictor(interp, model, engine="fused",
                              accuracy="scaled")
    f_xla = make_predictor(interp, model, engine="xla", dtype=jnp.float32)

    ng_s, xi_s = f_stream(params)
    ng_x, xi_x = f_xla(params)
    f_host = make_predictor(interp, model, engine="xla",
                            dtype=jnp.float64, vectorized=False)
    err_s = err_x = 0.0
    for i in (0, B // 2):
        p1 = {k: jnp.asarray(np.float64(np.float32(v[i])))
              for k, v in params.items()}
        _, xi_h = f_host(p1)
        scale = float(np.max(np.abs(np.asarray(xi_h))))
        err_s = max(err_s, float(np.max(np.abs(
            np.asarray(xi_s[i], np.float64) - np.asarray(xi_h)))) / scale)
        err_x = max(err_x, float(np.max(np.abs(
            np.asarray(xi_x[i], np.float64) - np.asarray(xi_h)))) / scale)

    r_stream = rate(f_stream)
    r_xla = rate(f_xla)
    out = {
        "metric": "interpolator_64node_grid_predictions_per_sec",
        "streamed_bundle": r_stream,
        "xla_f32": r_xla,
        "speedup": r_stream / r_xla,
        "scaled_err_streamed": err_s,
        "scaled_err_xla": err_x,
        "batch": B,
        "device": str(jax.devices()[0]),
    }
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
