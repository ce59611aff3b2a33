"""Benchmark: batched zheng07 wp + xi_ell predictions per second.

The reference's headline numbers (BASELINE.md): a direct halotools
computation takes ~60 s per model evaluation and TabCorr ``predict`` ~1 ms
(≈1e3 evaluations/sec, single CPU core).  The north star for this rebuild
is >=1e6 batched zheng07 wp+xi_ell predictions/sec on TPU at <1e-6 relative
error vs the float64 reference path.

One "prediction" = a full wp(rp) + xi_0/xi_2/xi_4 evaluation for one HOD
parameter vector:

* wp: the reference's own bolplanck example tabulation
  (19 rp bins, 60 halo bins, auto mode, checked-in fixture).
* xi_ell: a REAL tabulation produced by this repo's own pipeline
  machinery (scripts/make_bench_fixture.py) with the published 'default'
  production shape: 30 prim-haloprop bins x 2 secondary percentiles x 2
  galaxy types = 120 bins, auto mode, 14 s bins x 3 multipoles stacked
  into one (3, 14) statistic.  Real pair counts of a real mock, not
  synthetic values.

Primary engine: the one-kernel Pallas "bundle" (ops/fused.py) — in-kernel
occupation quadrature + all dense contractions per batch tile, HIGHEST
MXU precision (full float32).  Accuracy is reported two ways: max
relative error of wp (a well-conditioned statistic; the north-star
anchor) and the scale-normalized error of xi_ell (whose smallest entries
are ~1e-7 of its largest, where per-element relative error measures table
conditioning, not kernel precision).

Prints one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is measured rate / 1e3 (the reference's ~1 ms predict).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tabcorr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tabcorr_tpu as tt
from tabcorr_tpu.ops.predict import mean_occupation, predict_from_occupation
from tabcorr_tpu.predictor import occupation_functions, params_batch

BASELINE_PREDICTIONS_PER_SEC = 1.0e3  # reference predict ~1 ms / eval
BATCH = 262144
CHUNK = 4096
N_ITER = 10


def make_xla_predict_all(wp_table, xi_table, occ_c, occ_s):
    """XLA fallback path (batch-chunked to bound HBM intermediates)."""
    def one(params):
        mo_wp = mean_occupation(wp_table, occ_c, occ_s, params)
        ngal, wp = predict_from_occupation(wp_table, mo_wp)
        mo_xi = mean_occupation(xi_table, occ_c, occ_s, params)
        _, xi_ell = predict_from_occupation(xi_table, mo_xi)
        return ngal, wp, xi_ell

    @jax.jit
    def predict_all(params):
        chunked = jax.tree.map(
            lambda x: x.reshape(BATCH // CHUNK, CHUNK), params)
        out = jax.lax.map(jax.vmap(one), chunked)
        return jax.tree.map(lambda x: x.reshape(BATCH, *x.shape[2:]), out)

    return predict_all


def make_bundle_predict_all(wp_table, xi_table, occ_c, occ_s, param_names):
    """Primary path: one Pallas kernel for the whole bundle."""
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    # wp carries the per-element <1e-6 relative contract (the north-star
    # anchor); xi_ell uses the scaled contract matching its reported
    # metric (error relative to the largest element — its smallest
    # entries are ~1e-7 of the largest), which lets low-amplitude rows
    # contract at fewer MXU passes.  Both realized errors are measured
    # against float64 and reported below.
    f = make_fused_bundle_predictor([wp_table, xi_table], occ_c, occ_s,
                                    param_names, batch_tile=512,
                                    accuracy=("elementwise", "scaled"))

    @jax.jit
    def predict_all(params):
        (ngal, wp), (_, xi_ell) = f(params)
        return ngal, wp, xi_ell

    return predict_all


def main():
    from pathlib import Path
    fixtures = Path(__file__).absolute().parent / "tests" / "data" / "examples"
    wp_tab = tt.TabCorr.read(str(fixtures / "bolplanck_wp.hdf5"))
    xi_tab = tt.TabCorr.read(str(fixtures / "synthetic_xi_ell.hdf5"))
    model = tt.Zheng07Model(threshold=-18,
                            redshift=wp_tab.attrs["redshift"])
    occ_c, occ_s = occupation_functions(model)

    wp_table = wp_tab.table_data(n_gauss=10, dtype=jnp.float32)
    xi_table = xi_tab.table_data(n_gauss=10, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    overrides = {
        "logMmin": 11.35 + 0.1 * rng.normal(size=BATCH),
        "sigma_logM": 0.25 + 0.01 * rng.normal(size=BATCH),
        "logM0": 11.2 + 0.1 * rng.normal(size=BATCH),
        "logM1": 12.4 + 0.1 * rng.normal(size=BATCH),
        "alpha": 0.83 + 0.02 * rng.normal(size=BATCH),
    }
    # Batch element 0 holds the model defaults: its output doubles as the
    # float32-vs-float64 accuracy probe (no extra kernel compile).
    for key in overrides:
        overrides[key][0] = model.param_dict[key]
    params = params_batch(model, overrides, (BATCH,), dtype=jnp.float32)

    # Primary: one-kernel Pallas bundle on TPU; pure XLA elsewhere (the
    # bundle would only run in Pallas interpret mode off-TPU — correct
    # but pathologically slow at benchmark batch sizes) or if the Pallas
    # kernel cannot compile.
    kernel_path = "pallas_bundle" if jax.default_backend() == "tpu" \
        else "xla"
    fallback_reason = None
    if kernel_path == "pallas_bundle":
        try:
            predict_all = make_bundle_predict_all(
                wp_table, xi_table, occ_c, occ_s,
                tuple(model.param_dict.keys()))
            out = predict_all(params)
            jax.block_until_ready(out)
        except Exception as exc:   # surfaced in the JSON, never silent
            kernel_path = "xla"
            fallback_reason = f"{type(exc).__name__}: {exc}"[:200]
    if kernel_path == "xla":
        predict_all = make_xla_predict_all(wp_table, xi_table,
                                           occ_c, occ_s)
        out = predict_all(params)
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = predict_all(params)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    rate = BATCH * N_ITER / elapsed

    # Accuracy vs the float64 host parity path, batch element 0
    # (= the model's default parameters).
    want_wp = wp_tab.predict(model, check_consistency=False)
    want_xi = xi_tab.predict(model, check_consistency=False)
    got_wp = np.asarray(out[1][0], dtype=np.float64).ravel()
    got_xi = np.asarray(out[2][0], dtype=np.float64).ravel()
    rel_err_wp = float(np.max(np.abs(got_wp / want_wp[1].ravel() - 1)))
    err_xi = float(np.max(np.abs(got_xi - want_xi[1].ravel())) /
                   np.max(np.abs(want_xi[1])))

    print(json.dumps({
        "metric": "zheng07_wp_xi_ell_predictions_per_sec",
        "value": float(rate),
        "unit": "predictions/s",
        "vs_baseline": float(rate / BASELINE_PREDICTIONS_PER_SEC),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "kernel_path": kernel_path,
        **({"fallback_reason": fallback_reason} if fallback_reason else {}),
        "wp_f32_max_rel_err_vs_f64": rel_err_wp,
        "xi_ell_f32_scaled_err_vs_f64": err_xi,
    }))


if __name__ == "__main__":
    main()
