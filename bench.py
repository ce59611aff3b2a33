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
* xi_ell: a synthetic-valued tabulation with the *production shape* of the
  published database tables ('default' config: 30 prim-haloprop bins x 2
  secondary percentiles x 2 galaxy types = 120 bins, auto mode, 14 s bins
  x 3 multipoles stacked into one 42-row contraction).  Throughput depends
  only on shapes; matrix values are irrelevant.

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
from tabcorr_tpu.ops.predict import TableData, quadrature_grid
from tabcorr_tpu.predictor import occupation_functions, params_batch
from tabcorr_tpu.ops.predict import mean_occupation, predict_from_occupation

BASELINE_PREDICTIONS_PER_SEC = 1.0e3  # reference predict ~1 ms / eval
BATCH = 262144
CHUNK = 4096
N_ITER = 10


def synthetic_xi_ell_table(dtype=jnp.float32, seed=0):
    """xi_0/2/4 tabulation with the published 'default' production shape."""
    rng = np.random.default_rng(seed)
    n_prim, n_sec = 30, 2
    n_half = n_prim * n_sec
    n_bins = 2 * n_half
    n_xi = 3 * 14  # three multipoles x 14 s bins

    log_min = np.tile(np.repeat(np.linspace(11.0, 15.0, n_prim), n_sec), 2)
    width = 4.0 / n_prim
    dense = rng.normal(size=(n_xi, n_bins, n_bins))
    dense = dense + np.transpose(dense, (0, 2, 1))  # symmetric like auto mode
    n_h = np.tile(10.0 ** -(3 + 2 * np.linspace(0, 1, n_half)), 2)
    log_quad, weight = quadrature_grid(
        log_min, log_min + width, np.zeros(n_bins), 10)
    sec = np.tile(np.tile([0.25, 0.75], n_prim), 2)
    return TableData(
        tpcf_dense=jnp.asarray(dense, dtype=dtype),
        n_h=jnp.asarray(n_h, dtype=dtype),
        log_prim_quad=jnp.asarray(log_quad, dtype=dtype),
        quad_weight=jnp.asarray(weight, dtype=dtype),
        sec_perc=jnp.asarray(sec, dtype=dtype),
        mode="auto", tpcf_shape=(3, 14), n_centrals=n_half)


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
        return jax.lax.map(jax.vmap(one), chunked)

    return predict_all


def make_fused_predict_all(wp_table, xi_table, occ_c, occ_s):
    """Primary path: Pallas VMEM-fused contractions."""
    from tabcorr_tpu.ops.fused import make_fused_predictor

    f_wp = make_fused_predictor(wp_table, occ_c, occ_s)
    f_xi = make_fused_predictor(xi_table, occ_c, occ_s)

    @jax.jit
    def predict_all(params):
        ngal, wp = f_wp(params)
        _, xi_ell = f_xi(params)
        return ngal, wp, xi_ell

    return predict_all


def main():
    wp_tab = tt.TabCorr.read("tests/data/examples/bolplanck_wp.hdf5")
    model = tt.Zheng07Model(threshold=-18,
                            redshift=wp_tab.attrs["redshift"])
    occ_c, occ_s = occupation_functions(model)

    wp_table = wp_tab.table_data(n_gauss=10, dtype=jnp.float32)
    xi_table = synthetic_xi_ell_table(dtype=jnp.float32)

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

    # Primary: Pallas-fused path; fall back to pure XLA if the Pallas
    # kernels cannot compile on this backend.
    kernel_path = "pallas_fused"
    try:
        predict_all = make_fused_predict_all(wp_table, xi_table,
                                             occ_c, occ_s)
        out = predict_all(params)
        jax.block_until_ready(out)
    except Exception:
        kernel_path = "xla"
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

    # Accuracy vs the float64 host parity path for the wp statistic,
    # using batch element 0 (= the model's default parameters).
    want = wp_tab.predict(model, check_consistency=False)
    got_wp = np.asarray(out[1][0], dtype=np.float64).ravel()
    rel_err = float(np.max(np.abs(got_wp / want[1] - 1)))

    print(json.dumps({
        "metric": "zheng07_wp_xi_ell_predictions_per_sec",
        "value": float(rate),
        "unit": "predictions/s",
        "vs_baseline": float(rate / BASELINE_PREDICTIONS_PER_SEC),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "kernel_path": kernel_path,
        "wp_f32_max_rel_err_vs_f64": rel_err,
    }))


if __name__ == "__main__":
    main()
