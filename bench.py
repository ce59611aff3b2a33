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
MXU precision (full float32).  TWO rates are reported: the headline
(wp elementwise + xi_ell scaled, the natural contract per statistic) and
the all-elementwise-contract rate (every output element of every
statistic <1e-6 relative).

Accuracy is probed at N_PROBE=16 random parameter points (max over the
probe set), two ways per statistic:

* ``*_err_vs_f64`` — kernel error against the float64 host path
  evaluated at the float32 parameter values the kernel actually
  receives: the kernel's own arithmetic contract (quadrature node
  residual correction, compensated f32 transcendentals, exact segment
  sums, 6-pass MXU contraction).
* ``*_err_incl_param_quantization`` — against the float64 host path at
  the unrounded float64 parameters; the difference is the irreducible
  float32 *input representation* error (~1e-6 level for logM-type
  parameters), common to every float32 pipeline.

wp errors are per-element relative (the north-star anchor); xi_ell
errors are scale-normalized (relative to the statistic's largest
element — its smallest entries are ~1e-7 of the largest, where
per-element relative error measures table conditioning, not kernel
precision).

Prints one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is measured rate / 1e3 (the reference's ~1 ms predict).
"""

import json
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Backend-init watchdog: a broken accelerator tunnel makes the first
# jax.devices() block forever inside the PJRT client constructor.  Probe
# it in a SUBPROCESS with a deadline (an in-process probe thread would
# block holding jax's backend-init lock, poisoning even a CPU fallback);
# if the tunnel is unreachable after two attempts, pin this process to
# the CPU backend and measure the XLA path there — a slower but honest
# number, clearly labeled, instead of a zero.
TUNNEL_DEAD = True
for _attempt in range(2):
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()"],
            timeout=150.0, check=True, capture_output=True)
        TUNNEL_DEAD = False
        break
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        pass
if TUNNEL_DEAD:
    # Provisional record on STDERR: if the caller's time budget expires
    # during the CPU fallback below, the run still leaves a parseable
    # trace of why — while stdout carries exactly ONE JSON line (the
    # final measurement), so a caller reading either the first or the
    # only stdout line never sees a zero.
    print(json.dumps({
        "metric": "zheng07_wp_xi_ell_predictions_per_sec", "value": 0.0,
        "unit": "predictions/s", "vs_baseline": 0.0,
        "error": "accelerator tunnel unreachable after 2x150s; "
                 "CPU fallback measurement follows"}),
        file=sys.stderr, flush=True)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/tabcorr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tabcorr_tpu as tt
from tabcorr_tpu.ops.predict import mean_occupation, predict_from_occupation
from tabcorr_tpu.predictor import occupation_functions, params_batch

BASELINE_PREDICTIONS_PER_SEC = 1.0e3  # reference predict ~1 ms / eval
BATCH = 262144
CHUNK = 4096
N_ITER = 10
N_WINDOWS = 5
N_PROBE = 16  # accuracy probe points (batch elements 0..N_PROBE-1)
if TUNNEL_DEAD:
    # CPU fallback sizes: the XLA path on host is ~100x slower per
    # prediction; keep the wall clock bounded while the rate estimate
    # stays stable to a few percent.
    BATCH, N_ITER, N_WINDOWS = 16384, 2, 3


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


def make_bundle_predict_all(wp_table, xi_table, occ_c, occ_s, param_names,
                            accuracy=("elementwise", "scaled")):
    """Primary path: one Pallas kernel for the whole bundle.

    Default contracts: wp carries the per-element <1e-6 relative
    contract (the north-star anchor); xi_ell uses the scaled contract
    matching its reported metric, which lets low-amplitude rows contract
    at fewer MXU passes.  Both realized errors are measured against
    float64 and reported below; the all-elementwise variant is timed
    separately.
    """
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    f = make_fused_bundle_predictor([wp_table, xi_table], occ_c, occ_s,
                                    param_names, accuracy=accuracy)

    @jax.jit
    def predict_all(params):
        (ngal, wp), (_, xi_ell) = f(params)
        return ngal, wp, xi_ell

    return predict_all


def _timed_rate(fn, params, n_windows=N_WINDOWS):
    """Median rate over several timing windows.

    The TPU sits behind a network tunnel with ~5-10% run-to-run jitter;
    a single window is not representative.  Median (not best-of) keeps
    the number honest.
    """
    rates = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(N_ITER):
            out = fn(params)
        jax.block_until_ready(out)
        rates.append(BATCH * N_ITER / (time.perf_counter() - t0))
    return float(np.median(rates))


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
    # Batch element 0 holds the model defaults; elements 0..N_PROBE-1
    # double as the float32-vs-float64 accuracy probe set (no extra
    # kernel compile).
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

    rate = _timed_rate(predict_all, params)

    # All-elementwise-contract variant (every element of every statistic
    # <1e-6 relative): timed separately so the headline can't be read as
    # over-claiming the xi_ell contract.
    elementwise_rate = None
    if kernel_path == "pallas_bundle":
        predict_elem = make_bundle_predict_all(
            wp_table, xi_table, occ_c, occ_s,
            tuple(model.param_dict.keys()),
            accuracy=("elementwise", "elementwise"))
        out_e = predict_elem(params)
        jax.block_until_ready(out_e)
        elementwise_rate = _timed_rate(predict_elem, params)

    # Full MCMC inner loop (BASELINE config #5, "MCMC chain steps/sec"):
    # stretch-move ensemble with the batched Gaussian wp+xi_ell posterior
    # through the same predictor; one walker-step = one full posterior
    # evaluation + move, so this prices the end-to-end chain, not just
    # predict.
    ensemble_rate = None
    if kernel_path == "pallas_bundle":
        from tabcorr_tpu.mcmc import (ensemble_step,
                                      make_gaussian_logpost_batched)
        from tabcorr_tpu.predictor import make_multi_predictor
        # Headline-scale ensemble: each stretch-move step runs TWO
        # half-ensemble posterior launches, so walker-steps/s tracks the
        # predict rate at batch n_walkers/2 (a fixed ~1 ms per-launch
        # cost makes smaller batches proportionally slower — see
        # docs/performance.md's batch-size table); the bookkeeping
        # itself measures <2%.
        n_walkers = 262144
        names = tuple(model.param_dict.keys())
        f_bundle = make_multi_predictor(
            [wp_tab, xi_tab], model, engine="bundle",
            accuracy=("elementwise", "scaled"))
        data_wp = np.asarray(out[1][0], np.float64).ravel()
        data_xi = np.asarray(out[2][0], np.float64).ravel()
        log_prob = make_gaussian_logpost_batched(
            f_bundle, names, model.param_dict,
            [data_wp, data_xi],
            [np.diag(1.0 / (0.05 * np.abs(data_wp) + 1e-3) ** 2),
             np.diag(1.0 / (0.05 * np.abs(data_xi) + 1e-3) ** 2)])
        walkers = jnp.asarray(
            np.array([model.param_dict[k] for k in names])[None, :] +
            0.02 * rng.normal(size=(n_walkers, len(names))),
            dtype=jnp.float32)

        @jax.jit
        def step(key, w, lp):
            return ensemble_step(key, w, lp, log_prob, vectorized=True)

        lp = log_prob(walkers)
        w, lp, _ = step(jax.random.key(0), walkers, lp)
        jax.block_until_ready((w, lp))
        n_steps = 50
        t0 = time.perf_counter()
        for i in range(n_steps):
            w, lp, _ = step(jax.random.key(i + 1), w, lp)
        jax.block_until_ready((w, lp))
        ensemble_rate = n_walkers * n_steps / (time.perf_counter() - t0)

    # BASELINE config #4 — the published-database 64-node grid workload:
    # the node-streamed packed kernel with the in-kernel spline fold,
    # through the public Interpolator make_predictor entry point, at the
    # 'default' 4x4x4 grid geometry real users load
    # (reference: tabcorr/database.py:56-59).  Accuracy carries the same
    # 16-probe discipline as the flagship: max scaled error vs the
    # float64 host path at the float32 parameter values received.
    grid_rate = None
    grid_err = 0.0
    grid_error_msg = None
    if kernel_path == "pallas_bundle":
      # The grid extra must never cost the headline: a grid-kernel
      # compile failure (the toolchain moved) degrades to an error
      # string in the JSON, not a dead bench.
      try:
        sys.path.insert(0, str(Path(__file__).absolute().parent / "tests"))
        sys.path.insert(0, str(Path(__file__).absolute().parent / "scripts"))
        from bench_grid import build_interpolator
        from tabcorr_tpu.predictor import make_predictor
        interp64 = build_interpolator()
        gmodel = tt.Zheng07Model(threshold=-20, redshift=0.0)
        for k, v in dict(alpha_c=0.2, alpha_s=1.0, log_eta=0.0).items():
            gmodel.param_dict[k] = v
        grng = np.random.default_rng(11)
        gB = BATCH
        gparams = params_batch(
            gmodel,
            {"logM1": gmodel.param_dict["logM1"] +
             0.1 * grng.normal(size=gB),
             "alpha_c": grng.uniform(0.05, 0.35, gB),
             "log_eta": grng.uniform(-0.3, 0.3, gB)},
            (gB,), dtype=jnp.float32)
        f_grid = make_predictor(interp64, gmodel, engine="fused",
                                accuracy="scaled")
        g_out = f_grid(gparams)
        jax.block_until_ready(g_out)
        g_rates = []
        for _ in range(N_WINDOWS):
            t0 = time.perf_counter()
            for _ in range(2):
                g_out = f_grid(gparams)
            jax.block_until_ready(g_out)
            g_rates.append(gB * 2 / (time.perf_counter() - t0))
        grid_rate = float(np.median(g_rates))
        # Reference: the host-numpy float64 Interpolator.predict path
        # (device "float64" arrays would silently truncate to f32 with
        # x64 disabled), at the float32 parameter values the kernel
        # actually received — the flagship probe's "kernel error"
        # contract.
        for i in range(N_PROBE):
            for k, v in gparams.items():
                gmodel.param_dict[k] = float(np.float32(v[i]))
            _, xi_h = interp64.predict(gmodel, check_consistency=False)
            scale = float(np.max(np.abs(xi_h)))
            grid_err = max(grid_err, float(np.max(np.abs(
                np.asarray(g_out[1][i], np.float64).ravel() -
                xi_h.ravel()))) / scale)
      except Exception as exc:
        grid_rate = None
        grid_error_msg = f"{type(exc).__name__}: {exc}"[:200]

    # Accuracy vs the float64 host parity path, max over N_PROBE random
    # parameter points.  Two contracts per statistic (see module
    # docstring): kernel error at the float32 parameter values actually
    # received, and total error including float32 parameter-input
    # quantization.
    err = {"wp_kernel": 0.0, "wp_total": 0.0,
           "xi_kernel": 0.0, "xi_total": 0.0}
    for i in range(N_PROBE):
        got_wp = np.asarray(out[1][i], dtype=np.float64).ravel()
        got_xi = np.asarray(out[2][i], dtype=np.float64).ravel()
        for which, quantize in (("kernel", True), ("total", False)):
            m = tt.Zheng07Model(threshold=-18,
                                redshift=wp_tab.attrs["redshift"])
            for k in overrides:
                v = overrides[k][i]
                m.param_dict[k] = float(np.float32(v)) if quantize \
                    else float(v)
            want_wp = wp_tab.predict(m, check_consistency=False)[1].ravel()
            want_xi = xi_tab.predict(m, check_consistency=False)[1].ravel()
            err[f"wp_{which}"] = max(
                err[f"wp_{which}"],
                float(np.max(np.abs(got_wp / want_wp - 1))))
            err[f"xi_{which}"] = max(
                err[f"xi_{which}"],
                float(np.max(np.abs(got_xi - want_xi)) /
                      np.max(np.abs(want_xi))))

    print(json.dumps({
        "metric": "zheng07_wp_xi_ell_predictions_per_sec",
        "value": float(rate),
        "unit": "predictions/s",
        "vs_baseline": float(rate / BASELINE_PREDICTIONS_PER_SEC),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "kernel_path": kernel_path,
        **({"error": "accelerator tunnel unreachable after 2x150s; "
                     "measured on CPU fallback"} if TUNNEL_DEAD else {}),
        **({"fallback_reason": fallback_reason} if fallback_reason else {}),
        **({"elementwise_contract_rate": float(elementwise_rate)}
           if elementwise_rate else {}),
        **({"ensemble_walker_steps_per_sec": float(ensemble_rate)}
           if ensemble_rate else {}),
        **({"grid64_predictions_per_sec": grid_rate,
            "grid64_f32_scaled_err_vs_f64": grid_err}
           if grid_rate else {}),
        **({"grid64_error": grid_error_msg} if grid_error_msg else {}),
        "n_accuracy_probes": N_PROBE,
        "wp_f32_max_rel_err_vs_f64": err["wp_kernel"],
        "xi_ell_f32_scaled_err_vs_f64": err["xi_kernel"],
        "wp_f32_max_rel_err_incl_param_quantization": err["wp_total"],
        "xi_ell_f32_scaled_err_incl_param_quantization": err["xi_total"],
    }))


if __name__ == "__main__":
    main()
