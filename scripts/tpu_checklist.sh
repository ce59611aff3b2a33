#!/usr/bin/env bash
# TPU-return checklist: run after accelerator connectivity is restored.
# Each step is independently skippable; everything logs to stdout.
#
#   bash scripts/tpu_checklist.sh [quick]
#
# 'quick' skips the autotuner and the slow golden suite.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 0. connectivity probe =="
if ! timeout 180 python -c "import jax; d = jax.devices(); print(d)"; then
    echo "accelerator backend unreachable; aborting checklist" >&2
    exit 1
fi

if [ "${1:-}" != "quick" ]; then
    echo "== 1. bundle autotune (fuse_occupation x sub_tiles x tile) =="
    timeout 1800 python scripts/tune_bundle.py || true
    echo "   -> if fuse_occupation / sub_tiles > 1 wins by > 3%, flip the"
    echo "      defaults in tabcorr_tpu/ops/fused.py and re-run the tests."
fi

echo "== 1b. SHMR-family Mosaic lowering smoke (bisection seed) =="
# Interpret-mode tests cannot prove Mosaic lowers the in-kernel
# bisection-seeded SHMR inversion; one real-chip compile does.
timeout 900 python - << 'EOF'
import numpy as np, jax.numpy as jnp
import tabcorr_tpu as tt
from tabcorr_tpu.predictor import make_multi_predictor, params_batch
tab = tt.TabCorr.read("tests/data/examples/bolplanck_wp.hdf5")
for model in (tt.Leauthaud11Model(threshold=10.5,
                                  redshift=tab.attrs["redshift"]),
              tt.ZuMandelbaum15Model(threshold=10.5,
                                     prim_haloprop_key="halo_mvir")):
    f_b = make_multi_predictor([tab], model, engine="bundle")
    f_x = make_multi_predictor([tab], model, engine="xla")
    params = params_batch(model, {}, (8,), dtype=jnp.float32)
    [(ng_b, xi_b)] = f_b(params)
    [(ng_x, xi_x)] = f_x(params)
    np.testing.assert_allclose(np.asarray(ng_b), np.asarray(ng_x),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(xi_b), np.asarray(xi_x),
                               rtol=1e-4,
                               atol=2e-6 * float(np.max(np.abs(xi_x))))
    print(type(model).__name__, "bundle-on-chip OK")
EOF

echo "== 2. headline bench =="
timeout 1200 python bench.py

echo "== 2b. tabulation-sweep bench =="
timeout 1200 python scripts/bench_sweep.py --strategy matmul || true

echo "== 2c. per-family engine bench =="
timeout 1800 python scripts/bench_models.py || true

echo "== 2d. streamed-grid engine bench (64-node published shape) =="
# Also the on-chip numerics gate for the folded grid spline: interpret
# mode runs XLA CPU dots at full f32 and cannot catch TPU-default bf16
# matmul truncation (measured 1.7e-3 scaled error before the HIGHEST
# fix on the nw @ E dot) — check scaled_err_streamed < 1e-6 here.
timeout 1800 python scripts/bench_grid.py --json || true
timeout 1800 python scripts/bench_grid_resident.py || true

if [ "${1:-}" != "quick" ]; then
    echo "== 3. slow golden suite on the real chip =="
    TABCORR_TEST_ACCELERATOR=1 timeout 3600 \
        python -m pytest tests/ -q -m slow
fi

echo "== 4. fast suite (CPU, sharding semantics) =="
timeout 1200 python -m pytest tests/ -q -m "not slow" -x

echo "== checklist done; update docs/performance.md and"
echo "   docs/status_round3.md with the measured numbers =="
