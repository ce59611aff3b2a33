"""Smoke test for the driver's benchmark entry point (tiny batch, CPU)."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))


def test_bench_main_smoke(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(bench, "BATCH", 2048)
    monkeypatch.setattr(bench, "CHUNK", 512)
    monkeypatch.setattr(bench, "N_ITER", 1)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "zheng07_wp_xi_ell_predictions_per_sec"
    assert out["value"] > 0
    assert out["kernel_path"] in ("pallas_bundle", "xla")
    # Accuracy gates: wp relative (well-conditioned), xi scale-normalized.
    assert out["wp_f32_max_rel_err_vs_f64"] < 5e-6
    assert out["xi_ell_f32_scaled_err_vs_f64"] < 5e-6
