"""Node-streamed Interpolator grid engine (ops.fused.make_fused_grid_predictor).

The published 'default' database grids (4x4x4 = 64 phase-space nodes,
reference: tabcorr/database.py:56-59) exceed the VMEM-resident bundle's
budget; the streamed kernel runs them through the flagship path one node
block at a time.  These tests check both layouts ('packed' symmetric
contraction and the 'slab' fallback) against the float64 host path in
interpret mode, the end-to-end Interpolator routing (including the
auto-switch when the resident bundle would not fit), and dp-mesh
sharding of the streamed kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tabcorr_tpu as tt
from tabcorr_tpu.io import ColumnTable
from tabcorr_tpu.ops.fused import make_fused_grid_predictor
from tabcorr_tpu.ops.predict import TableData
from tabcorr_tpu.predictor import (make_predictor, occupation_functions,
                                   params_batch)

from test_bundle_shapes import synthetic_tabcorr


def _grid_tabs(n_nodes, n_prim, n_sec, n_xi, mode, seed=42):
    """n_nodes synthetic TabCorr objects sharing ONE halo binning, with
    node-dependent matrices (what an Interpolator grid looks like)."""
    tabs = []
    for j in range(n_nodes):
        t = synthetic_tabcorr(np.random.default_rng(seed), n_prim, n_sec,
                              n_xi, mode)
        r2 = np.random.default_rng(1000 * seed + j)
        t.tpcf_matrix = t.tpcf_matrix * (
            1.0 + 0.1 * r2.normal(size=t.tpcf_matrix.shape))
        tabs.append(t)
    return tabs


def _stack(tabs, n_gauss=10):
    tables = [t.table_data(n_gauss=n_gauss, dtype=jnp.float32)
              for t in tabs]
    base = tables[0]
    n_nodes = len(tabs)
    n_xi = base.tpcf_dense.shape[0]
    return TableData(
        tpcf_dense=jnp.concatenate([t.tpcf_dense for t in tables], axis=0),
        n_h=base.n_h, log_prim_quad=base.log_prim_quad,
        quad_weight=base.quad_weight, sec_perc=base.sec_perc,
        mode=base.mode, tpcf_shape=(n_nodes * n_xi,),
        n_centrals=base.n_centrals,
        log_prim_quad_lo=base.log_prim_quad_lo)


@pytest.mark.parametrize("mode", ["auto", "cross"])
@pytest.mark.parametrize("accuracy", ["elementwise", "scaled"])
@pytest.mark.parametrize("layout", ["packed", "slab"])
def test_grid_stream_matches_host(mode, accuracy, layout):
    if layout == "slab" and mode == "cross" and accuracy == "scaled":
        pytest.skip("covered by the packed variant (same cross path)")
    n_nodes, n_xi = 5, 7
    tabs = _grid_tabs(n_nodes, 12, 2, n_xi, mode)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    f = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), batch_tile=8, interpret=True,
        accuracy=accuracy, layout=layout, sub_tiles=4)
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.1 * np.random.default_rng(7).normal(size=8)},
        (8,), dtype=jnp.float32)
    total, xi = f(params)
    assert xi.shape == (8, n_nodes, n_xi)
    for i in [0, 5]:
        m = tt.Zheng07Model(threshold=-20, redshift=0.0)
        m.param_dict["logM1"] = float(params["logM1"][i])
        for j in range(n_nodes):
            ng_h, xi_h = tabs[j].predict(m, check_consistency=False)
            assert np.isclose(float(total[i]), ng_h, rtol=1e-5)
            got = np.asarray(xi[i, j], np.float64).ravel()
            want = xi_h.ravel()
            if accuracy == "scaled":
                err = np.max(np.abs(got - want)) / np.max(np.abs(want))
                assert err < 1e-6, (mode, layout, j, err)
            else:
                rel = np.max(np.abs(got / want - 1))
                assert rel < 2e-5, (mode, layout, j, rel)


def test_grid_stream_node_blocks_and_uneven_batch():
    """node_block > 1 streams multi-node column blocks; a batch that is
    not a tile multiple pads internally."""
    n_nodes, n_xi = 6, 5
    tabs = _grid_tabs(n_nodes, 10, 1, n_xi, "auto", seed=3)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    outs = []
    for nb in (1, 2, 3, 6):
        f = make_fused_grid_predictor(
            stacked, n_nodes, *occupation_functions(model),
            tuple(model.param_dict.keys()), batch_tile=8, interpret=True,
            accuracy="scaled", layout="packed", node_block=nb)
        params = params_batch(
            model, {"logM1": model.param_dict["logM1"] +
                    0.1 * np.random.default_rng(5).normal(size=5)},
            (5,), dtype=jnp.float32)
        total, xi = f(params)
        assert xi.shape == (5, n_nodes, n_xi)
        outs.append((np.asarray(total), np.asarray(xi)))
    for t, x in outs[1:]:
        # Identical arithmetic per node regardless of the block split.
        np.testing.assert_array_equal(t, outs[0][0])
        np.testing.assert_array_equal(x, outs[0][1])
    with pytest.raises(ValueError):
        make_fused_grid_predictor(
            stacked, n_nodes, *occupation_functions(model),
            tuple(model.param_dict.keys()), interpret=True,
            layout="packed", node_block=4)


@pytest.mark.parametrize("mode", ["auto", "cross"])
@pytest.mark.parametrize("accuracy", ["elementwise", "scaled"])
def test_grid_stream_fold_spline_matches_manual_reduce(mode, accuracy):
    """fold_spline=True accumulates sum_n w[b, n] xi_n[b, :] in-kernel;
    it must match the unfolded per-node output reduced host-side, and
    NaN weights must poison exactly the offending samples."""
    n_nodes, n_xi = 6, 7
    tabs = _grid_tabs(n_nodes, 12, 2, n_xi, mode, seed=13)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    common = dict(batch_tile=8, interpret=True, accuracy=accuracy,
                  layout="packed", node_block=3)
    f_nodes = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), **common)
    f_fold = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), fold_spline=True, **common)
    rng = np.random.default_rng(21)
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.1 * rng.normal(size=5)}, (5,), dtype=jnp.float32)
    nw = rng.normal(size=(5, n_nodes)).astype(np.float32)
    nw[3] = np.nan
    t_n, xi_n = f_nodes(params)
    t_f, xi_f = f_fold(params, jnp.asarray(nw))
    np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_n))
    want = np.einsum("bn,bnk->bk", nw, np.asarray(xi_n, np.float64))
    got = np.asarray(xi_f, np.float64)
    assert got.shape == (5, n_xi)
    assert np.all(np.isnan(got[3]))
    scale = np.max(np.abs(want[[0, 1, 2, 4]]))
    np.testing.assert_allclose(got[[0, 1, 2, 4]], want[[0, 1, 2, 4]],
                               atol=2e-6 * scale, rtol=2e-5)


def test_grid_stream_sub_tile_stagger_matches():
    """Intra-tile staggering (resident unpipelined schedule) reorders
    issue only; results match the unstaggered kernel.  On TPU they are
    bit-identical (row-count-independent MXU accumulation); interpret
    mode's CPU GEMM blocking shifts last-ulp results, so the assert
    here is tight-closeness.  'auto' resolves to 1 (measured a wash on
    v5e at the production shape — see ops/fused.py), asserted via
    bit-equality with the explicit 1."""
    n_nodes, n_xi = 6, 5
    tabs = _grid_tabs(n_nodes, 10, 2, n_xi, "auto", seed=31)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    common = dict(batch_tile=8, interpret=True, accuracy="scaled",
                  layout="packed", node_block=n_nodes, fold_spline=True)
    rng = np.random.default_rng(33)
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.1 * rng.normal(size=8)}, (8,), dtype=jnp.float32)
    nw = rng.dirichlet(np.ones(n_nodes), size=8).astype(np.float32)
    outs = {}
    for sub in (1, 2, 4, "auto"):
        f = make_fused_grid_predictor(
            stacked, n_nodes, *occupation_functions(model),
            tuple(model.param_dict.keys()), sub_tiles=sub, **common)
        t, xi = f(params, jnp.asarray(nw))
        outs[sub] = (np.asarray(t), np.asarray(xi, np.float64))
    # interpret-mode 'auto' is 1: bit-identical to the explicit 1.
    np.testing.assert_array_equal(outs["auto"][1], outs[1][1])
    scale = np.max(np.abs(outs[1][1]))
    for sub in (2, 4):
        np.testing.assert_array_equal(outs[sub][0], outs[1][0])
        np.testing.assert_allclose(outs[sub][1], outs[1][1],
                                   atol=1e-6 * scale, rtol=1e-5)


def test_grid_stream_pipeline_bit_identity():
    """The resident-grid cross-tile pipeline (ping-pong scratch, out
    windows one step behind) is an issue-order change only: pipeline
    True/False must agree bit-for-bit, fold and unfold, at nt == 1 and
    nt > 1 (the clamped-window edges), and the knob must refuse the
    node-streamed (n_blocks > 1) configuration."""
    n_nodes, n_xi = 4, 5
    tabs = _grid_tabs(n_nodes, 10, 1, n_xi, "auto", seed=9)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    occ = occupation_functions(model)
    names = tuple(model.param_dict.keys())
    rng = np.random.default_rng(31)
    for B in (8, 4):   # tile 4 -> two tiles, then the single-tile edge
        params = params_batch(
            model, {"logM1": model.param_dict["logM1"] +
                    0.1 * rng.normal(size=B)}, (B,), dtype=jnp.float32)
        nw = rng.dirichlet(np.ones(n_nodes), size=B).astype(np.float32)
        for fold in (True, False):
            kw = dict(batch_tile=4, interpret=True, accuracy="scaled",
                      layout="packed", node_block=n_nodes,
                      fold_spline=fold)
            outs = []
            for pipe in (False, True):
                f = make_fused_grid_predictor(stacked, n_nodes, *occ,
                                              names, pipeline=pipe, **kw)
                outs.append(f(params, jnp.asarray(nw)) if fold
                            else f(params))
            for a, b in zip(*outs):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))
    with pytest.raises(ValueError, match="resident"):
        make_fused_grid_predictor(stacked, n_nodes, *occ, names,
                                  batch_tile=4, interpret=True,
                                  layout="packed", node_block=2,
                                  pipeline=True)


def test_grid_stream_fold_requires_packed_layout():
    n_nodes, n_xi = 2, 3
    tabs = _grid_tabs(n_nodes, 8, 1, n_xi, "auto", seed=1)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    with pytest.raises(ValueError, match="packed"):
        make_fused_grid_predictor(
            stacked, n_nodes, *occupation_functions(model),
            tuple(model.param_dict.keys()), interpret=True,
            layout="slab", fold_spline=True)


def test_grid_node_weights_reproduce_spline():
    """_grid_node_weights @ values == _spline_over_grid(values) on a
    multi-axis grid, including NaN outside the grid when
    extrapolate=False."""
    from tabcorr_tpu.predictor import (_grid_node_weights,
                                       _spline_over_grid)
    from tabcorr_tpu.interpolator import spline_interpolation_matrix

    rng = np.random.default_rng(8)
    xps = [np.linspace(-0.4, 0.4, 4), np.linspace(0.0, 1.0, 5)]
    a_dev = [jnp.asarray(spline_interpolation_matrix(xp), jnp.float32)
             for xp in xps]
    xp_dev = [jnp.asarray(xp, jnp.float32) for xp in xps]
    keys = ["p0", "p1"]
    grid_shape = (4, 5)
    values = rng.normal(size=(20, 5)).astype(np.float32)
    for extrapolate in (True, False):
        params = {"p0": jnp.asarray([-0.2, 0.13, 0.6], jnp.float32),
                  "p1": jnp.asarray([0.4, 0.77, 0.5], jnp.float32)}
        nw = _grid_node_weights(params, keys, xp_dev, a_dev, extrapolate)
        got = np.asarray(nw, np.float64) @ values.astype(np.float64)
        want = np.stack([np.asarray(_spline_over_grid(
            {k: v[i] for k, v in params.items()}, keys, xp_dev, a_dev,
            grid_shape, jnp.asarray(values), extrapolate), np.float64)
            for i in range(3)])
        if extrapolate:
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
        else:
            assert np.all(np.isnan(got[2])) and np.all(np.isnan(want[2]))
            np.testing.assert_allclose(got[:2], want[:2], rtol=2e-5,
                                       atol=1e-6)


def test_grid_stream_fold_dp_mesh_sharding():
    """The folded kernel shard_maps over a dp mesh with the extra
    node-weight operand batch-sharded."""
    from jax.sharding import Mesh

    n_nodes, n_xi = 4, 5
    tabs = _grid_tabs(n_nodes, 10, 1, n_xi, "auto", seed=17)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    common = dict(batch_tile=4, interpret=True, accuracy="scaled",
                  layout="packed", fold_spline=True)
    f_mesh = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), mesh=mesh, **common)
    f_plain = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), **common)
    rng = np.random.default_rng(2)
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.1 * rng.normal(size=16)}, (16,), dtype=jnp.float32)
    nw = jnp.asarray(rng.normal(size=(16, n_nodes)), jnp.float32)
    t_m, x_m = f_mesh(params, nw)
    t_p, x_p = f_plain(params, nw)
    np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_p),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_p),
                               rtol=1e-5, atol=1e-12)


def _make_interpolator(n_nodes=4, n_xi=6, mode="auto"):
    tabs = _grid_tabs(n_nodes, 10, 1, n_xi, mode, seed=9)
    pt = ColumnTable()
    pt["log_eta"] = np.linspace(-0.4, 0.4, n_nodes)
    return tt.Interpolator(tabs, pt), tabs


def test_interpolator_fused_streaming_route_matches_xla(monkeypatch):
    """When the stacked constants exceed the VMEM budget, the fused
    Interpolator path routes to the streamed kernel and matches the XLA
    engine."""
    import tabcorr_tpu.predictor as pred_mod

    interp, _ = _make_interpolator()
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    model.param_dict["log_eta"] = 0.0

    # Force the streaming route regardless of actual size.
    monkeypatch.setattr(pred_mod, "_fused_constants_fit_vmem",
                        lambda *a, **k: False)
    f_stream = make_predictor(interp, model, engine="fused",
                              accuracy="scaled")
    f_xla = make_predictor(interp, model, engine="xla",
                           dtype=jnp.float32)
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.05 * np.random.default_rng(3).normal(size=6),
                "log_eta": np.random.default_rng(4).uniform(-0.3, 0.3, 6)},
        (6,), dtype=jnp.float32)
    ng_s, xi_s = f_stream(params)
    ng_x, xi_x = f_xla(params)
    np.testing.assert_allclose(np.asarray(ng_s), np.asarray(ng_x),
                               rtol=2e-5)
    scale = float(np.max(np.abs(np.asarray(xi_x))))
    assert np.max(np.abs(np.asarray(xi_s) - np.asarray(xi_x))) < 2e-5 * scale


@pytest.mark.parametrize("route", ["resident", "streamed"])
def test_interpolator_fused_ngal_nan_outside_grid(monkeypatch, route):
    """extrapolate=False poisons ngal (not just xi) for out-of-grid
    samples on every fused Interpolator route, matching the XLA engine,
    which splines ngal over the grid (reference splines ngal too:
    interpolator.py:196-205)."""
    import tabcorr_tpu.predictor as pred_mod

    interp, _ = _make_interpolator()
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    model.param_dict["log_eta"] = 0.0
    if route == "streamed":
        monkeypatch.setattr(pred_mod, "_fused_constants_fit_vmem",
                            lambda *a, **k: False)
    f_fused = make_predictor(interp, model, engine="fused",
                             accuracy="scaled", extrapolate=False)
    f_xla = make_predictor(interp, model, engine="xla",
                           dtype=jnp.float32, extrapolate=False)
    # Sample 1 sits outside the log_eta grid [-0.4, 0.4].
    params = params_batch(
        model, {"log_eta": np.array([0.1, 0.9, -0.2], np.float32)},
        (3,), dtype=jnp.float32)
    for f in (f_fused, f_xla):
        ngal, xi = f(params)
        ngal = np.asarray(ngal)
        xi = np.asarray(xi).reshape(3, -1)
        assert np.isnan(ngal[1]) and np.all(np.isnan(xi[1]))
        assert np.all(np.isfinite(ngal[[0, 2]]))
        assert np.all(np.isfinite(xi[[0, 2]]))


def test_interpolator_auto_engine_covers_oversized_grids(monkeypatch):
    """engine='auto' on a TPU backend picks 'fused' for Interpolators
    even when the resident bundle would not fit (the streamed kernel
    takes over); a plain TabCorr that does not fit falls back to XLA."""
    import tabcorr_tpu.predictor as pred_mod

    interp, tabs = _make_interpolator()
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    model.param_dict["log_eta"] = 0.0
    monkeypatch.setattr(pred_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pred_mod, "_fused_constants_fit_vmem",
                        lambda *a, **k: False)
    captured = {}

    def fake_interp_fused(*args, **kwargs):
        captured["called"] = True
        return lambda params: None

    monkeypatch.setattr(pred_mod, "_interpolator_fused_predict_fn",
                        fake_interp_fused)
    make_predictor(interp, model, engine="auto")
    assert captured.get("called")

    # Plain TabCorr beyond the budget still routes to XLA under 'auto'.
    f = make_predictor(tabs[0], model, engine="auto")
    assert f is not None  # xla path built without touching Pallas


def test_grid_stream_dp_mesh_sharding():
    """The streamed kernel shard_maps over a dp mesh with identical
    numerics to the unsharded run."""
    from jax.sharding import Mesh

    n_nodes, n_xi = 4, 5
    tabs = _grid_tabs(n_nodes, 10, 1, n_xi, "auto", seed=11)
    stacked = _stack(tabs)
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    f_mesh = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), batch_tile=4, interpret=True,
        accuracy="scaled", layout="packed", mesh=mesh)
    f_plain = make_fused_grid_predictor(
        stacked, n_nodes, *occupation_functions(model),
        tuple(model.param_dict.keys()), batch_tile=4, interpret=True,
        accuracy="scaled", layout="packed")
    params = params_batch(
        model, {"logM1": model.param_dict["logM1"] +
                0.1 * np.random.default_rng(2).normal(size=16)},
        (16,), dtype=jnp.float32)
    t_m, x_m = f_mesh(params)
    t_p, x_p = f_plain(params)
    # Same per-row arithmetic; CPU interpret mode may vary reduction
    # order across the shard boundary by an ulp.
    np.testing.assert_allclose(np.asarray(t_m), np.asarray(t_p),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_p),
                               rtol=1e-5, atol=1e-12)
