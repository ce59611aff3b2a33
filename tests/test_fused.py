"""Pallas fused predict kernel vs the XLA path (interpret mode on CPU)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import tabcorr_tpu as tt
from tabcorr_tpu.ops.fused import make_fused_predictor
from tabcorr_tpu.predictor import (make_predictor, occupation_functions,
                                   params_batch)


@pytest.mark.parametrize("fixture", ["wp_tabcorr", "ds_tabcorr"])
def test_fused_matches_xla(fixture, bol_model, request):
    halotab = request.getfixturevalue(fixture)
    table = halotab.table_data(dtype=jnp.float32)
    occ_c, occ_s = occupation_functions(bol_model)
    names = tuple(bol_model.param_dict)
    fused = make_fused_predictor(table, occ_c, occ_s, names,
                                 batch_tile=32, interpret=True)

    B = 70  # deliberately not a tile multiple: exercises padding
    rng = np.random.default_rng(1)
    params = params_batch(
        bol_model,
        {"logM1": bol_model.param_dict["logM1"] +
         0.1 * rng.normal(size=B)}, (B,))

    plain = make_predictor(halotab, bol_model, dtype=jnp.float32)
    ngal_p, xi_p = plain(params)
    ngal_f, xi_f = fused(params)

    assert ngal_f.shape == (B,)
    np.testing.assert_allclose(np.asarray(ngal_f), np.asarray(ngal_p),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xi_f), np.asarray(xi_p),
                               rtol=2e-5)


def test_fused_interpolator_matches_xla(ds_interpolator, model):
    # The fused Interpolator engine (stacked-node contraction) must agree
    # with the XLA path; interpret mode exercises the kernel on CPU.
    import tabcorr_tpu.predictor as pred_mod
    import tabcorr_tpu.ops.fused as fused_mod

    orig = fused_mod.make_fused_contraction

    def interpreted(table, batch_tile=fused_mod.DEFAULT_TILE, **kw):
        kw["interpret"] = True
        return orig(table, batch_tile=batch_tile, **kw)

    fused_mod.make_fused_contraction = interpreted
    try:
        f_fused = pred_mod.make_predictor(
            ds_interpolator, model, dtype=jnp.float32, engine="fused")
        f_xla = pred_mod.make_predictor(
            ds_interpolator, model, dtype=jnp.float32, engine="xla")

        rng = np.random.default_rng(5)
        B = 20
        params = params_batch(
            model, {"log_eta": rng.uniform(-0.4, 0.4, B),
                    "logM1": 13.9 + 0.1 * rng.normal(size=B)}, (B,))
        ng_f, xi_f = f_fused(params)
        ng_x, xi_x = f_xla(params)
        np.testing.assert_allclose(np.asarray(ng_f), np.asarray(ng_x),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(xi_f), np.asarray(xi_x),
                                   rtol=1e-4, atol=1e-4 * float(
                                       np.max(np.abs(np.asarray(xi_x)))))
    finally:
        fused_mod.make_fused_contraction = orig


def test_bundle_predictor_matches_host(wp_tabcorr, bol_model):
    # One-kernel bundle (in-kernel occupation + contraction) vs the f64
    # host path, interpret mode on CPU.
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    tables = [wp_tabcorr.table_data(n_gauss=10, dtype=jnp.float32)]
    f = make_fused_bundle_predictor(
        tables, *occupation_functions(bol_model),
        tuple(bol_model.param_dict.keys()), batch_tile=8, interpret=True)

    B = 8
    rng = np.random.default_rng(3)
    params = params_batch(
        bol_model,
        {"logM1": bol_model.param_dict["logM1"] +
         0.1 * rng.normal(size=B)}, (B,), dtype=jnp.float32)
    [(ngal, xi)] = f(params)
    assert xi.shape == (B,) + tuple(wp_tabcorr.tpcf_shape)

    import tabcorr_tpu as tt
    scale = None
    for i in [0, 5]:
        m = tt.Zheng07Model(threshold=-18,
                            redshift=wp_tabcorr.attrs["redshift"])
        for k in ("logM1",):
            m.param_dict[k] = float(params[k][i])
        ngal_i, xi_i = wp_tabcorr.predict(m, check_consistency=False)
        scale = np.max(np.abs(xi_i)) if scale is None else scale
        assert np.isclose(float(ngal[i]), ngal_i, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(xi[i]), xi_i, rtol=1e-4,
                                   atol=2e-6 * scale)


def test_bundle_slab_packing_matches_unpacked(wp_tabcorr, bol_model):
    # Slab packing (pack = 128 // ceil8(n_bins) statistics per 128-lane
    # MXU output group) must be a pure layout change: identical ngal and
    # xi up to f32 reduction order in the 64- vs 128-lane epilogue sums.
    # Covers pack=2 with an odd slab count (19 slabs of 60 bins) and
    # pack=3 with lane-group padding (40 bins: 3*40 = 120 < 128).
    import dataclasses

    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    table = wp_tabcorr.table_data(dtype=jnp.float32)
    keep = np.r_[0:20, 30:50]
    small = dataclasses.replace(
        table,
        tpcf_dense=table.tpcf_dense[:, keep][:, :, keep],
        n_h=table.n_h[keep],
        log_prim_quad=table.log_prim_quad[keep],
        quad_weight=table.quad_weight[keep],
        sec_perc=table.sec_perc[keep],
        n_centrals=20,
        log_prim_quad_lo=(None if table.log_prim_quad_lo is None
                          else table.log_prim_quad_lo[keep]))

    occ_c, occ_s = occupation_functions(bol_model)
    names = tuple(bol_model.param_dict)
    rng = np.random.default_rng(3)
    B = 48
    params = params_batch(
        bol_model, {"logM1": bol_model.param_dict["logM1"] +
                    0.2 * rng.normal(size=B)}, (B,))
    for tabs, acc in [([table], ["elementwise"]), ([small], ["scaled"])]:
        kw = dict(batch_tile=16, interpret=True, accuracy=acc)
        f_pack = make_fused_bundle_predictor(tabs, occ_c, occ_s, names,
                                             pack_slabs=True, **kw)
        f_ref = make_fused_bundle_predictor(tabs, occ_c, occ_s, names,
                                            pack_slabs=False, **kw)
        [(ng_p, xi_p)] = f_pack(params)
        [(ng_r, xi_r)] = f_ref(params)
        np.testing.assert_array_equal(np.asarray(ng_p), np.asarray(ng_r))
        np.testing.assert_allclose(
            np.asarray(xi_p), np.asarray(xi_r), rtol=5e-7,
            atol=5e-7 * float(np.max(np.abs(np.asarray(xi_r)))))


def test_bundle_sub_tile_staggering_bit_identical(wp_tabcorr, bol_model):
    # sub_tiles staggers VPU/MXU issue order only; every row's math is
    # unchanged, so outputs must be bit-identical (3 does not divide the
    # tile and must silently fall back to 1).
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    table = wp_tabcorr.table_data(dtype=jnp.float32)
    occ_c, occ_s = occupation_functions(bol_model)
    names = tuple(bol_model.param_dict)
    params = params_batch(
        bol_model, {"logM1": bol_model.param_dict["logM1"] +
                    np.linspace(-0.2, 0.2, 32)}, (32,))
    kw = dict(batch_tile=16, interpret=True)
    [(ng1, xi1)] = make_fused_bundle_predictor(
        [table], occ_c, occ_s, names, sub_tiles=1, **kw)(params)
    for s in (2, 4, 3):
        [(ng, xi)] = make_fused_bundle_predictor(
            [table], occ_c, occ_s, names, sub_tiles=s, **kw)(params)
        np.testing.assert_array_equal(np.asarray(ng), np.asarray(ng1))
        np.testing.assert_array_equal(np.asarray(xi), np.asarray(xi1))


def test_bundle_cross_tile_pipeline_bit_identical(wp_tabcorr, ds_tabcorr,
                                                  bol_model):
    # pipeline=True software-pipelines the kernel ACROSS batch tiles
    # (tile i's contractions run during grid step i+1 against tile
    # i+1's occupation quadrature, densities parked in a ping-pong VMEM
    # scratch).  Same arithmetic in a different issue order: outputs
    # must be bit-identical to the single-step kernel, including the
    # single-tile edge case (one real step + one boundary-clamped step)
    # and the interplay with sub_tiles / fuse_occupation.
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    tables = [wp_tabcorr.table_data(dtype=jnp.float32),
              ds_tabcorr.table_data(dtype=jnp.float32)]
    occ_c, occ_s = occupation_functions(bol_model)
    names = tuple(bol_model.param_dict)
    params = params_batch(
        bol_model, {"logM1": bol_model.param_dict["logM1"] +
                    np.linspace(-0.2, 0.2, 48)}, (48,))
    kw = dict(batch_tile=16, interpret=True,
              accuracy=["elementwise", "scaled"])
    for fuse in (False, True):
        for sub in (1, 2):
            ref = make_fused_bundle_predictor(
                [*tables], occ_c, occ_s, names, pipeline=False,
                fuse_occupation=fuse, sub_tiles=sub, **kw)(params)
            got = make_fused_bundle_predictor(
                [*tables], occ_c, occ_s, names, pipeline=True,
                fuse_occupation=fuse, sub_tiles=sub, **kw)(params)
            for (ng_r, xi_r), (ng_g, xi_g) in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(ng_g),
                                              np.asarray(ng_r))
                np.testing.assert_array_equal(np.asarray(xi_g),
                                              np.asarray(xi_r))
    # Single-tile batch: the pipelined grid is (2,) with both the input
    # window clamp (step 1 re-reads tile 0) and the output window clamp
    # (step 0 writes garbage that step 1 overwrites) active at once.
    params1 = params_batch(
        bol_model, {"logM1": bol_model.param_dict["logM1"] +
                    np.linspace(-0.1, 0.1, 16)}, (16,))
    ref = make_fused_bundle_predictor(
        [*tables], occ_c, occ_s, names, pipeline=False, **kw)(params1)
    got = make_fused_bundle_predictor(
        [*tables], occ_c, occ_s, names, pipeline=True, **kw)(params1)
    for (ng_r, xi_r), (ng_g, xi_g) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(ng_g), np.asarray(ng_r))
        np.testing.assert_array_equal(np.asarray(xi_g), np.asarray(xi_r))


def test_bundle_fused_occupation_bit_identical(wp_tabcorr, ds_tabcorr,
                                               bol_model):
    # fuse_occupation concatenates the tables' (128-aligned) node rows so
    # one VPU pass per galaxy type serves every table; the same node
    # values flow through the same arithmetic, so outputs must be
    # bit-identical to the unfused kernel.  Covers a mixed auto + cross
    # bundle and the interplay with sub-tile staggering.
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    tables = [wp_tabcorr.table_data(dtype=jnp.float32),
              ds_tabcorr.table_data(dtype=jnp.float32)]
    occ_c, occ_s = occupation_functions(bol_model)
    names = tuple(bol_model.param_dict)
    params = params_batch(
        bol_model, {"logM1": bol_model.param_dict["logM1"] +
                    np.linspace(-0.2, 0.2, 32)}, (32,))
    kw = dict(batch_tile=16, interpret=True,
              accuracy=["elementwise", "scaled"])
    ref = make_fused_bundle_predictor(
        [*tables], occ_c, occ_s, names, fuse_occupation=False, **kw)(params)
    for sub in (1, 2):
        got = make_fused_bundle_predictor(
            [*tables], occ_c, occ_s, names, fuse_occupation=True,
            sub_tiles=sub, **kw)(params)
        for (ng_r, xi_r), (ng_g, xi_g) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(ng_g),
                                          np.asarray(ng_r))
            np.testing.assert_array_equal(np.asarray(xi_g),
                                          np.asarray(xi_r))


def test_fused_contraction_slab_packing(wp_tabcorr):
    # The standalone fused-contraction engine shares the packed slab
    # layout; packed vs unpacked must agree to f32 reduction order on a
    # pack=2 table (60 bins).
    from tabcorr_tpu.ops.fused import make_fused_contraction

    table = wp_tabcorr.table_data(dtype=jnp.float32)
    rng = np.random.default_rng(11)
    ngal = jnp.asarray(rng.uniform(0, 1e-4, (32, table.n_bins)),
                       jnp.float32)
    kw = dict(batch_tile=16, interpret=True)
    tot_p, xi_p = make_fused_contraction(table, pack_slabs=True, **kw)(ngal)
    tot_r, xi_r = make_fused_contraction(table, pack_slabs=False, **kw)(ngal)
    np.testing.assert_array_equal(np.asarray(tot_p), np.asarray(tot_r))
    np.testing.assert_allclose(np.asarray(xi_p), np.asarray(xi_r),
                               rtol=5e-7, atol=5e-7 * float(
                                   np.max(np.abs(np.asarray(xi_r)))))


def test_multi_predictor_bundle_engine_matches_xla(wp_tabcorr, bol_model):
    from tabcorr_tpu.predictor import make_multi_predictor

    f_b = make_multi_predictor([wp_tabcorr, wp_tabcorr], bol_model,
                               engine="bundle", batch_tile=8)
    f_x = make_multi_predictor([wp_tabcorr, wp_tabcorr], bol_model,
                               engine="xla")
    params = params_batch(bol_model, {}, (8,), dtype=jnp.float32)
    out_b = f_b(params)
    out_x = f_x(params)
    for (ng_b, xi_b), (ng_x, xi_x) in zip(out_b, out_x):
        np.testing.assert_allclose(np.asarray(ng_b), np.asarray(ng_x),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(xi_b), np.asarray(xi_x), rtol=1e-4,
            atol=2e-6 * float(np.max(np.abs(np.asarray(xi_x)))))


def test_bundle_cross_mode_matches_host(ds_tabcorr, bol_model):
    # Cross-mode (delta-sigma) table through the bundle kernel: the
    # wp+xi+ds joint-likelihood shape.
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor

    tables = [ds_tabcorr.table_data(n_gauss=10, dtype=jnp.float32)]
    f = make_fused_bundle_predictor(
        tables, *occupation_functions(bol_model),
        tuple(bol_model.param_dict.keys()), batch_tile=8, interpret=True)
    params = params_batch(bol_model, {}, (8,), dtype=jnp.float32)
    [(ngal, ds)] = f(params)
    ngal_h, ds_h = ds_tabcorr.predict(bol_model, check_consistency=False)
    assert np.isclose(float(ngal[0]), ngal_h, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ds[0]), ds_h, rtol=1e-4,
        atol=2e-6 * float(np.max(np.abs(ds_h))))


def test_bundle_scaled_accuracy_contract(bol_model):
    # The 'scaled' per-table contract assigns low-amplitude statistic rows
    # fewer MXU passes (bf16 splits emulated faithfully in interpret
    # mode).  The xi_0/2/4 bench tabulation spans ~7 decades of row
    # amplitude, so multiple pass groups must appear, outputs must come
    # back in the original row order, and the result must stay within the
    # 1e-6-scaled budget of the f64 host path.
    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import (_bundle_table_constants,
                                       make_fused_bundle_predictor)
    from tabcorr_tpu.predictor import occupation_functions, params_batch

    path = (Path(__file__).absolute().parent / "data" / "examples" /
            "synthetic_xi_ell.hdf5")
    xi_tab = tt.TabCorr.read(path)
    model = tt.Zheng07Model(threshold=-18,
                            redshift=xi_tab.attrs["redshift"])
    table = xi_tab.table_data(n_gauss=10, dtype=jnp.float32)

    cfg = _bundle_table_constants(table, error_model="scaled")
    assert len(cfg["groups"]) >= 2            # class machinery engaged
    assert sum(c for _, c in cfg["groups"]) == cfg["n_xi"]
    assert sorted(cfg["row_inv_perm"]) == list(range(cfg["n_xi"]))

    f = make_fused_bundle_predictor(
        [table], *occupation_functions(model),
        tuple(model.param_dict.keys()), batch_tile=8, interpret=True,
        accuracy=("scaled",))
    params = params_batch(model, {}, (8,), dtype=jnp.float32)
    [(ngal, xi)] = f(params)
    ngal_h, xi_h = xi_tab.predict(model, check_consistency=False)
    scale = float(np.max(np.abs(xi_h)))
    assert np.isclose(float(ngal[0]), ngal_h, rtol=1e-5)
    assert np.max(np.abs(np.asarray(xi[0]) - xi_h)) < 1e-6 * scale


def test_bundle_mxu_epilogue_matches_vpu(bol_model):
    # auto_epilogue='mxu' replaces the per-statistic VPU lane reduces
    # with exact-split dots against a 0/1 reduce map.  The summation
    # ORDER differs (pairwise within the dot vs sequential lane adds) so
    # bit identity is not expected, but both epilogues must land within
    # the same 1e-6-scaled budget of the f64 host path.  (Measured on
    # v5e the MXU epilogue is ~40% SLOWER — kept as a documented
    # negative result; see docs/performance.md.)
    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor
    from tabcorr_tpu.predictor import occupation_functions, params_batch

    path = (Path(__file__).absolute().parent / "data" / "examples" /
            "synthetic_xi_ell.hdf5")
    xi_tab = tt.TabCorr.read(path)
    model = tt.Zheng07Model(threshold=-18,
                            redshift=xi_tab.attrs["redshift"])
    table = xi_tab.table_data(n_gauss=10, dtype=jnp.float32)
    names = tuple(model.param_dict.keys())
    occ = occupation_functions(model)
    params = params_batch(model, {}, (8,), dtype=jnp.float32)

    outs = {}
    for epi in ("vpu", "mxu"):
        f = make_fused_bundle_predictor(
            [table], *occ, names, batch_tile=8, interpret=True,
            accuracy=("scaled",), auto_epilogue=epi)
        [(ngal, xi)] = f(params)
        outs[epi] = (np.asarray(ngal), np.asarray(xi))

    np.testing.assert_array_equal(outs["mxu"][0], outs["vpu"][0])
    ngal_h, xi_h = xi_tab.predict(model, check_consistency=False)
    scale = float(np.max(np.abs(xi_h)))
    for epi in ("vpu", "mxu"):
        assert np.max(np.abs(outs[epi][1][0] - xi_h)) < 1e-6 * scale
    np.testing.assert_allclose(outs["mxu"][1], outs["vpu"][1],
                               atol=1e-7 * scale)

    with pytest.raises(ValueError, match="auto_epilogue"):
        make_fused_bundle_predictor([table], *occ, names, batch_tile=8,
                                    interpret=True, accuracy=("scaled",),
                                    auto_epilogue="dma")


def test_scaled_margin_knob_controls_pass_classes():
    # The 'scaled' contract's safety margin is a real knob: a huge margin
    # forces every row to full 6-pass float32; the default margin
    # demotes the low-amplitude rows.  (Without a fiducial density the
    # legacy amplitude-ratio bound applies, whose default margin 30 is
    # load-bearing: margins 3-10 were MEASURED to break the 1e-6 budget
    # on the production xi table via the unmodeled cancellation factor —
    # see _row_pass_classes and docs/performance.md.)
    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import _bundle_table_constants

    path = (Path(__file__).absolute().parent / "data" / "examples" /
            "synthetic_xi_ell.hdf5")
    table = tt.TabCorr.read(path).table_data(n_gauss=10,
                                             dtype=jnp.float32)
    strict = _bundle_table_constants(table, error_model="scaled",
                                     margin=1e12)
    assert strict["groups"] == ((6, strict["n_xi"]),)
    default = _bundle_table_constants(table, error_model="scaled")
    assert len(default["groups"]) >= 2
    # Monotonicity: a looser margin can only demote more rows.
    loose = _bundle_table_constants(table, error_model="scaled",
                                    margin=1.0)
    def n_low(cfg):
        return sum(c for p, c in cfg["groups"] if p < 6)
    assert n_low(loose) >= n_low(default) > n_low(strict)


def test_fiducial_weight_bound_catches_cancellation():
    # The rigorous fiducial-density bound (weight_vec path of
    # _row_pass_classes) must classify rows by their UNSIGNED element
    # mass relative to the largest SIGNED output: a row whose entries
    # cancel under the weights (xi_2/xi_4-like sign structure) carries
    # large truncation error relative to its tiny signed value, which
    # the legacy amplitude-ratio proxy cannot see.  Measured on-chip:
    # the proxy under-estimates such rows by up to ~60x
    # (docs/performance.md).
    from tabcorr_tpu.ops.fused import _row_pass_classes

    rng = np.random.default_rng(3)
    nb = 16
    w = rng.uniform(0.5, 1.5, nb)
    # Row 0: loud positive row (sets the output scale).  Row 1: same
    # element MASS but alternating signs -> tiny signed value under w.
    # Row 2: genuinely tiny row (1e-5 of row 0's amplitude).
    base = rng.uniform(0.5, 1.0, (nb, nb))
    base = 0.5 * (base + base.T)
    sign = np.outer((-1.0) ** np.arange(nb), (-1.0) ** np.arange(nb))
    dense = np.stack([base, base * sign, base * 1e-5])

    # Legacy proxy: rows 0 and 1 have the same max amplitude -> same
    # class; the cancelling row is invisibly misclassified as "loud".
    legacy = _row_pass_classes(dense, 1e-6 / 30.0)
    assert legacy[0] == legacy[1] == 6

    # Fiducial bound: row 1's unsigned mass is ~row 0's, so it must ALSO
    # stay 6-pass (its error budget is tight relative to its mass);
    # row 2's unsigned mass is 1e-5 of the scale and may demote.
    fid = _row_pass_classes(dense, 1e-6 / 3.0, weight_vec=w)
    assert fid[0] == 6 and fid[1] == 6
    assert fid[2] < 6

    # The two models DIFFER when the SCALE-SETTING row cancels: the
    # loudest-amplitude row's signed value collapses under w, so the
    # true output scale is set by a much quieter row — every m inflates
    # by the cancellation factor.  The proxy, blind to w, still
    # normalizes by the loud row's amplitude and demotes the quiet row.
    dense2 = np.stack([base * sign, base * 1e-3])
    legacy2 = _row_pass_classes(dense2, 1e-6 / 3.0)
    fid2 = _row_pass_classes(dense2, 1e-6 / 3.0, weight_vec=w)
    assert legacy2[1] < 6          # proxy demotes the quiet row
    assert fid2[1] == 6            # rigorous bound: it sets the scale


def test_bundle_fiducial_params_build_and_match():
    # fiducial_params switches the 'scaled' class model; the kernel must
    # still build and agree with the float64 host path within the
    # contract at interpret-mode tolerances.
    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import make_fused_bundle_predictor
    from tabcorr_tpu.predictor import occupation_functions, params_batch

    path = (Path(__file__).absolute().parent / "data" / "examples" /
            "synthetic_xi_ell.hdf5")
    tab = tt.TabCorr.read(path)
    model = tt.Zheng07Model(threshold=-18,
                            redshift=tab.attrs["redshift"])
    table = tab.table_data(n_gauss=10, dtype=jnp.float32)
    occ = occupation_functions(model)
    names = tuple(model.param_dict.keys())
    f = make_fused_bundle_predictor(
        [table], *occ, names, batch_tile=8, interpret=True,
        accuracy=("scaled",), fiducial_params=dict(model.param_dict))
    params = params_batch(model, {}, (8,), dtype=jnp.float32)
    [(ngal, xi)] = f(params)
    ngal_h, xi_h = tab.predict(model, check_consistency=False)
    assert np.isclose(float(ngal[0]), ngal_h, rtol=1e-5)
    scale = float(np.max(np.abs(xi_h)))
    assert np.max(np.abs(np.asarray(xi[0], np.float64).ravel() -
                         np.asarray(xi_h).ravel())) < 2e-6 * scale


def test_cross_mode_scaled_contract(ds_tabcorr, bol_model):
    # 'scaled' on a CROSS-mode table (matvec contraction) engages the
    # pass-class machinery too — row k contracts against its own matrix
    # row, so the same amplitude argument applies.  Rows rescaled to span
    # 8 decades force multiple pass groups; the result must come back in
    # original row order and within the 1e-6-scaled budget of a float64
    # contraction.
    from tabcorr_tpu.ops.fused import (_pass_groups,
                                       make_fused_contraction)
    from tabcorr_tpu.ops.predict import mean_occupation

    table = ds_tabcorr.table_data(n_gauss=10, dtype=jnp.float32)
    n_xi = table.tpcf_dense.shape[0]
    factors = np.logspace(0, -8, n_xi)
    dense = np.asarray(table.tpcf_dense, np.float64) * factors[:, None]
    import dataclasses
    table = dataclasses.replace(table,
                                tpcf_dense=jnp.asarray(dense, jnp.float32))

    groups, _, inv = _pass_groups(table.tpcf_dense, False, "scaled")
    assert len(groups) >= 2
    assert sorted(inv) == list(range(n_xi))

    occ_c, occ_s = occupation_functions(bol_model)
    params = params_batch(bol_model, {}, (), dtype=jnp.float32)
    mean_occ = np.asarray(mean_occupation(table, occ_c, occ_s, params),
                          np.float64)
    ngal = mean_occ * np.asarray(table.n_h, np.float64)
    want = dense @ ngal / ngal.sum()

    contract = make_fused_contraction(table, batch_tile=8, interpret=True,
                                      error_model="scaled")
    ngal_b = jnp.broadcast_to(
        jnp.asarray(ngal, jnp.float32)[None, :], (8, len(ngal)))
    _, xi = contract(ngal_b)
    scale = float(np.max(np.abs(want)))
    assert np.max(np.abs(np.asarray(xi[0], np.float64) - want)) < \
        1e-6 * scale


def test_interpolator_fixture_fused_scaled_matches_host():
    # The 4-node xi_0/2/4 Interpolator fixture (log_eta grid, produced by
    # scripts/make_interp_bench_fixture.py) through the stacked-node
    # fused engine with per-node 'scaled' budgets: per-node class blocks
    # engage, and the result matches the float64 host path within the
    # per-table fused engine's documented 2e-6-scale tolerance.
    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import _pass_groups
    from tabcorr_tpu.ops.predict import TableData  # noqa: F401
    from tabcorr_tpu.predictor import make_predictor, params_batch

    path = (Path(__file__).absolute().parent / "data" / "examples" /
            "synthetic_xi_ell_interp.hdf5")
    interp = tt.Interpolator.read(path)
    assert len(interp.tabcorr_list) == 4
    model = tt.Zheng07Model(
        threshold=-20, redshift=interp.tabcorr_list[0].attrs["redshift"])
    model.param_dict["log_eta"] = 0.05

    # per-node normalization engages multiple pass groups on the stacked
    # matrix
    tables = [t.table_data(n_gauss=10, dtype=jnp.float32)
              for t in interp.tabcorr_list]
    stacked_dense = jnp.concatenate([t.tpcf_dense for t in tables], axis=0)
    n_xi = tables[0].tpcf_dense.shape[0]
    groups, _, _ = _pass_groups(stacked_dense, True, "scaled",
                                scale_block_rows=n_xi)
    assert len(groups) >= 2

    import tabcorr_tpu.ops.fused as fused_mod
    orig = fused_mod.make_fused_contraction

    def interpreted(table, batch_tile=fused_mod.DEFAULT_TILE, **kw):
        kw["interpret"] = True
        return orig(table, batch_tile=batch_tile, **kw)

    # predictor imports make_fused_contraction from ops.fused at call
    # time, so patching the module attribute is sufficient.
    fused_mod.make_fused_contraction = interpreted
    try:
        f = make_predictor(interp, model, engine="fused",
                           accuracy="scaled")
    finally:
        fused_mod.make_fused_contraction = orig
    params = params_batch(model, {}, (8,), dtype=jnp.float32)
    ng, xi = f(params)
    ngal_h, xi_h = interp.predict(model, check_consistency=False)
    scale = float(np.max(np.abs(xi_h)))
    assert np.isclose(float(ng[0]), ngal_h, rtol=1e-5)
    assert np.max(np.abs(np.asarray(xi[0], np.float64) - xi_h)) < 2e-6 * scale
