"""Autotune the node-streamed grid kernel at the production 64-node shape.

Sweeps the packed streamed-grid kernel's knobs — batch_tile, node_block,
and the spline fold — at the published 'default' database geometry
(4 x 4 x 4 = 64 nodes x 42 xi_0/2/4 rows x 60 halo bins, auto mode;
reference: tabcorr/database.py:56-59) and prints a rate table plus the
kernel's roofline decomposition, mirroring scripts/tune_bundle.py for
the resident bundle.

Usage: python scripts/tune_grid.py [--batch 262144] [--reps 5] [--json]
"""

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))
sys.path.insert(0, str(Path(__file__).absolute().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--tiles", type=int, nargs="*",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--node-blocks", type=int, nargs="*",
                    default=[8, 16, 32, 64])
    ap.add_argument("--accuracy", default="scaled")
    ap.add_argument("--margins", type=float, nargs="*", default=[None],
                    help="'scaled' pass-class margins to sweep; each "
                    "point's realized scaled error is probed against "
                    "the float64 host Interpolator.predict path")
    ap.add_argument("--probes", type=int, default=16)
    ap.add_argument("--sub-tiles", type=int, nargs="*", default=[1, 2, 4, 8],
                    help="intra-tile stagger blocks (resident unpipelined)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tabcorr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_grid import build_interpolator

    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import (_fiducial_weight,
                                       _grid_common_passes,
                                       make_fused_grid_predictor)
    from tabcorr_tpu.ops.predict import TableData
    from tabcorr_tpu.predictor import (_grid_node_weights,
                                       occupation_functions, params_batch)

    interp = build_interpolator()
    model = tt.Zheng07Model(threshold=-20, redshift=0.0)
    for k, v in dict(alpha_c=0.2, alpha_s=1.0, log_eta=0.0).items():
        model.param_dict[k] = v

    # Stack the grid exactly as predictor._make_fused_interp_predict does.
    order = [int(i) for i in interp.param_dict_table["tabcorr_index"]]
    tables = [interp.tabcorr_list[i].table_data(n_gauss=10,
                                                dtype=jnp.float32)
              for i in order]
    base = tables[0]
    n_nodes = len(tables)
    n_xi = base.tpcf_dense.shape[0]
    stacked = TableData(
        tpcf_dense=jnp.concatenate([t.tpcf_dense for t in tables], axis=0),
        n_h=base.n_h, log_prim_quad=base.log_prim_quad,
        quad_weight=base.quad_weight, sec_perc=base.sec_perc,
        mode=base.mode, tpcf_shape=(n_nodes * n_xi,),
        n_centrals=base.n_centrals,
        log_prim_quad_lo=base.log_prim_quad_lo)
    occ_c, occ_s = occupation_functions(model)
    names = tuple(model.param_dict.keys())

    B = args.batch
    rngs = [np.random.default_rng(s) for s in (7, 8, 9)]
    params = params_batch(
        model,
        {"logM1": model.param_dict["logM1"] +
         0.1 * rngs[0].normal(size=B),
         "alpha_c": rngs[1].uniform(0.05, 0.35, B),
         "log_eta": rngs[2].uniform(-0.3, 0.3, B)},
        (B,), dtype=jnp.float32)
    keys = tuple(interp.keys)
    xp_dev = [jnp.asarray(xp, jnp.float32) for xp in interp.xp]
    a_dev = [jnp.asarray(a, jnp.float32) for a in interp.a]

    @jax.jit
    def node_w(params):
        return _grid_node_weights(params, keys, xp_dev, a_dev, False)

    nw = jax.block_until_ready(node_w(params))

    # Roofline bookkeeping at this shape, per margin.
    dense = np.asarray(stacked.tpcf_dense, np.float32).reshape(
        n_nodes, n_xi, *stacked.tpcf_dense.shape[1:])
    nbr = stacked.n_bins
    npair = nbr * (nbr + 1) // 2
    k_pad = -(-npair // 128) * 128
    print(f"# shape: {n_nodes} nodes x {n_xi} rows x {nbr} bins "
          f"(npair={npair}, k_pad={k_pad})", flush=True)
    w_fid = _fiducial_weight(stacked, occ_c, occ_s,
                             dict(model.param_dict))
    macs_contract = None
    for marg in args.margins:
        groups, _, _ = _grid_common_passes(dense, args.accuracy,
                                           margin=marg, weight_vec=w_fid)
        macs = k_pad * sum(p * c for p, c in groups) * n_nodes
        if macs_contract is None:
            macs_contract = macs
        print(f"# margin={marg}: classes {groups}; "
              f"{macs / 1e6:.2f}M bf16 MACs/sample "
              f"-> {macs / 98.5e3:.0f} ns at v5e bf16 peak "
              f"({98.5e6 / macs:.2f}e6/s MXU bound)", flush=True)

    def rate(f, fargs):
        jax.block_until_ready(f(*fargs))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*fargs)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return B / np.median(ts)

    # Realized scaled error per margin (probed once per margin on a
    # fold=True config — the tile/node_block/pipeline knobs are
    # bit-identical layouts): kernel output at the float32 parameter
    # values vs the float64 host Interpolator.predict path.
    def probe_error(f, fold):
        if not fold:
            return None
        out = f(params, nw)
        jax.block_until_ready(out)
        xi_dev = np.asarray(out[1][:args.probes], np.float64)
        err = 0.0
        for i in range(args.probes):
            for k in params:
                model.param_dict[k] = float(np.float32(params[k][i]))
            _, xi_h = interp.predict(model, check_consistency=False)
            scale = float(np.max(np.abs(xi_h)))
            err = max(err, float(np.max(np.abs(
                xi_dev[i].ravel() - xi_h.ravel()))) / scale)
        return err

    margin_err = {}
    results = []
    for tile, nb_blk, fold, pipe, marg, sub in itertools.product(
            args.tiles, args.node_blocks, (True, False), (True, False),
            args.margins, args.sub_tiles):
        if n_nodes % nb_blk:
            continue
        if pipe and nb_blk != n_nodes:
            continue   # pipeline requires the grid resident
        if sub != args.sub_tiles[0] and (pipe or nb_blk != n_nodes):
            continue   # stagger applies to resident unpipelined only
        try:
            f = make_fused_grid_predictor(
                stacked, n_nodes, occ_c, occ_s, names,
                batch_tile=tile, accuracy=args.accuracy,
                node_block=nb_blk, fold_spline=fold, pipeline=pipe,
                margin=marg, fiducial_params=dict(model.param_dict),
                sub_tiles=sub)
            if fold and marg not in margin_err:
                margin_err[marg] = probe_error(f, fold)
            fargs = (params, nw) if fold else (params,)
            r = rate(f, fargs)
        except Exception as exc:
            print(f"tile={tile} node_block={nb_blk} fold={fold} "
                  f"pipe={pipe} margin={marg} sub={sub}: "
                  f"FAILED {type(exc).__name__}: {str(exc)[:120]}",
                  flush=True)
            continue
        results.append({"batch_tile": tile, "node_block": nb_blk,
                        "fold_spline": fold, "pipeline": pipe,
                        "margin": marg, "sub_tiles": sub, "rate": r,
                        "scaled_err": margin_err.get(marg)})
        print(f"tile={tile:5d} node_block={nb_blk:3d} fold={int(fold)} "
              f"pipe={int(pipe)} margin={marg} sub={sub} "
              f"-> {r / 1e6:.3f}e6/s"
              + (f" err={margin_err[marg]:.2e}"
                 if fold and margin_err.get(marg) is not None else ""),
              flush=True)

    best = max(results, key=lambda r: r["rate"])
    out = {"metric": "grid64_kernel_sweep", "batch": B,
           "accuracy": args.accuracy, "best": best, "results": results,
           "mxu_bound_per_sec": 98.5e12 / macs_contract,
           "device": str(jax.devices()[0])}
    if args.json:
        print(json.dumps(out))
    else:
        print(f"best: {best}")


if __name__ == "__main__":
    main()
