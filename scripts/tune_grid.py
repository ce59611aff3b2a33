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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tabcorr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_grid import build_interpolator

    import tabcorr_tpu as tt
    from tabcorr_tpu.ops.fused import (_grid_common_passes,
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

    # Roofline bookkeeping at this shape.
    dense = np.asarray(stacked.tpcf_dense, np.float32).reshape(
        n_nodes, n_xi, *stacked.tpcf_dense.shape[1:])
    groups, _, _ = _grid_common_passes(dense, args.accuracy)
    nbr = stacked.n_bins
    npair = nbr * (nbr + 1) // 2
    k_pad = -(-npair // 128) * 128
    macs_contract = k_pad * sum(p * c for p, c in groups) * n_nodes
    print(f"# shape: {n_nodes} nodes x {n_xi} rows x {nbr} bins "
          f"(npair={npair}, k_pad={k_pad}); classes {groups}")
    print(f"# contraction: {macs_contract / 1e6:.2f}M bf16 MACs/sample "
          f"-> {macs_contract / 98.5e3:.0f} ns at v5e bf16 peak "
          f"({98.5e6 / macs_contract:.2f}e6/s MXU bound)")

    def rate(f, fargs):
        jax.block_until_ready(f(*fargs))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*fargs)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return B / np.median(ts)

    results = []
    for tile, nb_blk, fold, pipe in itertools.product(
            args.tiles, args.node_blocks, (True, False), (True, False)):
        if n_nodes % nb_blk:
            continue
        if pipe and nb_blk != n_nodes:
            continue   # pipeline requires the grid resident
        try:
            f = make_fused_grid_predictor(
                stacked, n_nodes, occ_c, occ_s, names,
                batch_tile=tile, accuracy=args.accuracy,
                node_block=nb_blk, fold_spline=fold, pipeline=pipe)
            fargs = (params, nw) if fold else (params,)
            r = rate(f, fargs)
        except Exception as exc:
            print(f"tile={tile} node_block={nb_blk} fold={fold} "
                  f"pipe={pipe}: "
                  f"FAILED {type(exc).__name__}: {str(exc)[:120]}")
            continue
        results.append({"batch_tile": tile, "node_block": nb_blk,
                        "fold_spline": fold, "pipeline": pipe,
                        "rate": r})
        print(f"tile={tile:5d} node_block={nb_blk:3d} fold={int(fold)} "
              f"pipe={int(pipe)} -> {r / 1e6:.3f}e6/s")

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
