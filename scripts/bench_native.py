"""Microbenchmark for the native C++ cell-list pair counters.

Times the labeled-histogram counters (tabcorr_tpu.native) on a uniform
random box at production-like bin settings and prints one JSON line per
geometry: wall time, found pairs, and found-pairs/s.  The numbers in
docs/performance.md were produced by this script (2e5 tracers, one
AVX-512 core).

Usage: python scripts/bench_native.py [--n 200000] [--labels 60]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).absolute().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--n", type=int, default=200000)
    parser.add_argument("--labels", type=int, default=60)
    parser.add_argument("--box", type=float, default=250.0)
    args = parser.parse_args(argv)

    from tabcorr_tpu import native

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, args.box, (args.n, 3))
    labels = rng.integers(0, args.labels, args.n).astype(np.int32)
    rp_bins = np.logspace(-1, 1.6, 20)          # 0.1 - 40 Mpc/h

    for kind, kw in (("rppi", dict(pi_max=80.0)),
                     ("proj", {}),
                     ("smu", dict(mu_edges=np.linspace(0, 1, 21)))):
        t0 = time.perf_counter()
        out = native.labeled_pair_count(pos, labels, args.labels,
                                        period=args.box, kind=kind,
                                        r_edges=rp_bins, **kw)
        dt = time.perf_counter() - t0
        found = float(np.asarray(out).sum())
        print(json.dumps({"kind": kind, "n": args.n, "wall_s": round(dt, 3),
                          "found_pairs": found,
                          "found_pairs_per_s": found / dt}), flush=True)


if __name__ == "__main__":
    main()
