"""Config2 (banded-random) slot-widening sweep on hardware.

Round-1 weakness: full rows force slot=rank, and rank-slot windows are
order-statistic tails (ks_mean ~7; 22.5% roofline at full size). Widened
offset-bucket re-slotting trades padded-slot streaming for an S-fold
gather-scan reduction; this sweeps the widening factor to find the knee.

Usage: python benchmarks/sweep_reslot.py [--n 500000] [--widths 16,24,32,48]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--nnz", type=int, default=16)
    ap.add_argument("--bw", type=int, default=512)
    ap.add_argument("--widths", default="16,24,32,48,64")
    ap.add_argument("--key", default="offset",
                    help="rebucket key: offset | column | block")
    ap.add_argument("--quantile", type=float, default=None,
                    help="block-capacity quantile (key=block); width 0 "
                    "derives S_out from the quantile caps")
    ap.add_argument("--row-tile", type=int, default=0,
                    help="force a row tile (slope-1) instead of best_plan")
    ap.add_argument("--repeat", type=int, default=16)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import SpmvMetrics, benchmark_spmv
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random
    from ellspmv_tpu.ops import plan as plan_mod
    from ellspmv_tpu.ops.ell_pallas import DevicePlan
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    print(f"platform: {jax.devices()[0].device_kind}", flush=True)
    coo = banded_random(args.n, args.nnz, args.bw, seed=0)
    ell0 = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    base_metrics = SpmvMetrics.for_matrix(ell0)
    x = np.random.RandomState(1).rand(args.n)
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)

    for w in [int(s) for s in args.widths.split(",")]:
        t0 = time.perf_counter()
        ell = (ell0 if 0 < w <= ell0.rowsize else
               plan_mod.rebucket_slots(ell0, key=args.key,
                                       widen_to=(w or None),
                                       quantile=args.quantile))
        plan = (plan_mod.build_plan(ell, row_tile=args.row_tile, slope=1,
                                    value_dtype=np.float64)
                if args.row_tile else
                plan_mod.best_plan(ell, value_dtype=np.float64))
        if plan is None:
            print(f"S={w}: no plan", flush=True)
            continue
        dp = DevicePlan(ell, plan, dd=True)
        # duck-type what the chained harness reads off a "matrix"
        dp.num_rows = args.n
        dp.num_columns = args.n
        dp.values = np.zeros(0, np.float64)
        t_build = time.perf_counter() - t0

        def fn(op, xv, yv):
            out = op(xv)[:args.n].astype(np.float64)
            return out if yv is None else out + yv

        res = benchmark_spmv(fn, dp, x, repeat=args.repeat, warmup=2,
                             protocol="chained", metrics_matrix=ell0)
        got = np.asarray(fn(dp, jax.numpy.asarray(x), None), np.float64)
        err = np.max(np.abs(got - want)) / scale
        eff = base_metrics.min_bytes / res.best / 1e9
        print(f"S={plan.rowsize:<4d} ks_mean={plan.qb[:, 1, :].mean():5.2f} "
              f"KS={plan.KS:<3d} G={plan.G:<3d} slope={plan.slope} "
              f"t={res.best * 1e3:7.3f} ms  eff={eff:6.1f} GB/s "
              f"(orig-bytes)  err={err:.1e}  build={t_build:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
