"""One-shot poisson ELL bench for regression hunting.

Builds the suite's config1 matrix (poisson2d 1024), times the library
SpMV via the chained protocol, and prints one JSON line with the chosen
plan parameters — so knob ablations (run one subprocess per knob set,
knobs are read at plan/import time) can tell planner-side regressions
(different plan picked) from kernel-side ones (same plan, slower).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--matrix", default="poisson",
                    choices=["poisson", "banded"],
                    help="poisson: suite config1 (nx^2 rows); banded: "
                         "suite config2 (banded_random 2M/16/512)")
    ap.add_argument("--repeat", type=int, default=128)
    ap.add_argument("--row-tile", type=int, default=0,
                    help="force a single row-tile candidate in best_plan")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random, poisson2d
    from ellspmv_tpu.ops import ell_pallas

    coo = (poisson2d(args.nx) if args.matrix == "poisson"
           else banded_random(2_000_000, 16, 512, seed=0))
    x = np.random.RandomState(0).rand(coo.num_rows)
    t0 = time.time()
    ell = ell_from_coo(coo, sort_rows=True,
                       value_dtype=np.float64).device_put()
    kw = ({"row_tiles": (args.row_tile,)} if args.row_tile else {})
    dp = ell_pallas.get_plan(ell, **kw)
    plan = dp.plan if dp is not None else None
    t_plan = time.time() - t0
    res = benchmark_spmv(None, ell, x, repeat=args.repeat, warmup=2,
                         protocol="chained")
    out = {
        "best_ms": res.best * 1e3,
        "min_gb_per_s": res.min_gb_per_s(),
        "roofline": res.roofline_fraction(),
        "plan_s": round(t_plan, 2),
        "knobs": {k: v for k, v in os.environ.items()
                  if k.startswith("ELLSPMV_TPU_")},
    }
    if plan is not None:
        out["plan"] = {
            "S": plan.rowsize, "G": plan.G, "KS": plan.KS,
            "T": plan.num_tiles,
            "ks_mean": round(float(plan.qb[:, 1, :].mean()), 3),
            "static_window": bool(plan.static_window),
            "lcol_dtype": str(np.asarray(plan.lcol).dtype),
        }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
