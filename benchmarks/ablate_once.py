"""One-process ablation sweep: plan once, time each ABLATE mode.

Results under ablation are numerically WRONG; timing only. Cost-share
companion to profile_kernel.py (which pays the full plan per mode).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--nnz", type=int, default=16)
    ap.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    ap.add_argument("--key", default="block")
    ap.add_argument("--widen", type=int, default=32)
    ap.add_argument("--row-tile", type=int, default=1024)
    ap.add_argument("--modes", default=",nogather,noscan,nofma")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random
    from ellspmv_tpu.ops import ell_pallas, plan as plan_mod

    vdt = np.float64 if args.dtype == "f64" else np.float32
    coo = banded_random(args.rows, args.nnz, args.band, seed=0)
    n = coo.num_rows
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=vdt, row_tile=256)
    x = np.random.RandomState(1).rand(n).astype(vdt)

    t0 = time.time()
    e2 = (ell if args.key == "rank" else plan_mod.rebucket_slots(
        ell, key=args.key, widen_to=args.widen))
    plan = plan_mod.best_plan(e2, value_dtype=vdt,
                              row_tiles=(args.row_tile,))
    if plan is None:
        print("no plan", file=sys.stderr)
        return 1
    print(f"plan: S={plan.rowsize} G={plan.G} KS={plan.KS} "
          f"ks={float(plan.qb[:, 1, :].mean()):.2f} T={plan.num_tiles} "
          f"({time.time() - t0:.1f}s)", flush=True)

    scale = jnp.asarray(1e-6, vdt)
    xj = jnp.asarray(x)

    def make_loop(iters, dp):
        @jax.jit
        def run(x0, dp_):
            def body(_, xk):
                return dp_(xk)[:n] * scale
            return jax.lax.fori_loop(0, iters, body, x0)
        return run

    def sync(v):
        np.asarray(v.ravel()[:1])

    dp = ell_pallas.DevicePlan(e2, plan, dd=(vdt == np.float64))
    for mode in args.modes.split(","):
        ell_pallas._ABLATE = mode
        jax.clear_caches()
        # honest spans: a 2-iter t_lo is dispatch-dominated and a single
        # +20 ms tunnel spike deflates min((t_hi-t_lo)/hi) wildly (a bogus
        # 0.049 ms "noscan" was measured this way); target ~0.3 s spans
        # and take the MEDIAN of 3 slopes like bench/harness.py
        lo, hi = 2, 40
        run_lo, run_hi = make_loop(lo, dp), make_loop(lo + hi, dp)
        sync(run_lo(xj, dp)); sync(run_hi(xj, dp))
        t0_ = time.perf_counter(); sync(run_hi(xj, dp))
        rough = max((time.perf_counter() - t0_) / hi, 1e-7)
        if rough * hi < 0.25:
            hi = min(1 << int(np.ceil(np.log2(0.3 / rough))), 4096)
            run_hi = make_loop(lo + hi, dp)
            sync(run_hi(xj, dp))
        slopes = []
        for _ in range(3):
            t0_ = time.perf_counter(); sync(run_lo(xj, dp))
            t_lo = time.perf_counter() - t0_
            t0_ = time.perf_counter(); sync(run_hi(xj, dp))
            t_hi = time.perf_counter() - t0_
            slopes.append(max((t_hi - t_lo) / hi, 1e-12))
        t = float(np.median(slopes))
        print(f"ablate={mode or '-':10s}: {t * 1e3:8.3f} ms  "
              f"{ell.num_nonzeros / t * 1e-9:6.2f} Gnz/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
