"""Kernel profiling: time forced Pallas plan variants on one config.

Usage:
  python benchmarks/profile_kernel.py [--rows N] [--band B] [--nnz K]
      [--dtype f64|f32] [--variant auto|rank|offset|column|
                         offset-w2|offset-w4|column-w2]
  ELLSPMV_TPU_ABLATE=nogather|noscan|nofma  isolates kernel cost shares
  (results are WRONG under ablation; timing only).

Prints one line: variant, plan shape (S G KS ks_mean slope static), and
the chained-protocol per-iteration time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--nnz", type=int, default=16)
    ap.add_argument("--gen", default="banded",
                    choices=["banded", "mesh", "poisson"])
    ap.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    ap.add_argument("--variant", default="auto")
    ap.add_argument("--row-tile", type=int, default=0,
                    help="force a row tile (0 = cost model picks)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random
    from ellspmv_tpu.ops import ell_pallas, plan as plan_mod

    vdt = np.float64 if args.dtype == "f64" else np.float32
    if args.gen == "banded":
        coo = banded_random(args.rows, args.nnz, args.band, seed=0)
    elif args.gen == "mesh":
        from ellspmv_tpu.models.generators import fem_mesh_2d
        coo = fem_mesh_2d(int(round(args.rows ** 0.5)))
    else:
        from ellspmv_tpu.models.generators import poisson2d
        coo = poisson2d(int(round(args.rows ** 0.5)))
    n = coo.num_rows
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=vdt, row_tile=256)
    x = np.random.RandomState(1).rand(n).astype(vdt)

    t0 = time.time()
    if args.variant == "auto":
        kw = {}
        if args.row_tile:
            kw["row_tiles"] = (args.row_tile,)
        dp = ell_pallas.get_plan(ell, **kw)
        if dp is None:
            print("no plan", file=sys.stderr)
            return 1
        plan = dp.plan
    else:
        parts = args.variant.split("-")
        key = parts[0]
        widen = None
        if len(parts) > 1 and parts[1].startswith("w"):
            widen = ell.rowsize * int(parts[1][1:])
        elif len(parts) > 1 and parts[1].startswith("s"):
            widen = int(parts[1][1:])      # absolute slot count
        e2 = ell if key == "rank" else plan_mod.rebucket_slots(
            ell, key=key, widen_to=widen)
        kw = {}
        if args.row_tile:
            kw["row_tiles"] = (args.row_tile,)
        plan = plan_mod.best_plan(e2, value_dtype=vdt, **kw)
        if plan is None:
            print(f"{args.variant}: no plan", file=sys.stderr)
            return 1
        dp = ell_pallas.DevicePlan(e2, plan, dd=(vdt == np.float64))
    plan_s = time.time() - t0

    ks_mean = float(plan.qb[:, 1, :].mean())
    scale = jnp.asarray(1e-6, vdt)

    def make_loop(iters):
        @jax.jit
        def run(x0, dp_):
            def body(_, xk):
                yk = dp_(xk)[:n]
                return yk * scale
            return jax.lax.fori_loop(0, iters, body, x0)
        return run

    def sync(v):
        np.asarray(v.ravel()[:1])

    xj = jnp.asarray(x)
    lo, hi = 2, 10
    run_lo, run_hi = make_loop(lo), make_loop(lo + hi)
    sync(run_lo(xj, dp)); sync(run_hi(xj, dp))
    t = float("inf")
    for _ in range(3):
        t0_ = time.perf_counter(); sync(run_lo(xj, dp))
        t_lo = time.perf_counter() - t0_
        t0_ = time.perf_counter(); sync(run_hi(xj, dp))
        t_hi = time.perf_counter() - t0_
        t = min(t, max((t_hi - t_lo) / hi, 1e-12))
    if t * hi < 0.02:   # rescale for sub-resolution kernels
        hi2 = min(int(0.05 / max(t, 1e-7)), 5000)
        if hi2 > 2 * hi:
            run_hi2 = make_loop(lo + hi2)
            sync(run_hi2(xj, dp))
            t = float("inf")
            for _ in range(3):
                t0_ = time.perf_counter(); sync(run_lo(xj, dp))
                t_lo = time.perf_counter() - t0_
                t0_ = time.perf_counter(); sync(run_hi2(xj, dp))
                t_hi = time.perf_counter() - t0_
                t = min(t, max((t_hi - t_lo) / hi2, 1e-12))
    nnz = ell.num_nonzeros
    print(f"{args.variant:12s} {args.dtype} S={plan.rowsize:3d} G={plan.G:3d} "
          f"KS={plan.KS:3d} ks={ks_mean:5.2f} slope={plan.slope} "
          f"static={plan.static_window} T={plan.num_tiles:4d} "
          f"ablate={os.environ.get('ELLSPMV_TPU_ABLATE', '-') or '-'}: "
          f"{t * 1e3:8.3f} ms  {nnz / t * 1e-9:6.2f} Gnz/s  "
          f"(plan {plan_s:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
