"""Cycle-ledger for the windowed ELL kernel (VERDICT r3 item 2).

Builds the device plan for a config on the host, enumerates the exact
per-SpMV op counts the kernel executes (gathers, select-cascade steps,
dd-FMA chains, window DMA bytes), and prices them with the measured
per-op rates from benchmarks/microbench_ops.py. If the priced floor
matches the observed kernel time, the kernel is at the v5e issue-rate
ceiling and the <80%-of-HBM physical roofline on gather-bound configs is
a hardware property, not a scheduling gap.

Usage: python benchmarks/ell_ledger.py [--gen mesh|banded|poisson]
         [--gather-ns X --select-ns Y --ddfma-ns Z --slice-ns W]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", default="mesh",
                    choices=["mesh", "banded", "poisson"])
    # measured ns/op on (8,128) operands (microbench_ops.py); defaults are
    # placeholders — pass the measured values for a committed ledger
    ap.add_argument("--gather-ns", type=float, default=None)
    ap.add_argument("--select-ns", type=float, default=None)
    ap.add_argument("--ddfma-ns", type=float, default=None)
    ap.add_argument("--slice-ns", type=float, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import (banded_random, fem_mesh_2d,
                                               poisson2d)

    if args.gen == "mesh":
        coo = fem_mesh_2d(int(round(2_073_600 ** 0.5)))
    elif args.gen == "banded":
        coo = banded_random(2_000_000, 16, 512, seed=0)
    else:
        coo = poisson2d(1024)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)

    os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"] = "1"
    from ellspmv_tpu.ops import plan as plan_mod
    from ellspmv_tpu.ops.ell_pallas import (_SLOT_WORK_UNROLL,
                                            _SLOT_UNROLL_MAX, get_plan)
    dp = get_plan(ell)
    if dp is None:
        print("no plan")
        return
    c = dp.cfg
    qb = np.asarray(dp.qb)              # (T, 2, sub*S)
    ks = qb[:, 1, :]                    # per (step, subslot) scan trips
    T, S, sub = c.T, c.S, c.sub
    unrolled = c.unroll and (S <= _SLOT_UNROLL_MAX
                             or S * max(c.KS, 1) <= _SLOT_WORK_UNROLL)
    if c.ks_slot is not None:
        # static unroll runs the SLOT's tile-max trips on every tile
        trips_per_slot = np.asarray(c.ks_slot, np.int64)   # (S,)
        total_trips = int(trips_per_slot.sum()) * T * sub
    else:
        total_trips = int(ks.sum())
    n_slot_steps = T * sub * S
    dd = 2 if c.dd else 1
    # per scan step: one gather per payload; cascade: (trip-1) cmps +
    # dd*(trip-1) selects per slot; trip==1 slots skip the cascade
    n_gather = dd * total_trips
    if c.ks_slot is not None:
        casc = np.maximum(trips_per_slot - 1, 0)
        n_select = dd * int(casc.sum()) * T * sub
        n_cmp = int(casc.sum()) * T * sub
    else:
        n_select = dd * max(total_trips - n_slot_steps, 0)
        n_cmp = max(total_trips - n_slot_steps, 0)
    n_ddfma = n_slot_steps if c.dd else 0
    n_slices = total_trips              # window sub-slices feeding gathers

    from ellspmv_tpu.bench.traffic import estimate_actual_bytes
    bytes_per_iter = estimate_actual_bytes(ell)

    print(f"gen={args.gen} rows={ell.num_rows:,} nnz={ell.num_nonzeros:,} "
          f"S={S} G={c.G} sub={sub} T={T} KS={c.KS} "
          f"unrolled={unrolled} ks_slot={c.ks_slot}")
    print(f"slot steps {n_slot_steps:,}  scan trips {total_trips:,} "
          f"(mean {total_trips / max(n_slot_steps, 1):.2f}/slot)")
    print(f"ops/iter: gather {n_gather:,}  select {n_select:,} "
          f"cmp {n_cmp:,}  dd_fma {n_ddfma:,}  slice {n_slices:,}")
    if bytes_per_iter is None:
        print("plan bytes/iter: unavailable (no cached device plan)")
        return
    print(f"plan bytes/iter: {bytes_per_iter / 1e6:.1f} MB"
          f" -> HBM floor at 819 GB/s: "
          f"{bytes_per_iter / 819e9 * 1e3:.3f} ms")
    if args.gather_ns is not None:
        compute_ms = (n_gather * args.gather_ns
                      + n_select * (args.select_ns or 0)
                      + n_cmp * (args.select_ns or 0) / 2
                      + n_ddfma * (args.ddfma_ns or 0)
                      + n_slices * (args.slice_ns or 0)) * 1e-6
        print(f"priced compute floor: {compute_ms:.3f} ms "
              f"(vs HBM floor {bytes_per_iter / 819e9 * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
