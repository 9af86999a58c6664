"""Headline benchmark: fp64 ELLPACK SpMV effective bandwidth on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The config mirrors the reference's published headline (README:130-146):
Lynx68_reordered.mtx is an RCM-reordered unstructured-FEM mesh matrix
(6.8M rows, ~17 nnz/row); the default matrix here is `fem_mesh_2d` — a
jittered-mesh FEM matrix in banded (RCM-like) node order with variable
row lengths (~13-21 nnz/row), the faithful synthetic stand-in (BASELINE
configs[2]) — at 2.07M rows / 32.3M nnz, ELLPACK, fp64 values + int32
column indices, best-of-repeat SpMV timing, effective bandwidth by the
reference's min-bytes model (ellspmv.c:1858). Baseline: the reference's
148 GB/s on 2x Xeon Gold 6130 (32 threads, AVX-512).

`BENCH_GEN=banded` instead benchmarks a uniform-random banded matrix
(16 nnz/row, band 512) — the adversarial no-local-smoothness case where
per-slot gather windows are order-statistic-tail bound (see BENCH_NOTES).

Timing uses the chained protocol (serial-dependency loop inside one jit,
slope of two loop lengths) so remote-dispatch overhead does not count.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

REFERENCE_GBPS = 148.0    # README:135-144, best-iteration effective GB/s

N_ROWS = int(os.environ.get("BENCH_ROWS", 2_073_600))
GEN = os.environ.get("BENCH_GEN", "mesh")
NNZ_PER_ROW = 16          # banded config only
BANDWIDTH = int(os.environ.get("BENCH_BAND", 512))


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random, fem_mesh_2d
    from ellspmv_tpu.ops import spmv

    if GEN == "mesh":
        coo = fem_mesh_2d(int(round(N_ROWS ** 0.5)))
    else:
        coo = banded_random(N_ROWS, NNZ_PER_ROW, BANDWIDTH, seed=0)
    n = coo.num_rows
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64,
                       row_tile=256).device_put()
    x = np.random.RandomState(1).rand(n)

    res = benchmark_spmv(None, ell, x, repeat=10, warmup=2,
                         protocol="chained")

    # correctness spot check against the host oracle
    from ellspmv_tpu.ops.reference import ell_spmv_numpy
    idx = np.random.RandomState(2).choice(n, 1000, replace=False)
    want = ell_spmv_numpy(ell, x)
    # chained protocol accumulates several iterations; re-run one clean step
    y1 = np.asarray(spmv(ell, x, backend="auto"), np.float64)
    rel = np.max(np.abs(y1[idx] - want[idx])
                 / np.maximum(np.abs(want[idx]), 1e-300))
    if rel > 1e-11:
        print(f"CORRECTNESS FAILURE: max rel err {rel}", file=sys.stderr)
        return 1

    gbps = res.min_gb_per_s()
    print(json.dumps({
        "metric": "ell_spmv_fp64_effective_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / REFERENCE_GBPS, 3),
    }))
    print(f"  config: {GEN}, {n} rows, {coo.num_nonzeros} nnz "
          f"(rowsize {ell.rowsize}), fp64+int32, "
          f"{res.best * 1e3:.3f} ms/iter, "
          f"{res.gnz_per_s():.2f} Gnz/s, {res.gflop_per_s():.2f} Gflop/s, "
          f"roofline {100 * res.roofline_fraction():.1f}% "
          f"(max rel err {rel:.2e})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
