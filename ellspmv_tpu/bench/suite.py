"""Benchmark suite over the BASELINE.json configs.

Run: ``python -m ellspmv_tpu.bench.suite [--quick] [--json]``

Covers the five driver configs (BASELINE.json):
  0. bundled-test.mtx-equivalent golden check (ELL vs CSR vs dense)
  1. 2-D 5-point Poisson (ideal ELL; also the DIA gather-free path)
  2. banded FEM stand-in (variable rows, ELL vs CSR crossover)
  3. power-law (sliced-ELL + CSR tail hybrid vs padded ELL)
  4. row-sharded SpMV + CG loop over the device mesh

Each row reports the reference metric set (Gnz/s, Gflop/s, min/max GB/s,
roofline fraction — ellspmv.c:1868-1875 formulas).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _bench(matrix, x, repeat, protocol="chained"):
    from ellspmv_tpu.bench.harness import benchmark_spmv

    # spmv_fn=None -> library dispatch in traceable form (Pallas kernels
    # ride as jit arguments inside the timing loop)
    return benchmark_spmv(None, matrix, x,
                          repeat=repeat, warmup=2, protocol=protocol)


def run_suite(quick: bool = False, as_json: bool = False,
              stream=sys.stderr) -> list[dict]:
    import jax

    jax.config.update("jax_enable_x64", True)

    from ellspmv_tpu.formats.csr import csr_from_coo
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.formats.sell import sell_from_coo
    from ellspmv_tpu.models.generators import (banded_random, poisson2d,
                                               power_law)
    from ellspmv_tpu.models.solvers import cg
    from ellspmv_tpu.ops import spmv
    
    scale = 8 if quick else 1
    results = []

    def record(name, res, note=""):
        act = res.actual_gb_per_s()
        row = {
            "config": name,
            "best_s": res.best,
            "gnz_per_s": res.gnz_per_s(),
            "gflop_per_s": res.gflop_per_s(),
            "min_gb_per_s": res.min_gb_per_s(),
            "max_gb_per_s": res.max_gb_per_s(),
            "roofline_effective": res.roofline_fraction(),
            # physical columns (bench/traffic.py): the effective roofline
            # is the reference min-bytes MODEL and can exceed 1.0 for
            # formats that store less than ELLPACK; this one cannot
            "actual_bytes": res.actual_bytes,
            "actual_gb_per_s": act,
            "roofline_physical": res.physical_roofline(),
            "note": note,
        }
        results.append(row)
        phys = "    --     " if act is None else \
            f"{act:6.1f} GB/s ({100 * res.physical_roofline():5.1f}%)"
        stream.write(
            f"{name:34s} {res.best * 1e3:9.3f} ms  "
            f"{res.gnz_per_s():7.2f} Gnz/s  eff {res.min_gb_per_s():7.1f} "
            f"GB/s ({100 * res.roofline_fraction():5.1f}%)  phys {phys}  "
            f"{note}\n")

    # --- measured vs nominal HBM peak (VERDICT r2 item 6) -----------------
    peak_row = None
    if jax.devices()[0].platform == "tpu":
        from ellspmv_tpu.bench.stream import measure_peak_bandwidth
        from ellspmv_tpu.config import hbm_peak_bytes_per_s
        measured = measure_peak_bandwidth(log=stream)
        nominal = hbm_peak_bytes_per_s()
        stream.write(f"{'hbm peak measured/nominal':34s} "
                     f"{measured / 1e9:7.1f} / {nominal / 1e9:.1f} GB/s "
                     f"({100 * measured / nominal:.1f}%)\n")
        peak_row = {"config": "hbm_peak",
                    "measured_gb_per_s": measured / 1e9,
                    "triad_gb_per_s": measured / 1e9,
                    "source": "triad",
                    "nominal_gb_per_s": nominal / 1e9}
        results.append(peak_row)

    # --- config 0: golden correctness -------------------------------------
    rows = np.array([0, 0, 1, 2, 3, 3, 3, 3, 3], np.int32)
    cols = np.array([0, 3, 1, 2, 0, 1, 2, 3, 4], np.int32)
    vals = np.array([1.5, 1.5, 1.0, 3.0, 2.0, 1.0, 1.0, 1.0, 1.0])
    from ellspmv_tpu.formats.coo import CooMatrix
    coo0 = CooMatrix(4, 5, rows, cols, vals)
    x0 = np.ones(5)
    ye = np.asarray(spmv(ell_from_coo(coo0).device_put(), x0))
    yc = np.asarray(spmv(csr_from_coo(coo0).device_put(), x0))
    ok = (np.allclose(ye, [3, 1, 3, 6], rtol=1e-13)
          and np.allclose(yc, [3, 1, 3, 6], rtol=1e-13))
    stream.write(f"{'config0 golden test.mtx':34s} "
                 f"{'PASS' if ok else 'FAIL'}  y={ye.tolist()}\n")
    results.append({"config": "config0 golden", "pass": bool(ok)})

    # --- config 1: Poisson stencil ---------------------------------------
    nx = 1024 // (2 if quick else 1)
    coo = poisson2d(nx)
    x = np.random.RandomState(0).rand(coo.num_rows)
    ell = ell_from_coo(coo, sort_rows=True,
                       value_dtype=np.float64).device_put()
    record(f"config1 poisson {nx}x{nx} ELL f64", _bench(ell, x, 128))
    dia = dia_from_coo(coo, value_dtype=np.float64).device_put()
    # DIA is so fast the slope needs many iterations to resolve
    record(f"config1 poisson {nx}x{nx} DIA f64", _bench(dia, x, 256),
           note="gather-free")
    # IDXTYPEWIDTH=64 analogue (ellspmv.c:112-130, README:25-30): the
    # windowed plan quantizes columns to window-local int8/int16 offsets,
    # so the kernel moves identical bytes at either index width — unlike
    # the reference, whose ellgemv loads idx_t per nonzero (measured
    # identical 0.099 ms at both widths, round 4)
    ell64 = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64,
                         index_dtype="int64").device_put()
    record(f"config1 poisson {nx}x{nx} ELL f64 idx64",
           _bench(ell64, x, 128), note="--index-width=64")

    # --- headline: FEM mesh, auto-chosen flagship format ------------------
    # bench.py's config (the reference's Lynx68-class matrix stand-in,
    # BASELINE configs[2]); metrics on the reference's ELLPACK min-bytes
    # model (ellspmv.c:1858) so the row is comparable to its 148 GB/s
    from ellspmv_tpu.bench.harness import SpmvMetrics
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.models.generators import fem_mesh_2d
    nmesh = int(round((2_073_600 // scale) ** 0.5))
    coo = fem_mesh_2d(nmesh)
    x = np.random.RandomState(1).rand(coo.num_rows)
    rowsize = int(np.bincount(np.asarray(coo.rowidx)).max())
    ellsize = coo.num_rows * rowsize
    mmetrics = SpmvMetrics(
        num_nonzeros=coo.num_nonzeros, num_flops=2 * ellsize,
        min_bytes=coo.num_rows * 8 + coo.num_columns * 8
        + ellsize * (8 + 4),
        max_bytes=coo.num_rows * 8 + ellsize * (8 + 4 + 8))
    mat = auto_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    chosen = getattr(mat, "_auto_choice", type(mat).__name__.lower())
    mat = mat.device_put()
    from ellspmv_tpu.bench.harness import benchmark_spmv as _bspmv
    record(f"headline fem-mesh {nmesh}^2 auto f64",
           _bspmv(None, mat, x, repeat=64, warmup=2, protocol="chained",
                  metrics=mmetrics),
           note=f"auto={chosen} (ELLPACK min-bytes basis)")

    # --- config 2: banded FEM stand-in -----------------------------------
    n = 2_000_000 // scale
    coo = banded_random(n, 16, 512, seed=0)
    x = np.random.RandomState(1).rand(n)
    ell = ell_from_coo(coo, sort_rows=True,
                       value_dtype=np.float64).device_put()
    record("config2 banded 16/row ELL f64", _bench(ell, x, 32))
    csr = csr_from_coo(coo, sort_rows=True,
                       value_dtype=np.float64).device_put()
    record("config2 banded 16/row CSR f64", _bench(csr, x, 32),
           note="segment-sum")

    # --- config 3: power-law ---------------------------------------------
    from ellspmv_tpu.formats.stream import stream_from_coo, stream_spmv
    n = 1_000_000 // scale
    coo = power_law(n, 8, seed=0)
    x = np.random.RandomState(2).rand(n)
    # padded-ELL size computed analytically: materializing rows x max-nnz
    # is exactly the blowup this config exists to avoid (373 GiB at full
    # size)
    ellsize_pad = n * int(np.bincount(coo.rowidx, minlength=n).max())
    t0 = time.perf_counter()
    strm = stream_from_coo(coo, value_dtype=np.float64)
    t_conv = time.perf_counter() - t0
    stream.write(f"{'config3 stream_from_coo':34s} {t_conv:9.3f} s host "
                 f"plan build ({coo.num_nonzeros:,} nnz)\n")
    results.append({"config": "config3 stream_from_coo",
                    "convert_s": t_conv, "nnz": int(coo.num_nonzeros)})
    note = (f"{strm.worksize:,} entries (padding-free) vs padded ELL "
            f"{ellsize_pad:,} slots, {len(strm.ddsum.levels)} sum "
            "levels")
    record("config3 power-law stream f64", _bench(strm, x, 3), note=note)
    # correctness spot check against the exact host oracle
    from ellspmv_tpu.ops.reference import coo_spmv_numpy
    got = np.asarray(stream_spmv(strm, x), np.float64)
    want = coo_spmv_numpy(coo, x)
    normerr = (np.max(np.abs(got - want))
               / max(np.max(np.abs(want)), 1e-300))
    stream.write(f"{'config3 stream oracle':34s} normwise err "
                 f"{normerr:.2e}\n")
    results.append({"config": "config3 stream oracle",
                    "normwise_err": float(normerr)})
    from ellspmv_tpu.formats.hybrid import hybrid_from_coo
    hyb = hybrid_from_coo(coo, value_dtype=np.float64).device_put()
    record("config3 power-law hub-hybrid f64", _bench(hyb, x, 3),
           note=f"hub {100 * hyb.hub_nnz_fraction:.0f}% (windowed-scan "
                "comparison)")

    # --- config3 at 10x scale (VERDICT r4 item 1): column-chunked streams
    # must keep the per-nnz rate within ~30% of the 1M-config floor
    # instead of degrading with ncols (BASELINE.md names 100M+ rows as
    # the scale axis; the reference's CPU gathers are scale-flat,
    # csrspmv.c:1590-1592)
    if not quick:
        n10 = 10_000_000
        coo10 = power_law(n10, 7, seed=0)
        x10 = np.random.RandomState(4).rand(n10)
        t0 = time.perf_counter()
        strm10 = stream_from_coo(coo10, value_dtype=np.float64)
        t_conv10 = time.perf_counter() - t0
        nch = max(len(strm10.ddsum.chunk_bases) - 1, 1)
        stream.write(f"{'config3-10x stream_from_coo':34s} "
                     f"{t_conv10:9.3f} s host plan build "
                     f"({coo10.num_nonzeros:,} nnz, {nch} column "
                     "chunks)\n")
        results.append({"config": "config3-10x stream_from_coo",
                        "convert_s": t_conv10,
                        "nnz": int(coo10.num_nonzeros),
                        "column_chunks": nch})
        record("config3-10x power-law stream f64", _bench(strm10, x10, 2),
               note=f"{nch} column chunks, "
                    f"{len(strm10.ddsum.levels)} sum levels")
        got10 = np.asarray(stream_spmv(strm10, x10), np.float64)
        want10 = coo_spmv_numpy(coo10, x10)
        err10 = (np.max(np.abs(got10 - want10))
                 / max(np.max(np.abs(want10)), 1e-300))
        stream.write(f"{'config3-10x stream oracle':34s} normwise err "
                     f"{err10:.2e}\n")
        results.append({"config": "config3-10x stream oracle",
                        "normwise_err": float(err10)})
        del strm10, coo10, got10, want10

    # --- dense-rows class: few long random rows over a local bulk --------
    # (constraint/boundary rows — VERDICT r2 item 8). auto must pick the
    # measured-fastest: the routed stream (6.80 ms vs SELL split 30.6 ms
    # at this scale, v5e round 3).
    from ellspmv_tpu.formats.auto import auto_from_coo as _auto
    from ellspmv_tpu.models.generators import dense_rows
    n = 1_000_000 // scale
    coo = dense_rows(n, 8, num_dense=16, dense_nnz=n // 8, seed=0)
    x = np.random.RandomState(3).rand(n)
    mat = _auto(coo, sort_rows=True, value_dtype=np.float64)
    chosen = getattr(mat, "_auto_choice", type(mat).__name__.lower())
    mat = mat.device_put()
    record("config-dense-rows auto f64", _bench(mat, x, 8),
           note=f"auto={chosen}")
    got = np.asarray(spmv(mat, x), np.float64)
    want = coo_spmv_numpy(coo, x)
    derr = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-300)
    stream.write(f"{'config-dense-rows oracle':34s} normwise err "
                 f"{derr:.2e}\n")
    results.append({"config": "config-dense-rows oracle",
                    "normwise_err": float(derr)})

    # --- config 4: sharded SpMV + CG -------------------------------------
    import jax as _jax
    ndev = len(_jax.devices())
    if ndev > 1:
        from ellspmv_tpu.parallel.spmv import shard_matrix, sharded_spmv_fn
        coo = poisson2d(128 if quick else 256)
        ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
        sm = shard_matrix(ell, ndev)
        fn = sharded_spmv_fn(sm)
        from ellspmv_tpu.bench.harness import benchmark_spmv
        x = np.ones(sm.num_columns)
        res = benchmark_spmv(fn, sm, x, repeat=3, warmup=1,
                             metrics_matrix=ell)
        record(f"config4 sharded x{ndev} SpMV f64", res)
        t0 = time.perf_counter()
        sol = cg(lambda v: fn(sm, v), jax.numpy.ones(sm.num_rows),
                 tol=1e-8, maxiter=1500)
        stream.write(f"{'config4 CG solve':34s} {int(sol.iterations)} iters,"
                     f" residual {float(sol.residual_norm):.2e}, "
                     f"{time.perf_counter() - t0:.1f} s\n")
        results.append({"config": "config4 cg",
                        "iterations": int(sol.iterations),
                        "residual": float(sol.residual_norm)})
    else:
        stream.write("config4 skipped (single device; driver validates via "
                     "dryrun_multichip)\n")

    # --- HBM-peak self-consistency (VERDICT r3 item 3) --------------------
    # A kernel cannot physically exceed the chip's peak: if the best
    # same-run actual-traffic rate beats the triad (the tunnel degrades the
    # triad far more often than a chained kernel slope), retry the triad
    # once and otherwise report the kernel-derived figure, flagged. No
    # committed artifact may carry a kernel row above its own peak row.
    if peak_row is not None:
        best_act = max((r.get("actual_gb_per_s") or 0.0 for r in results
                        if isinstance(r, dict)), default=0.0)
        if best_act > peak_row["measured_gb_per_s"]:
            retry = measure_peak_bandwidth(log=stream) / 1e9
            triad = max(peak_row["triad_gb_per_s"], retry)
            peak_row["triad_gb_per_s"] = triad
            if best_act > triad:
                # the directly measured triad stays in measured_gb_per_s;
                # the kernel-derived floor (computed from the plan-based
                # traffic model, so any traffic overcount would inflate
                # it) rides in its own clearly-sourced field
                peak_row["measured_gb_per_s"] = triad
                peak_row["kernel_derived_gb_per_s"] = best_act
                peak_row["source"] = "triad-degraded; kernel floor flagged"
                stream.write(
                    f"{'hbm peak (kernel-derived)':34s} {best_act:7.1f} "
                    f"GB/s (triad read {triad:.1f} GB/s below the best "
                    "kernel row; kernel-derived floor reported beside "
                    "the triad, not in place of it)\n")
            else:
                peak_row["measured_gb_per_s"] = triad
                peak_row["source"] = "triad-retry"
                stream.write(f"{'hbm peak (triad retry)':34s} "
                             f"{triad:7.1f} GB/s\n")

    if as_json:
        print(json.dumps(results, indent=1))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    run_suite(quick=args.quick, as_json=args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
