"""Hardware comparison for the dense-rows class (VERDICT r2 item 8):
measure SELL (length-sort + band-aligned long-row split), stream, and the
auto chooser's pick on the same matrix, chained protocol, real TPU.

Usage: python benchmarks/dense_rows_compare.py [--n 1000000] [--dense 16]
       [--dense-nnz 125000] [--base 8]

The chooser's price competition (formats/auto.py) is validated or refuted
by these numbers; whichever format measures fastest is what auto must
pick at this scale.
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dense", type=int, default=16)
    ap.add_argument("--dense-nnz", type=int, default=125_000)
    ap.add_argument("--base", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.sell import sell_from_coo
    from ellspmv_tpu.formats.stream import stream_from_coo
    from ellspmv_tpu.models.generators import dense_rows
    from ellspmv_tpu.ops.reference import coo_spmv_numpy
    from ellspmv_tpu.ops import spmv

    coo = dense_rows(args.n, args.base, num_dense=args.dense,
                     dense_nnz=args.dense_nnz, seed=0)
    print(f"dense_rows: {coo.num_rows:,} rows, {coo.num_nonzeros:,} nnz",
          flush=True)
    x = np.random.RandomState(1).rand(coo.num_columns)
    want = coo_spmv_numpy(coo, x)
    scale = max(float(np.max(np.abs(want))), 1.0)

    def run(name, build):
        t0 = time.time()
        mat = build()
        t_conv = time.time() - t0
        mat = mat.device_put()
        got = np.asarray(spmv(mat, x), np.float64)
        err = float(np.max(np.abs(got - want)) / scale)
        res = benchmark_spmv(None, mat, x, repeat=8, warmup=2,
                             protocol="chained")
        extra = getattr(mat, "_auto_reason", "")
        print(f"{name:28s} {res.best * 1e3:9.3f} ms  "
              f"{res.gnz_per_s():7.3f} Gnz/s  conv {t_conv:6.1f} s  "
              f"err {err:.2e}  {extra[:80]}", flush=True)
        return res.best

    run("sell (length-sort + split)",
        lambda: sell_from_coo(coo, sort_rows=True, length_sort=True,
                              value_dtype=np.float64))
    run("stream",
        lambda: stream_from_coo(coo, value_dtype=np.float64))
    run("auto",
        lambda: auto_from_coo(coo, sort_rows=True, value_dtype=np.float64))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
