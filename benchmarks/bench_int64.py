"""int64-index hardware row (VERDICT r3 item 8): measure the SpMV cost
delta of 64-bit indices vs 32-bit on the same matrix — the runtime
analogue of rebuilding the reference with IDXTYPEWIDTH=64
(ellspmv.c:112-130, README:25-30).

Design note: the windowed Pallas plan quantizes global column indices to
window-local int8/int16 offsets at plan time (ops/plan.py), so the KERNEL
moves identical bytes for either index width — unlike the reference,
whose ellgemv loads idx_t per nonzero and pays double traffic at 64-bit.
The index width still changes the stored format (and the reference-model
min/max-bytes columns, which count ellsize*sizeof(idx)).

Usage: python benchmarks/bench_int64.py [--nx 1024]
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
    ap.add_argument("--nx", type=int, default=1024)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    coo = poisson2d(args.nx)
    x = np.random.RandomState(0).rand(coo.num_rows)
    want = coo_spmv_numpy(coo, x)

    for width in (32, 64):
        t0 = time.perf_counter()
        ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64,
                           index_dtype=f"int{width}").device_put()
        t_conv = time.perf_counter() - t0
        assert np.asarray(ell.colidx).dtype == np.dtype(f"int{width}")
        res = benchmark_spmv(None, ell, x, repeat=64, warmup=2,
                             protocol="chained")
        got = np.asarray(res.y, np.float64)
        # chained run scales x each iteration; check a fresh single apply
        from ellspmv_tpu.ops import spmv
        y1 = np.asarray(spmv(ell, x), np.float64)
        err = np.max(np.abs(y1 - want)) / max(np.max(np.abs(want)), 1e-300)
        act = res.actual_gb_per_s()
        print(f"int{width}: {res.best * 1e3:.3f} ms/iter, "
              f"{res.gnz_per_s():.2f} Gnz/s, eff {res.min_gb_per_s():.1f} "
              f"GB/s, actual {act and f'{act:.1f}'} GB/s, "
              f"convert {t_conv:.2f} s, oracle err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
