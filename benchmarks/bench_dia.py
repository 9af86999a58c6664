"""DIA-vs-ELL on the Poisson stencil (BASELINE config1) — hardware.

Usage: python benchmarks/bench_dia.py [--nx 1024]
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--repeat", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.ops import dia_pallas
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    print(f"platform: {jax.devices()[0].device_kind}", flush=True)
    coo = poisson2d(args.nx)
    n = coo.num_rows
    x = np.random.RandomState(1).rand(n)
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)

    for dt in (np.float64, np.float32):
        dia = dia_from_coo(coo, value_dtype=dt).device_put()
        label = np.dtype(dt).name
        print(f"dia pallas supported ({label}): "
              f"{dia_pallas.supported(dia)}", flush=True)
        res = benchmark_spmv(None, dia, x, repeat=args.repeat, warmup=2,
                             protocol="chained")
        from ellspmv_tpu.ops import spmv as _spmv
        got = np.asarray(_spmv(dia, x), np.float64)
        err = np.max(np.abs(got - want)) / scale
        print(f"DIA {label}: {res.best * 1e3:.4f} ms, "
              f"{res.gnz_per_s():.2f} Gnz/s, {res.min_gb_per_s():.1f} GB/s"
              f" ({100 * res.roofline_fraction():.1f}% roof), err {err:.1e}",
              flush=True)

        ell = ell_from_coo(coo, sort_rows=True,
                           value_dtype=dt).device_put()
        res = benchmark_spmv(None, ell, x, repeat=args.repeat, warmup=2,
                             protocol="chained")
        print(f"ELL {label}: {res.best * 1e3:.4f} ms, "
              f"{res.gnz_per_s():.2f} Gnz/s, {res.min_gb_per_s():.1f} GB/s"
              f" ({100 * res.roofline_fraction():.1f}% roof)", flush=True)


if __name__ == "__main__":
    main()
