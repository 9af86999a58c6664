"""Config3 (power-law) stream-path benchmark: build + SpMV + oracle.

Usage:  python benchmarks/bench_stream.py [--n 1000000] [--avg 7]
        [--no-oracle] [--no-permute]

Reports conversion time, whether the static router (ops/permute.py)
replaced the level-1 sort, chained per-iteration kernel time, and the
normwise error vs the exact host oracle.
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
    ap.add_argument("--avg", type=int, default=7)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--no-permute", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="also time products / products+route stages")
    ap.add_argument("--uniform", action="store_true",
                    help="uniform-column random matrix instead of "
                         "power-law (no hub rows/columns: the clean "
                         "distribution where the uniform-cell router "
                         "engages at scale)")
    args = ap.parse_args()
    if args.no_permute:
        os.environ["ELLSPMV_TPU_NO_PERMUTE"] = "1"

    import jax
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.formats.stream import stream_from_coo, stream_spmv
    from ellspmv_tpu.models.generators import power_law

    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    t0 = time.perf_counter()
    if args.uniform:
        rng = np.random.RandomState(args.seed)
        nnz = args.n * args.avg
        rows = rng.randint(0, args.n, nnz).astype(np.int32)
        cols_u = rng.randint(0, args.n, nnz).astype(np.int32)
        from ellspmv_tpu.formats.coo import CooMatrix
        coo = CooMatrix(args.n, args.n, rows, cols_u,
                        rng.randn(nnz))
        gen = f"uniform({args.n}, {args.avg})"
    else:
        coo = power_law(args.n, args.avg, seed=args.seed)
        gen = f"power_law({args.n}, {args.avg})"
    print(f"{gen}: {coo.num_nonzeros:,} nnz "
          f"({time.perf_counter() - t0:.2f} s)", flush=True)

    t0 = time.perf_counter()
    strm = stream_from_coo(coo, value_dtype=np.float64)
    t_conv = time.perf_counter() - t0
    perm = strm.ddsum.levels[0].perm
    nchunk = max(len(strm.ddsum.chunk_bases) - 1, 1)
    rdesc = ("OFF (sort)" if perm is None else
             ("CELLS (bpg=%d cell_rows=%d NB=%d)"
              % (perm.bpg, perm.cell_rows, perm.NBi)) if perm.bpg else
             ("ON (HA=%d HB=%d NBi=%d NBo=%d)"
              % (perm.HA, perm.HB, perm.NBi, perm.NBo)))
    print(f"stream_from_coo: {t_conv:.2f} s, "
          f"{len(strm.ddsum.levels)} levels, {nchunk} column chunks, "
          f"prod_len {strm.prod_len:,}, router: {rdesc}", flush=True)
    for li, lv in enumerate(strm.ddsum.levels[1:], 1):
        print(f"  level {li}: in {lv.in_len:,} -> out {lv.out_len:,} "
              f"(multi {lv.multi_len:,}), "
              f"router {'ON' if lv.perm is not None else 'OFF (sort)'}",
              flush=True)
    print(f"  final: "
          f"{'routed' if strm.ddsum.final_perm is not None else 'SORT'}",
          flush=True)
    if strm.prod is not None:
        p = strm.prod.plan
        print(f"product plan: {p.num_tiles} tiles, G={p.G}, KS={p.KS}, "
              f"ks_mean={p.qb[:, 1, :].mean():.2f}, K128={p.K128}, "
              f"slope={p.slope}, static={p.static_window}", flush=True)
        c = strm.prod.cfg
        print(f"device plan: T={c.T}, sub={c.sub}, K128={c.K128}, "
              f"unroll={c.unroll}, nacc={c.nacc}", flush=True)

    x = np.random.RandomState(1).rand(coo.num_columns)
    t0 = time.perf_counter()
    res = benchmark_spmv(None, strm, x, repeat=args.repeat, warmup=2,
                         protocol="chained")
    print(f"bench wall: {time.perf_counter() - t0:.1f} s", flush=True)
    print(f"spmv: {res.best * 1e3:.3f} ms/iter, "
          f"{res.gnz_per_s():.2f} Gnz/s, {res.min_gb_per_s():.1f} GB/s",
          flush=True)

    if not args.no_oracle:
        from ellspmv_tpu.ops.reference import coo_spmv_numpy
        got = np.asarray(stream_spmv(strm, x), np.float64)
        want = coo_spmv_numpy(coo, x)
        err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-300)
        print(f"oracle normwise err: {err:.2e}", flush=True)

    if args.stages and strm.prod is not None and strm.dd:
        # per-stage chained timings: products alone, then + level-1 route
        import jax.numpy as jnp
        from ellspmv_tpu.bench.harness import _sync
        from ellspmv_tpu.ops.permute import apply_permute

        xh = jnp.asarray(x, jnp.float32)
        xl = jnp.asarray(x - np.asarray(xh, np.float64), jnp.float32)
        perm = strm.ddsum.levels[0].perm

        def time_stage(name, step, op=None):
            import jax

            def make(iters):
                @jax.jit
                def run(op, a, b):
                    def body(_, c):
                        return step(op, c[0], c[1])
                    return jax.lax.fori_loop(0, iters, body, (a, b))
                return run
            # median of 3 slopes over a long span: a single +-ms tunnel
            # jitter must not be able to zero the reading (min over
            # short-span slopes once printed a bogus 0.000 ms)
            lo, hi = make(2), make(34)
            if op is None:
                op = strm.prod
            _sync(lo(op, xh, xl)); _sync(hi(op, xh, xl))
            slopes = []
            for _ in range(3):
                t0 = time.perf_counter(); _sync(lo(op, xh, xl))
                tl = time.perf_counter() - t0
                t0 = time.perf_counter(); _sync(hi(op, xh, xl))
                th = time.perf_counter() - t0
                slopes.append(max((th - tl) / 32, 1e-9))
            slopes.sort()
            print(f"stage {name}: {slopes[1] * 1e3:.3f} ms", flush=True)

        def prod_only(op, a, b):
            ph, plo = op.apply_pair(a, b)
            return ph[:a.shape[0]] * 1e-6, plo[:a.shape[0]] * 1e-6

        time_stage("products", prod_only)
        if perm is not None:
            perm_dev = perm.device_put()

            def prod_route(op, a, b):
                # the perm rides as jit ARGUMENTS — closing over it
                # embedded the router maps as HLO constants, whose
                # serialized program blew the remote-compile request
                # limit at 10x scale (HTTP 413, r5_hw_log)
                prod, pm = op
                ph, plo = prod.apply_pair(a, b)
                rh, rl = apply_permute(pm, ph.reshape(-1),
                                       plo.reshape(-1))
                return (rh[:a.shape[0]] * 1e-6, rl[:a.shape[0]] * 1e-6)
            time_stage("products+route", prod_route,
                       op=(strm.prod, perm_dev))
        if perm is not None and not perm.bpg:
            # general route only (the cells route has no take stage)
            from ellspmv_tpu.ops.permute import _w1, _w2

            def _pad_blocks(pm, v):
                v = jnp.pad(v.reshape(-1), (0, pm.n_in - v.size))
                return v.reshape(pm.NBi, 128, 128)

            def prod_w1(op, a, b):
                prod, pm = op
                ph, plo = prod.apply_pair(a, b)
                mids = _w1(pm.l1, pm.q1,
                           _pad_blocks(pm, ph), _pad_blocks(pm, plo),
                           HA=pm.HA, NBi=pm.NBi, n=2)
                return (mids[0].reshape(-1)[:a.shape[0]] * 1e-6,
                        mids[1].reshape(-1)[:a.shape[0]] * 1e-6)
            time_stage("products+w1", prod_w1, op=(strm.prod, perm_dev))

            def prod_w1_take(op, a, b):
                prod, pm = op
                ph, plo = prod.apply_pair(a, b)
                mids = _w1(pm.l1, pm.q1,
                           _pad_blocks(pm, ph), _pad_blocks(pm, plo),
                           HA=pm.HA, NBi=pm.NBi, n=2)
                taken = [jnp.take(m.reshape(pm.NBi * pm.HA * 128, 128),
                                  pm.gsrc, axis=0) for m in mids]
                return (taken[0].reshape(-1)[:a.shape[0]] * 1e-6,
                        taken[1].reshape(-1)[:a.shape[0]] * 1e-6)
            time_stage("products+w1+take", prod_w1_take,
                       op=(strm.prod, perm_dev))


if __name__ == "__main__":
    main()
