"""Probe round 2: sublane-gather formulations + route-kernel timings.

If Mosaic supports an arbitrary-index SUBLANE gather
(out[r,l] = op[idx[r,l], l]) the within-supertile permutation becomes
lane-gather . sublane-gather . lane-gather (3 ops, one (H,128) VMEM tile,
4 B/element control) with no transposes or block decomposition at all.

Run on the real TPU:  python benchmarks/probe_perm2.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def report(name, ok, detail=""):
    print(f"{name:<52s} {'OK ' if ok else 'FAIL'} {detail}", flush=True)


def probe(name):
    def deco(fn):
        def run():
            try:
                ok, detail = fn()
            except Exception as e:
                ok, detail = False, f"{type(e).__name__}: {str(e)[:200]}"
            report(name, ok, detail)
            return ok
        return run
    return deco


def _sub_gather(op, ridx):
    """out[r, l] = op[ridx[r, l], l] — dual of the lane gather."""
    g = ridx[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _lane_gather(op, lane):
    g = lane[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _try_sub_gather(H):
    rng = np.random.RandomState(0)
    x = rng.randn(H, 128).astype(np.float32)
    idx = rng.randint(0, H, (H, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = _sub_gather(x_ref[:], i_ref[:])

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(x), jnp.asarray(idx))
    want = np.take_along_axis(x, idx, axis=0)
    return bool(np.array_equal(np.asarray(got), want)), ""


@probe("S1 sublane gather arbitrary idx (128,128)")
def s1():
    return _try_sub_gather(128)


@probe("S2 sublane gather arbitrary idx (2048,128)")
def s2():
    return _try_sub_gather(2048)


@probe("S3 lane gather on tall operand (2048,128)")
def s3():
    rng = np.random.RandomState(1)
    x = rng.randn(2048, 128).astype(np.float32)
    idx = rng.randint(0, 128, (2048, 128)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = _lane_gather(x_ref[:], i_ref[:])

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((2048, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(x), jnp.asarray(idx))
    want = np.take_along_axis(x, idx, axis=1)
    return bool(np.array_equal(np.asarray(got), want)), ""


def _time_jit(fn, *args, iters=2):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@probe("T1 XLA row-take 8M f32 x2 payloads (granule=128)")
def t1():
    rng = np.random.RandomState(2)
    NG = 65536                          # 8M elements as (NG, 128)
    a = jnp.asarray(rng.randn(NG, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(NG, 128).astype(np.float32))
    idx = jnp.asarray(rng.permutation(NG).astype(np.int32))

    @jax.jit
    def chain(a, b, idx, iters):
        def body(_, c):
            a_, b_ = c
            return jnp.take(a_, idx, axis=0), jnp.take(b_, idx, axis=0)
        return jax.lax.fori_loop(0, iters, body, (a, b))

    t4 = _time_jit(chain, a, b, idx, 4)
    t12 = _time_jit(chain, a, b, idx, 12)
    per = (t12 - t4) / 8
    gbps = 2 * 2 * NG * 128 * 4 / per / 1e9
    return True, f"{per * 1e3:.3f} ms/iter ({gbps:.0f} GB/s r+w)"


def _route_gather_kernel(H, T, payloads=2):
    """Per grid step: 3 chained gathers (lane, sublane, lane) on an
    (H,128) tile — the candidate universal route pass."""
    def k(*refs):
        i1_ref, i2_ref, i3_ref = refs[:3]
        ins = refs[3:3 + payloads]
        outs = refs[3 + payloads:3 + 2 * payloads]
        l1 = i1_ref[:].astype(jnp.int32)
        r2 = i2_ref[:].astype(jnp.int32)
        l3 = i3_ref[:].astype(jnp.int32)
        for i in range(payloads):
            v = _lane_gather(ins[i][:], l1)
            v = _sub_gather(v, r2)
            outs[i][:] = _lane_gather(v, l3)

    specs = dict(
        in_specs=[pl.BlockSpec((H, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * (3 + payloads),
        out_specs=[pl.BlockSpec((H, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * payloads,
        grid=(T,))

    def call(i1, i2, i3, *vals):
        return pl.pallas_call(
            k, **specs,
            out_shape=[jax.ShapeDtypeStruct((T * H, 128), jnp.float32)
                       for _ in range(payloads)])(i1, i2, i3, *vals)

    run = jax.jit(call)

    @jax.jit
    def chain(i1, i2, i3, iters, *vals):
        def body(_, c):
            return tuple(call(i1, i2, i3, *c))
        return jax.lax.fori_loop(0, iters, body, tuple(vals))

    return run, chain


@probe("T2 route kernel 3-gather (2048,128)x32 tiles, 2 payl")
def t2():
    H, T = 2048, 32                     # 8M elements total
    rng = np.random.RandomState(3)
    i1 = jnp.asarray(rng.randint(0, 128, (T * H, 128)).astype(np.int8))
    i2 = jnp.asarray(rng.randint(0, H, (T * H, 128)).astype(np.int16))
    i3 = jnp.asarray(rng.randint(0, 128, (T * H, 128)).astype(np.int8))
    a = jnp.asarray(rng.randn(T * H, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(T * H, 128).astype(np.float32))
    run, chain = _route_gather_kernel(H, T)

    # correctness on the first tile vs numpy
    i1n, i2n, i3n = (np.asarray(i1, np.int64), np.asarray(i2, np.int64),
                     np.asarray(i3, np.int64))
    an = np.asarray(a)
    out = run(i1, i2, i3, a, b)
    v = np.take_along_axis(an[:H], i1n[:H], axis=1)
    v = np.take_along_axis(v, i2n[:H], axis=0)
    want = np.take_along_axis(v, i3n[:H], axis=1)
    ok = np.array_equal(np.asarray(out[0])[:H], want)

    t4 = _time_jit(chain, i1, i2, i3, 4, a, b)
    t12 = _time_jit(chain, i1, i2, i3, 12, a, b)
    per = (t12 - t4) / 8
    nbytes = (T * H * 128) * (4 * 2 * 2 + 4)   # 2 payl r+w, 4B control
    return bool(ok), (f"{per * 1e3:.3f} ms/iter "
                      f"({nbytes / per / 1e9:.0f} GB/s incl control)")


def main():
    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    oks = []
    for p in (s1, s2, s3, t1, t2):
        oks.append(p())
    print(f"{sum(oks)}/{len(oks)} probes passed")


if __name__ == "__main__":
    main()
