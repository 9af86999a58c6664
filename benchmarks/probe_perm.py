"""Hardware probes for the static-permutation (sort-free stream) pipeline.

The round-2 config3 redesign routes every product to its statically known
destination with dense passes instead of runtime `lax.sort`s. That needs a
handful of Mosaic primitives whose support/perf must be verified on the
real TPU before building:

  P1  (128,128) f32 transpose inside a kernel        (within-column perms)
  P2  per-sublane lane gather with per-row indices   (within-row perms)
  P3  int8 index streams widened in-kernel           (compact routing info)
  P4  small static-offset DMA granules (2-32 KB)     (chunk transposes)
  P5  sublane roll across a multi-vreg array         (fallback for P1)
  P6  shared-index sublane gather x[idx, :]          (would simplify P1)

Run on the real TPU:  python benchmarks/probe_perm.py
"""

import functools
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
    print(f"{name:<46s} {'OK ' if ok else 'FAIL'} {detail}", flush=True)


def probe(name):
    def deco(fn):
        def run():
            try:
                ok, detail = fn()
            except Exception as e:
                ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
            report(name, ok, detail)
            return ok
        run.__name__ = fn.__name__
        return run
    return deco


@probe("P0 trivial jit (worker health)")
def p0():
    out = jax.jit(lambda v: v * 2)(jnp.ones((8, 128), jnp.float32))
    sync(out)
    return bool(np.asarray(out)[0, 0] == 2.0), ""


@probe("P1 in-kernel (128,128) transpose")
def p1():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    x = np.arange(128 * 128, dtype=np.float32).reshape(128, 128)
    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(x))
    return bool(np.array_equal(np.asarray(got), x.T)), ""


@probe("P1b in-kernel (256,128)->(128,256) transpose")
def p1b():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    x = np.arange(256 * 128, dtype=np.float32).reshape(256, 128)
    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(x))
    return bool(np.array_equal(np.asarray(got), x.T)), ""


def _lane_gather(op, lane):
    g = lane[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


@probe("P2 per-row lane gather (128,128), random perms")
def p2():
    rng = np.random.RandomState(0)
    x = rng.randn(128, 128).astype(np.float32)
    idx = np.stack([rng.permutation(128) for _ in range(128)]).astype(
        np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = _lane_gather(x_ref[:], i_ref[:])

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(x), jnp.asarray(idx))
    want = np.take_along_axis(x, idx, axis=1)
    return bool(np.array_equal(np.asarray(got), want)), ""


@probe("P3 int8 stream widened in-kernel")
def p3():
    rng = np.random.RandomState(1)
    b = rng.randint(0, 127, (64, 128)).astype(np.int8)

    def k(b_ref, o_ref):
        o_ref[:] = b_ref[:].astype(jnp.int32) * 2

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(b))
    return bool(np.array_equal(np.asarray(got), b.astype(np.int32) * 2)), ""


@probe("P5 sublane roll on (256,128)")
def p5():
    x = np.arange(256 * 128, dtype=np.float32).reshape(256, 128)

    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 24, 0)

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.asarray(x))
    return bool(np.array_equal(np.asarray(got), np.roll(x, 24, 0))), ""


@probe("P6 shared-index sublane gather x[idx,:]")
def p6():
    rng = np.random.RandomState(2)
    x = rng.randn(128, 128).astype(np.float32)
    idx = rng.permutation(128).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(x), jnp.asarray(idx))
    return bool(np.array_equal(np.asarray(got), x[idx])), ""


@probe("P4 32x 8KB granule DMA gather kernel")
def p4():
    # gather 32 chunks of 2048 f32 (8 KB) from static offsets in an HBM
    # array into VMEM, write contiguous: the chunk-transpose building block
    T, C = 32, 2048
    rng = np.random.RandomState(3)
    src = rng.randn(T * C).astype(np.float32).reshape(T * C // 128, 128)
    offs = rng.permutation(T).astype(np.int32) * (C // 128)

    def k(offs_ref, src_ref, o_ref, buf, sem):
        for t in range(T):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(offs_ref[t], C // 128)],
                buf.at[pl.ds(t * (C // 128), C // 128)],
                sem.at[t]).start()
        for t in range(T):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(offs_ref[t], C // 128)],
                buf.at[pl.ds(t * (C // 128), C // 128)],
                sem.at[t]).wait()
        o_ref[:] = buf[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T * C // 128, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((T,))])
    got = pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * C // 128, 128), jnp.float32))(
            jnp.asarray(offs), jnp.asarray(src))
    want = np.concatenate([src[offs[t]:offs[t] + C // 128]
                           for t in range(T)])
    return bool(np.array_equal(np.asarray(got), want)), ""


def main():
    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    oks = [p() for p in (p0, p1, p1b, p2, p3, p5, p6, p4)]
    print(f"{sum(oks)}/{len(oks)} probes passed")


if __name__ == "__main__":
    main()
