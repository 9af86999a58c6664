"""Probe round 3: in-block permutation kernel (the route building block).

Without a Mosaic sublane gather, cross-row movement inside a (128,128)
block goes through transposes: sublane-gather(q) = T . lane-gather(qT) . T.
A full in-block permutation is then  laneG(l1) -> T -> laneG(qT) -> T
(-> laneG(l3) fused into the next consumer). This probes correctness and
per-block cost of that 5-op pipeline at stream scale, plus a proper
re-timing of the XLA row-take.

Run on the real TPU:  python benchmarks/probe_perm3.py
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


def _lane_gather(op, lane):
    g = lane[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _block_perm(v, l1, qT):
    """Arbitrary permutation of a (128,128) block.

    out[r, l] = t[l, r] where t = laneG(T(laneG(v, l1)), qT):
    element (r1,l1v)  -l1->  (r1,c)  -T->  (c,r1)  -qT->  (c,r2) -T-> done.
    """
    v = _lane_gather(v, l1)
    vt = v.T
    vt = _lane_gather(vt, qT)
    return vt.T


def _np_block_perm(v, l1, qT):
    v = np.take_along_axis(v, l1, axis=1)
    vt = np.take_along_axis(v.T, qT, axis=1)
    return vt.T


@probe("B1 in-block perm (laneG,T,laneG,T) correctness")
def b1():
    rng = np.random.RandomState(0)
    v = rng.randn(128, 128).astype(np.float32)
    l1 = np.stack([rng.permutation(128) for _ in range(128)]).astype(
        np.int32)
    qT = np.stack([rng.permutation(128) for _ in range(128)]).astype(
        np.int32)

    def k(v_ref, l1_ref, qT_ref, o_ref):
        o_ref[:] = _block_perm(v_ref[:], l1_ref[:], qT_ref[:])

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(v), jnp.asarray(l1), jnp.asarray(qT))
    want = _np_block_perm(v, l1, qT)
    return bool(np.array_equal(np.asarray(got), want)), ""


@probe("B2 lane gather with (128,256) index shape")
def b2():
    rng = np.random.RandomState(1)
    v = rng.randn(128, 128).astype(np.float32)
    idx = rng.randint(0, 128, (128, 256)).astype(np.int32)

    def k(v_ref, i_ref, o_ref):
        o_ref[:] = _lane_gather(v_ref[:], i_ref[:])

    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(v), jnp.asarray(idx))
    want = np.stack([v[i, idx[i]] for i in range(128)])
    return bool(np.array_equal(np.asarray(got), want)), ""


def _route_stream_kernel(NB, payloads=2):
    """Grid over (128,128) blocks; per block: full in-block perm of each
    payload with int8 control, writing the result. The W-kernel shape."""
    def k(l1_ref, qT_ref, *refs):
        ins = refs[:payloads]
        outs = refs[payloads:]
        l1 = l1_ref[0].astype(jnp.int32)
        qT = qT_ref[0].astype(jnp.int32)
        for i in range(payloads):
            outs[i][0] = _block_perm(ins[i][0], l1, qT)

    def im(i):
        return (i, 0, 0)

    specs = dict(
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, 128, 128), im,
                               memory_space=pltpu.VMEM)] * (2 + payloads),
        out_specs=[pl.BlockSpec((1, 128, 128), im,
                                memory_space=pltpu.VMEM)] * payloads)

    def call(l1, qT, *vals):
        return pl.pallas_call(
            k, **specs,
            out_shape=[jax.ShapeDtypeStruct((NB, 128, 128), jnp.float32)
                       for _ in range(payloads)])(l1, qT, *vals)

    @jax.jit
    def chain(l1, qT, iters, *vals):
        def body(_, c):
            return tuple(call(l1, qT, *c))
        return jax.lax.fori_loop(0, iters, body, tuple(vals))

    return jax.jit(call), chain


def _time_chain(chain, args_lo, args_hi, n_lo, n_hi):
    out = chain(*args_lo)
    sync(out)
    out = chain(*args_hi)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(chain(*args_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(chain(*args_hi))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


@probe("B3 W-kernel stream: 8M elems x2 payloads, i8 ctl")
def b3():
    NB = 512                            # 8.4M elements
    rng = np.random.RandomState(2)
    l1 = jnp.asarray(rng.randint(0, 128, (NB, 128, 128)).astype(np.int8))
    qT = jnp.asarray(rng.randint(0, 128, (NB, 128, 128)).astype(np.int8))
    a = jnp.asarray(rng.randn(NB, 128, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(NB, 128, 128).astype(np.float32))
    run, chain = _route_stream_kernel(NB)

    out = run(l1, qT, a, b)
    want = _np_block_perm(np.asarray(a)[0],
                          np.asarray(l1)[0].astype(np.int64) & 0x7f,
                          np.asarray(qT)[0].astype(np.int64) & 0x7f)
    ok = np.array_equal(np.asarray(out[0])[0], want)

    per = _time_chain(chain, (l1, qT, 4, a, b), (l1, qT, 12, a, b), 4, 12)
    n = NB * 128 * 128
    nbytes = n * (4 * 2 * 2 + 2)
    return bool(ok), (f"{per * 1e3:.3f} ms/iter "
                      f"({nbytes / per / 1e9:.0f} GB/s incl ctl, "
                      f"{per / NB * 1e6:.2f} us/block)")


@probe("B4 XLA row-take 8M x2 payloads (re-timed)")
def b4():
    rng = np.random.RandomState(3)
    NG = 65536
    a = jnp.asarray(rng.randn(NG, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(NG, 128).astype(np.float32))
    idx = jnp.asarray(rng.permutation(NG).astype(np.int32))

    @jax.jit
    def chain(a, b, idx, iters):
        def body(_, c):
            a_, b_ = c
            return jnp.take(a_, idx, axis=0), jnp.take(b_, idx, axis=0)
        return jax.lax.fori_loop(0, iters, body, (a, b))

    per = _time_chain(chain, (a, b, idx, 4), (a, b, idx, 20), 4, 20)
    gbps = 2 * 2 * NG * 128 * 4 / per / 1e9
    return True, f"{per * 1e3:.3f} ms/iter ({gbps:.0f} GB/s r+w)"


def main():
    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    oks = [p() for p in (b1, b2, b3, b4)]
    print(f"{sum(oks)}/{len(oks)} probes passed")


if __name__ == "__main__":
    main()
