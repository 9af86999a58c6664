"""VPU op-rate microbench: measured per-op costs for the kernel cycle
ledger (VERDICT r3 item 2 — either close the ELL gather gap to >=80% of
HBM or prove the ceiling with measured op rates).

Each variant runs a Pallas kernel over a T-step grid; every step performs
N unrolled repetitions of ONE op class on VMEM-resident (8, 128) f32
operands and accumulates so nothing folds away. Two unroll depths per op
give a two-point slope that cancels the grid-step overhead; dividing by
the op count yields ns/op on the actual hardware.

Op classes: dynamic lane gather (the ELL kernel's x fetch,
ops/ell_pallas.py _lane_gather), static sublane slice+add (the aligned
stream-sum realign), select (the scan's hit cascade), the serial dd FMA
chain (_dd_fma with renorm), (128,128) transpose, and the same transpose
through the MXU (dot with an identity) — the router's W2 alternative.

Usage: python benchmarks/microbench_ops.py [--t 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops.ell_pallas import _dd_fma, _i0, _lane_gather


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _make(op_name: str, N: int, T: int):
    """Kernel: per grid step, N repetitions of the op, accumulated."""

    def kernel(x_ref, l_ref, o_ref):
        i = pl.program_id(0)
        lane0 = l_ref[0:8]
        # 4 independent serial chains: approximates the issue rate with
        # realistic ILP while preventing the compiler from collapsing or
        # reassociating the op sequence
        accs = [x_ref[8 * j:8 * j + 8] * jnp.float32(1e-9)
                + i.astype(jnp.float32) * 0 for j in range(4)]
        if op_name == "gather":
            for k in range(N):
                lane = jax.lax.bitwise_and(lane0 + jnp.int32(k),
                                           jnp.int32(127))
                j = k % 4
                accs[j] = accs[j] + _lane_gather(
                    x_ref[8 * (k % 8):8 * (k % 8) + 8], lane)
        elif op_name == "gather16":
            # the dd-gather-halving probe (VERDICT r4 item 5): ONE lane
            # gather on a (16,128) operand (x hi rows stacked over lo
            # rows) vs the kernel's TWO (8,128) gathers per scan step. If
            # ns/op stays near the (8,128) rate the fusion halves the
            # gather count; if it doubles, Mosaic is issuing two native
            # ops anyway and the 63-67% ELL ceiling stands.
            lane16 = jnp.concatenate([lane0, lane0], axis=0)
            acc16 = [jnp.concatenate([accs[0], accs[1]], 0),
                     jnp.concatenate([accs[2], accs[3]], 0)]
            for k in range(N):
                lane = jax.lax.bitwise_and(lane16 + jnp.int32(k),
                                           jnp.int32(127))
                j = k % 2
                acc16[j] = acc16[j] + _lane_gather(
                    x_ref[16 * (k % 4):16 * (k % 4) + 16], lane)
            accs = [acc16[0][0:8], acc16[0][8:16],
                    acc16[1][0:8], acc16[1][8:16]]
        elif op_name == "select16":
            # the cascade cost at the fused height (prices the full
            # fusion, not just the gather stage)
            lane16 = jnp.concatenate([lane0, lane0], axis=0)
            m0 = lane16 < jnp.int32(64)
            m1 = lane16 >= jnp.int32(32)
            acc16 = [jnp.concatenate([accs[0], accs[1]], 0),
                     jnp.concatenate([accs[2], accs[3]], 0)]
            for k in range(N):
                j = k % 2
                acc16[j] = jnp.where(
                    m0 if k % 2 else m1,
                    x_ref[16 * (k % 4):16 * (k % 4) + 16], acc16[j])
            accs = [acc16[0][0:8], acc16[0][8:16],
                    acc16[1][0:8], acc16[1][8:16]]
        elif op_name == "slice_add":
            for k in range(N):
                j = k % 4
                accs[j] = accs[j] + x_ref[8 * (k % 8):8 * (k % 8) + 8]
        elif op_name == "select":
            m0 = lane0 < jnp.int32(64)
            m1 = lane0 >= jnp.int32(32)
            for k in range(N):
                j = k % 4
                accs[j] = jnp.where(m0 if k % 2 else m1,
                                    x_ref[8 * (k % 8):8 * (k % 8) + 8],
                                    accs[j])
        elif op_name == "dd_fma":
            # 2 serial chains — close to the kernel's nacc=2 dependency
            los = [a * jnp.float32(0) for a in accs[:2]]
            a = x_ref[0:8]
            b = x_ref[8:16]
            for k in range(N):
                j = k % 2
                accs[j], los[j] = _dd_fma(accs[j], los[j], a, b, b, a)
            accs[0] = accs[0] + los[0] + los[1]
        elif op_name == "transpose":
            z = x_ref[0:128]
            for k in range(N):
                z = z.T
                accs[k % 4] = accs[k % 4] + z[0:8] * jnp.float32(1e-9)
        elif op_name == "mxu_transpose":
            z = x_ref[0:128]
            ident = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1),
                jnp.float32(1), jnp.float32(0))
            for k in range(N):
                z = jax.lax.dot_general(
                    ident, z, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                accs[k % 4] = accs[k % 4] + z[0:8] * jnp.float32(1e-9)
        else:
            raise ValueError(op_name)
        o_ref[0:8] = accs[0] + accs[1] + accs[2] + accs[3]

    return kernel


@functools.partial(jax.jit, static_argnames=("op_name", "N", "T"))
def run(x, lanes, op_name, N, T):
    return pl.pallas_call(
        _make(op_name, N, T),
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=bool(os.environ.get("MB_INTERPRET")),
    )(x, lanes)


def measure(op_name: str, T: int, n_lo: int = 16, n_hi: int = 80):
    """Two-point unroll-depth slope at a grid size large enough that the
    op-count delta dwarfs the ~30 ms tunnel dispatch jitter (a T=2048
    first cut measured NEGATIVE slopes — the whole kernel ran inside the
    dispatch noise)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(128, 128).astype(np.float32))
    lanes = jnp.asarray(rng.randint(0, 128, (8, 128)).astype(np.int32))
    _sync(run(x, lanes, op_name, n_lo, T))
    _sync(run(x, lanes, op_name, n_hi, T))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(run(x, lanes, op_name, n_lo, T))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(run(x, lanes, op_name, n_hi, T))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (T * (n_hi - n_lo)))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=65536)
    ap.add_argument("--ops", default="gather,slice_add,select,dd_fma,"
                                     "transpose,mxu_transpose")
    args = ap.parse_args()
    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind}), T={args.t}", flush=True)
    for op in args.ops.split(","):
        ns = measure(op, args.t) * 1e9
        shape = ("(128,128)" if "transpose" in op
                 else "(16,128)" if "16" in op else "(8,128)")
        elems = (16384 if "transpose" in op
                 else 2048 if "16" in op else 1024)
        print(f"{op:14s} {ns:8.2f} ns/op on {shape} "
              f"({ns / elems * 1000:7.3f} ps/elem)",
              flush=True)


if __name__ == "__main__":
    main()
