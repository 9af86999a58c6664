"""Pallas ELLPACK SpMV kernel — the performance path (ellgemv analogue,
ellspmv.c:1129-1153, redesigned for the TPU memory system).

Per grid step (one tile of R = G*128 rows):

1. DMA the tile's x window (K128 x 128 f32) HBM→VMEM, start offset from the
   scalar-prefetched `wbase128` (PrefetchScalarGridSpec) — x stays on-chip
   while the a/colidx streams are pipelined past it by Pallas, the VMEM
   realization of the reference's A64FX sector-cache isolation of x
   (ellspmv.c:1737-1743);
2. for each ELL slot s: gather x values with KS lane-local
   `take_along_axis` steps from the slot's sub-window row (`qb[t,s]`),
   select by the high bits of the local column, FMA into the (G, 128)
   accumulator — the VPU equivalent of the reference's
   `yi += a[i*rowsize+l] * x[colidx[...]]` inner loop (ellspmv.c:1148);
3. write the accumulator as the y tile (row-major (n/128, 128) layout).

fp64 runs as double-double (hi/lo f32 pairs): TPU has no native f64 — XLA
itself emulates f64 this way — and Mosaic exposes only f32, so the kernel
carries (hi, lo) operands and does compensated multiply-accumulate inline,
matching XLA-on-TPU f64 fidelity (~1e-14 worst-case relative error).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops import plan as plan_mod

_PLAN_ATTR = "_pallas_plan_cache"


def _lane_gather(op, lane):
    """out[g, j] = op[g, lane[g, j]] with int32 indices.

    Equivalent to `jnp.take_along_axis(op, lane, axis=1)` but emitted
    directly as lax.gather so jax_enable_x64 cannot promote the indices to
    int64 (Mosaic has no 64-bit types). Lowers to the TPU dynamic lane
    gather (lane dim must be 128)."""
    g = lane[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Dekker split of f32 into 12+12-bit halves (no fused FMA assumed)."""
    c = a * np.float32(4097.0)        # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    hi = s + e
    return hi, e - (hi - s)


def _dd_fma(acc_h, acc_l, a_h, a_l, x_h, x_l):
    """(acc) += (a) * (x) in double-double."""
    ph, pl_ = _two_prod(a_h, x_h)
    pl_ = pl_ + a_h * x_l + a_l * x_h
    return _dd_add(acc_h, acc_l, ph, pl_)


def _make_kernel(S: int, G: int, KS: int, K128: int, dd: bool):
    """Build the kernel body for rowsize S, G row-groups, KS gather steps."""

    def kernel(wb_ref, qb_ref, lcol_ref, *rest):
        if dd:
            vh_ref, vl_ref, x_ref, yh_ref, yl_ref, xw, sem = rest
        else:
            v_ref, x_ref, y_ref, xw, sem = rest
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(wb_ref[i], K128)], xw, sem)
        cp.start()
        cp.wait()

        acc = jnp.zeros((G, 128), jnp.float32)
        acc_l = jnp.zeros((G, 128), jnp.float32) if dd else None
        for s in range(S):
            idx = lcol_ref[s * G:(s + 1) * G, :]
            q = jax.lax.shift_right_logical(idx, jnp.int32(7))
            lane = jax.lax.bitwise_and(idx, jnp.int32(127))
            qb = qb_ref[i, s]
            if dd:
                xg_h = jnp.zeros((G, 128), jnp.float32)
                xg_l = jnp.zeros((G, 128), jnp.float32)
            else:
                xg = jnp.zeros((G, 128), jnp.float32)
            for k in range(KS):
                if dd:
                    row = xw[pl.ds(qb + k, 1), :]        # (1, 256) h|l
                    rh = jnp.broadcast_to(row[:, :128], (G, 128))
                    rl = jnp.broadcast_to(row[:, 128:], (G, 128))
                    hit = q == k
                    xg_h = jnp.where(
                        hit, _lane_gather(rh, lane), xg_h)
                    xg_l = jnp.where(
                        hit, _lane_gather(rl, lane), xg_l)
                else:
                    row = jnp.broadcast_to(
                        xw[pl.ds(qb + k, 1), :], (G, 128))
                    xg = jnp.where(
                        q == k, _lane_gather(row, lane), xg)
            if dd:
                vh = vh_ref[s * G:(s + 1) * G, :]
                vl = vl_ref[s * G:(s + 1) * G, :]
                acc, acc_l = _dd_fma(acc, acc_l, vh, vl, xg_h, xg_l)
            else:
                acc = acc + v_ref[s * G:(s + 1) * G, :] * xg
        if dd:
            yh_ref[:, :] = acc
            yl_ref[:, :] = acc_l
        else:
            y_ref[:, :] = acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "KS", "K128", "T", "interpret"))
def _run_f32(wbase128, qb, lcol, vals, x2d, S, G, KS, K128, T,
             interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((S * G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((G, 128), lambda i, wb, qb_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(S, G, KS, K128, dd=False),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * G, 128), jnp.float32),
        interpret=interpret,
    )(wbase128, qb, lcol, vals, x2d)


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "KS", "K128", "T", "interpret"))
def _run_dd(wbase128, qb, lcol, vals_h, vals_l, x2d, S, G, KS, K128, T,
            interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((S * G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i, wb, qb_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((K128, 256), jnp.float32),   # hi | lo halves
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(S, G, KS, K128, dd=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T * G, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T * G, 128), jnp.float32)],
        interpret=interpret,
    )(wbase128, qb, lcol, vals_h, vals_l, x2d)


class DevicePlan:
    """Plan operands on device + the jitted pre/post glue."""

    def __init__(self, ell, plan: plan_mod.EllPlan, dd: bool):
        self.plan = plan
        self.dd = dd
        import os
        self.interpret = (jax.devices()[0].platform != "tpu"
                          or bool(os.environ.get(
                              "ELLSPMV_TPU_PALLAS_INTERPRET")))
        self.wbase128 = jnp.asarray(plan.wbase128)
        self.qb = jnp.asarray(plan.qb)
        self.lcol = jnp.asarray(plan.lcol)
        if dd:
            vh = plan.vals.astype(np.float32)
            vl = (plan.vals - vh.astype(np.float64)).astype(np.float32)
            self.vals_h = jnp.asarray(vh)
            self.vals_l = jnp.asarray(vl)
        else:
            self.vals = jnp.asarray(plan.vals.astype(np.float32))

    def __call__(self, x):
        p = self.plan
        if self.dd:
            return _dd_apply(self.wbase128, self.qb, self.lcol,
                             self.vals_h, self.vals_l, x,
                             p.rowsize, p.G, p.KS, p.K128, p.num_tiles,
                             p.nx128, self.interpret)
        return _f32_apply(self.wbase128, self.qb, self.lcol, self.vals, x,
                          p.rowsize, p.G, p.KS, p.K128, p.num_tiles,
                          p.nx128, self.interpret)


@functools.partial(jax.jit, static_argnames=("S", "G", "KS", "K128", "T",
                                              "nx128", "interpret"))
def _f32_apply(wbase128, qb, lcol, vals, x, S, G, KS, K128, T, nx128,
               interpret=False):
    x = x.astype(jnp.float32)
    x2d = jnp.pad(x, (0, nx128 * 128 - x.shape[0])).reshape(nx128, 128)
    y2d = _run_f32(wbase128, qb, lcol, vals, x2d, S, G, KS, K128, T,
                   interpret)
    return y2d.reshape(-1)


@functools.partial(jax.jit, static_argnames=("S", "G", "KS", "K128", "T",
                                              "nx128", "interpret"))
def _dd_apply(wbase128, qb, lcol, vals_h, vals_l, x, S, G, KS, K128, T,
              nx128, interpret=False):
    xp = jnp.pad(x, (0, nx128 * 128 - x.shape[0]))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(xp.dtype)).astype(jnp.float32)
    x2d = jnp.concatenate([xh.reshape(nx128, 128), xl.reshape(nx128, 128)],
                          axis=1)                     # (nx128, 256) hi|lo
    yh, yl = _run_dd(wbase128, qb, lcol, vals_h, vals_l, x2d,
                     S, G, KS, K128, T, interpret)
    return (yh.reshape(-1).astype(jnp.float64)
            + yl.reshape(-1).astype(jnp.float64))


def get_plan(ell, **kw):
    """Build (and cache on the EllMatrix) the device plan, or None."""
    cached = getattr(ell, _PLAN_ATTR, None)
    if cached is not None:
        return cached if cached != "unsupported" else None
    val_dt = np.dtype(np.asarray(ell.values).dtype)
    dd = val_dt == np.float64
    plan = plan_mod.build_plan(
        ell, value_dtype=np.float64 if dd else np.float32, **kw)
    if plan is None:
        object.__setattr__(ell, _PLAN_ATTR, "unsupported")
        return None
    dp = DevicePlan(ell, plan, dd)
    object.__setattr__(ell, _PLAN_ATTR, dp)
    return dp


def supported(ell, x) -> bool:
    if jax.devices()[0].platform not in ("tpu",):
        return False
    val_dt = np.dtype(np.asarray(ell.values).dtype)
    if val_dt not in (np.dtype(np.float32), np.dtype(np.float64)):
        return False
    return get_plan(ell) is not None


def ell_spmv_pallas(ell, x, y=None):
    """y := A*x + y via the Pallas kernel (+ diagonal and y-accumulate as a
    fused XLA epilogue)."""
    dp = get_plan(ell)
    if dp is None:
        raise ValueError("matrix unsupported by the pallas ELL kernel")
    x = jnp.asarray(x)
    core = dp(x)[:ell.num_rows]
    val_dt = np.asarray(ell.values).dtype
    out = core.astype(val_dt)
    if ell.diag is not None:
        n = ell.num_rows
        k = min(n, ell.num_columns)
        d = jnp.asarray(ell.diag)[:n]
        xi = jnp.minimum(jnp.arange(n), max(ell.num_columns - 1, 0))
        out = out + d * x.astype(val_dt)[xi]
    if y is not None:
        out = out + jnp.asarray(y).astype(val_dt)
    return out
