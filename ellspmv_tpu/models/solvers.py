"""Iterative solvers on top of the SpMV kernels.

The reference has no solver; its y-accumulation contract ("runs can be
chained through files", SURVEY §5 checkpoint/resume) is the seed of one.
The driver's north-star config (BASELINE.json configs[4]) asks for a CG
iteration loop over the row-sharded SpMV — dot products are the only
additional communication (`psum` over the mesh, inserted automatically by
XLA when the operands carry shardings).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CgResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array      # int32
    residual_norm: jax.Array   # ||b - A x||_2


@partial(jax.jit, static_argnames=("matvec", "maxiter"))
def _cg_impl(matvec: Callable, b, x0, operand, tol: float,
             maxiter: int) -> CgResult:
    mv = (lambda v: matvec(operand, v)) if operand is not None else matvec
    # fp64 dot products: XLA's emulated-f64 reduction is ~20x slower than
    # f32 on TPU; use the Pallas double-double reduction there.
    if b.dtype == jnp.float64:
        from ellspmv_tpu.ops import dd_reduce
        if dd_reduce.supported():
            vdot = dd_reduce.dd_vdot
        else:
            vdot = jnp.vdot
    else:
        vdot = jnp.vdot
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mv(x)
    p = r
    rs = vdot(r, r)
    tol2 = jnp.asarray(tol, rs.dtype) ** 2 * vdot(b, b)

    def cond(state):
        _, _, _, rs, k = state
        return (rs > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = mv(p)
        alpha = rs / vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = vdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, k + 1

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0, jnp.int32)))
    return CgResult(x=x, iterations=k, residual_norm=jnp.sqrt(rs))


def cg(matvec: Callable, b, x0=None, tol: float = 1e-8,
       maxiter: int = 1000, operand=None) -> CgResult:
    """Conjugate gradient for SPD A, fully jittable (`lax.while_loop`).

    `matvec(v) -> A v` may be a single-device kernel or the sharded SpMV;
    in the sharded case every `jnp.vdot` below becomes a psum over ICI —
    the entire comm surface of distributed CG (SURVEY §5).

    For large matrices pass `operand` (a pytree of the matrix data) and a
    `matvec(operand, v)` so the data enters the compiled solver as jit
    arguments rather than multi-hundred-MB embedded constants — e.g.
    `operand, fn = ops.dispatch.traceable_spmv(A)`,
    `cg(lambda op, v: fn(op, v), b, operand=operand)`.
    """
    return _cg_impl(matvec, b, x0, operand, tol, maxiter)


@partial(jax.jit, static_argnames=("maxiter",))
def _cg_dd_impl(dp, b, tol: float, maxiter: int) -> CgResult:
    """CG with all vectors carried as double-double (f32 hi/lo) pairs:
    the SpMV, dots, and axpys all run at f32 speed with ~2^-48 accuracy —
    no emulated-f64 vector ops anywhere in the loop."""
    from ellspmv_tpu.ops.dd_vec import (DDVec, dd_axpy, dd_from_f64,
                                        dd_scale, dd_to_f64, dd_vdot_pair)

    n = b.shape[0]

    def mv(v: DDVec) -> DDVec:
        yh, yl = dp.apply_pair(v.hi, v.lo)
        return DDVec(yh[:n], yl[:n])

    bb = dd_from_f64(b)
    x = DDVec(jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
    r = bb                      # r = b - A*0
    p = r
    rs = dd_vdot_pair(r, r)
    tol2 = jnp.asarray(tol, rs.dtype) ** 2 * dd_vdot_pair(bb, bb)

    def cond(state):
        _, _, _, rs, k = state
        return (rs > tol2) & (k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = mv(p)
        alpha = rs / dd_vdot_pair(p, ap)
        x = dd_axpy(x, alpha, p)
        r = dd_axpy(r, -alpha, ap)
        rs_new = dd_vdot_pair(r, r)
        p = dd_axpy(r, rs_new / rs, p)
        return x, r, p, rs_new, k + 1

    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0, jnp.int32)))
    return CgResult(x=dd_to_f64(x), iterations=k,
                    residual_norm=jnp.sqrt(rs))


def cg_dd(dp, b, tol: float = 1e-8, maxiter: int = 1000) -> CgResult:
    """fp64 CG over a Pallas `DevicePlan` with double-double vectors
    (see `_cg_dd_impl`). `dp` must be a dd plan (fp64 matrix, no split
    diagonal)."""
    return _cg_dd_impl(dp, jnp.asarray(b, jnp.float64), tol, maxiter)
