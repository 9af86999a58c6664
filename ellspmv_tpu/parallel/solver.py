"""Distributed double-double CG: the whole solve inside one shard_map.

The reference has no distributed story (SURVEY §2.4); BASELINE configs[4]
asks for a CG loop over the row-sharded SpMV. The single-chip dd-vector CG
(models/solvers.cg_dd) showed fp64 CG runs at f32 speed when every loop op
carries (hi, lo) f32 pairs; this module is its multi-chip form:

- the matrix is sharded with ``x_layout="physical"`` (parallel/spmv.py), so
  x and y share one padded per-device layout — no per-iteration unpermute
  gathers anywhere in the loop;
- the CG ``lax.while_loop`` runs INSIDE shard_map: each device owns its
  block of every vector as an f32 (hi, lo) pair;
- the matvec allgathers the x pair over ICI (two f32 allgathers — the same
  bytes as one f64) and runs the local Pallas dd kernel on its tile range;
- dot products are local Pallas dd reductions (ops/dd_reduce.py) combined
  exactly across devices: allgather the per-device f64 partials (n_dev
  scalars) and sum — deterministic, so the replicated while_loop condition
  sees identical values on every device.

The comm surface per iteration: 2 f32 allgathers (matvec) + 2 scalar
allgathers (the two dots) — nothing else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ellspmv_tpu.parallel.spmv import ShardedMatrix, _sharded_plan


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cg_dd_ineligible(sm: ShardedMatrix) -> str | None:
    """Why `cg_dd_sharded` cannot run on `sm` (None = eligible).

    Callers that want a graceful fallback check this instead of catching
    ValueError, so genuine failures inside the solve still propagate."""
    if not sm.x_physical:
        return "needs x_layout='physical' (see shard_matrix)"
    parts = _sharded_plan(sm)
    if parts is None:
        return "matrix unsupported by the sharded Pallas kernel"
    if not parts.dims.dd:
        return "fp64 path only; use cg() for f32 matrices"
    return None


def cg_dd_sharded(sm: ShardedMatrix, b, tol: float = 1e-8,
                  maxiter: int = 1000):
    """fp64 CG over a row-sharded ELL matrix with double-double vectors.

    `sm` must come from `shard_matrix(..., x_layout="physical")` (square,
    diagonal folded in) and have a Pallas plan. Returns a CgResult with the
    logical solution vector (f64)."""
    from ellspmv_tpu.models.solvers import CgResult
    from ellspmv_tpu.ops import ell_pallas
    from ellspmv_tpu.ops.dd_reduce import _CHUNK, _dd_vdot_split_impl
    from ellspmv_tpu.ops.dd_vec import DDVec, dd_axpy

    reason = cg_dd_ineligible(sm)
    if reason is not None:
        raise ValueError(f"cg_dd_sharded: {reason}")
    parts = _sharded_plan(sm)
    d_ = parts.dims
    mesh, axis = sm.mesh, sm.mesh.axis_names[0]
    n_dev = mesh.devices.size
    block = sm.block
    npad = block * n_dev
    S, G, KS, K128, nx128 = d_.S, d_.G, d_.KS, d_.K128, d_.nx128
    slope, lead, static, unroll, T_local = (d_.slope, d_.lead, d_.static,
                                            d_.unroll, d_.T_local)
    interpret = jax.devices()[0].platform != "tpu"
    fastdd = ell_pallas.fma_contraction_available()
    dot_pad = _round_up(block, _CHUNK)

    def local(wb, qb, lcol, vh, vl, bh_blk, bl_blk, tol2_num):
        def mv(p: DDVec) -> DDVec:
            xh = jax.lax.all_gather(p.hi, axis, tiled=True)
            xl = jax.lax.all_gather(p.lo, axis, tiled=True)
            pad = (lead * 128, nx128 * 128 - lead * 128 - npad)
            yh, yl = ell_pallas._run_dd(
                wb, qb, lcol, vh, vl,
                jnp.pad(xh, pad).reshape(nx128, 128),
                jnp.pad(xl, pad).reshape(nx128, 128),
                S, G, KS, K128, T_local, slope=slope, unroll=unroll,
                fastdd=fastdd, static=static, ks_slot=d_.ks_slot,
                nacc=1, interpret=interpret)
            return DDVec(yh.reshape(-1)[:block], yl.reshape(-1)[:block])

        def vdot(a: DDVec, c: DDVec):
            # local Pallas dd dot, exact deterministic cross-device sum
            part = _dd_vdot_split_impl(a.hi, a.lo, c.hi, c.lo,
                                       n_pad=dot_pad, interpret=interpret)
            return jnp.sum(jax.lax.all_gather(part, axis))

        bb = DDVec(bh_blk, bl_blk)
        x = DDVec(jnp.zeros(block, jnp.float32),
                  jnp.zeros(block, jnp.float32))
        r = bb                    # r = b - A*0
        p = r
        rs = vdot(r, r)
        tol2 = tol2_num * vdot(bb, bb)

        def cond(state):
            _, _, _, rs, k = state
            return (rs > tol2) & (k < maxiter)

        def body(state):
            x, r, p, rs, k = state
            ap = mv(p)
            alpha = rs / vdot(p, ap)
            x = dd_axpy(x, alpha, p)
            r = dd_axpy(r, -alpha, ap)
            rs_new = vdot(r, r)
            p = dd_axpy(r, rs_new / rs, p)
            return x, r, p, rs_new, k + 1

        x, r, p, rs, k = jax.lax.while_loop(
            cond, body, (x, r, p, rs, jnp.asarray(0, jnp.int32)))
        return x.hi, x.lo, rs, k

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis, None, None), P(axis, None, None, None),
                  P(axis, None, None, None), P(axis, None, None, None),
                  P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False)

    # b -> physical layout, pre-split into the f32 pair outside the loop
    b_phys = sm.to_physical_y(jnp.asarray(b, jnp.float64))
    bh = b_phys.astype(jnp.float32)
    bl = (b_phys - bh.astype(jnp.float64)).astype(jnp.float32)
    sh1 = NamedSharding(mesh, P(axis))
    bh = jax.device_put(bh, sh1)
    bl = jax.device_put(bl, sh1)
    tol2_num = jnp.asarray(tol, jnp.float64) ** 2

    # one jitted solve per (sm, maxiter); cached on the matrix so repeated
    # solves reuse the compiled program
    cache = getattr(sm, "_cg_dd_cache", None)
    if cache is None:
        cache = sm._cg_dd_cache = {}
    jitted = cache.get(maxiter)
    if jitted is None:
        jitted = cache[maxiter] = jax.jit(mapped)
    xh, xl, rs, k = jitted(parts.wb, parts.qb, parts.lcol,
                           parts.vals[0], parts.vals[1], bh, bl, tol2_num)
    x_phys = xh.astype(jnp.float64) + xl.astype(jnp.float64)
    return CgResult(x=x_phys[sm.unpermute], iterations=k,
                    residual_norm=jnp.sqrt(rs))
