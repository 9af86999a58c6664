"""Double-double vectors as first-class objects (f32 hi/lo pairs).

XLA's emulated f64 on TPU costs ~4-20x f32 per op; a CG iteration spends
more time in its f64 axpys and dots than in the Pallas SpMV. Carrying the
solver's vectors as explicit (hi, lo) f32 pairs keeps every elementwise op
at f32 speed while preserving double-double (~2^-48) accuracy — the same
representation the SpMV kernel uses internally.

The two_sum/two_prod building blocks are safe under XLA contraction:
fusing `a*b - p` into an FMA only makes the error term exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

def _ob(*vals):
    """optimization_barrier: stops XLA's algebraic simplifier from
    rewriting the error-free transforms (e.g. (a+b)-a -> b), which would
    silently degrade the lo parts to zero. (Inside Pallas kernels Mosaic
    performs no such rewrites — and doesn't support the barrier — so the
    kernel-side dd code in ops/ell_pallas.py doesn't need this.)"""
    out = jax.lax.optimization_barrier(vals)
    return out if len(vals) > 1 else out[0]


def _two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    return s, (a - _ob(s - bb)) + (b - bb)


def _split32(a):
    c = _ob(a * jnp.float32(4097.0))
    hi = _ob(c - _ob(c - a))
    return hi, a - hi


def _two_prod(a, b):
    p = _ob(a * b)
    ah, al = _split32(a)
    bh, bl = _split32(b)
    err = ((_ob(ah * bh) - p) + ah * bl + al * bh) + al * bl
    return p, err


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    hi = _ob(s + e)
    return hi, e - _ob(hi - s)


class DDVec(NamedTuple):
    hi: jax.Array   # f32
    lo: jax.Array   # f32


def dd_from_f64(x) -> DDVec:
    hi = x.astype(jnp.float32)
    return DDVec(hi, (x - hi.astype(x.dtype)).astype(jnp.float32))


def dd_to_f64(v: DDVec):
    return v.hi.astype(jnp.float64) + v.lo.astype(jnp.float64)


def _split_scalar(s):
    """f64 scalar -> (hi, lo) f32 scalars."""
    hi = s.astype(jnp.float32)
    return hi, (s - hi.astype(s.dtype)).astype(jnp.float32)


def dd_scale(v: DDVec, s) -> DDVec:
    """v * s for an f64 scalar s, in dd."""
    sh, sl = _split_scalar(s)
    ph, pl = _two_prod(v.hi, sh)
    pl = pl + v.hi * sl + v.lo * sh
    hi = ph + pl
    return DDVec(hi, pl - (hi - ph))


def dd_add(a: DDVec, b: DDVec) -> DDVec:
    hi, lo = _dd_add(a.hi, a.lo, b.hi, b.lo)
    return DDVec(hi, lo)


def dd_mul(a: DDVec, b: DDVec) -> DDVec:
    """Elementwise a * b in dd (e.g. the split-diagonal epilogue
    d[i]*x[i], ellspmv.c:1177, on pair-carried vectors)."""
    ph, pl = _two_prod(a.hi, b.hi)
    pl = pl + (a.hi * b.lo + a.lo * b.hi)
    hi = _ob(ph + pl)
    return DDVec(hi, pl - (hi - ph))


def dd_axpy(a: DDVec, s, b: DDVec) -> DDVec:
    """a + s*b with f64 scalar s (the CG update kernel)."""
    sh, sl = _split_scalar(s)
    ph, pl = _two_prod(b.hi, sh)
    pl = pl + b.hi * sl + b.lo * sh
    hi, lo = _dd_add(a.hi, a.lo, ph, pl)
    return DDVec(hi, lo)


def dd_vdot_pair(a: DDVec, b: DDVec):
    """f64 dot product of two dd vectors via the Pallas reduction."""
    from ellspmv_tpu.ops import dd_reduce
    return dd_reduce.dd_vdot_split(a.hi, a.lo, b.hi, b.lo)
