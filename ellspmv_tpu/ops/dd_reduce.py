"""Pallas double-double reductions (fp64 dot products on TPU).

XLA's emulated-f64 reduction is ~20x slower than f32 on v5e (measured
2.65 ms for a CG iteration's three 262k-element vector ops vs 0.12 ms in
f32) — it dominates fp64 CG once the SpMV itself runs in the Pallas
kernel. This kernel computes dot products in the same double-double (f32
hi/lo pair) arithmetic as the SpMV kernel: elementwise two_prod +
compensated accumulation into a (8,128) accumulator pair streamed over the
vectors, with the final 1024-element reduction done in XLA f64 (cheap at
that size).

Accuracy matches XLA's own f64 emulation class (~2^-48 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops.ell_pallas import _dd_fma, _i0

_CHUNK = 8 * 128


def _dot_kernel(T):
    def kernel(xh, xl, yh, yl, oh, ol, acc_h, acc_l):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_h[:, :] = jnp.zeros((8, 128), jnp.float32)
            acc_l[:, :] = jnp.zeros((8, 128), jnp.float32)

        h, lo = _dd_fma(acc_h[:, :], acc_l[:, :],
                        xh[0], xl[0], yh[0], yl[0])
        acc_h[:, :] = h
        acc_l[:, :] = lo

        @pl.when(i == T - 1)
        def _():
            oh[:, :] = acc_h[:, :]
            ol[:, :] = acc_l[:, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _run_dot(xh, xl, yh, yl, T, interpret=False):
    spec = pl.BlockSpec((1, 8, 128), lambda i: (i, _i0(), _i0()),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, 128), lambda i: (_i0(), _i0()),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dot_kernel(T),
        grid=(T,),
        in_specs=[spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(xh, xl, yh, yl)


def _split(v):
    hi = v.astype(jnp.float32)
    return hi, (v - hi.astype(v.dtype)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _dd_vdot_impl(x, y, n_pad, interpret=False):
    xp = jnp.pad(x, (0, n_pad - x.shape[0]))
    yp = jnp.pad(y, (0, n_pad - y.shape[0]))
    T = n_pad // _CHUNK
    xh, xl = _split(xp)
    yh, yl = _split(yp)
    shape = (T, 8, 128)
    oh, ol = _run_dot(xh.reshape(shape), xl.reshape(shape),
                      yh.reshape(shape), yl.reshape(shape), T, interpret)
    # final 1024-element reduction in (emulated) f64 — cheap at this size
    return (jnp.sum(oh.astype(jnp.float64))
            + jnp.sum(ol.astype(jnp.float64)))


def supported() -> bool:
    import os
    return (jax.devices()[0].platform == "tpu"
            or bool(os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET")))


def dd_vdot(x, y):
    """fp64 dot product via the Pallas dd kernel (real-valued vectors)."""
    import os
    n = x.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    interpret = (jax.devices()[0].platform != "tpu"
                 or bool(os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET")))
    return _dd_vdot_impl(x, y, n_pad, interpret)


@functools.partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _dd_vdot_split_impl(xh, xl, yh, yl, n_pad, interpret=False):
    def pad(v):
        return jnp.pad(v, (0, n_pad - v.shape[0]))
    T = n_pad // _CHUNK
    shape = (T, 8, 128)
    oh, ol = _run_dot(pad(xh).reshape(shape), pad(xl).reshape(shape),
                      pad(yh).reshape(shape), pad(yl).reshape(shape),
                      T, interpret)
    return (jnp.sum(oh.astype(jnp.float64))
            + jnp.sum(ol.astype(jnp.float64)))


def dd_vdot_split(xh, xl, yh, yl):
    """fp64 dot product of pre-split (hi, lo) f32 vector pairs."""
    import os
    n = xh.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    interpret = (jax.devices()[0].platform != "tpu"
                 or bool(os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET")))
    return _dd_vdot_split_impl(xh, xl, yh, yl, n_pad, interpret)
