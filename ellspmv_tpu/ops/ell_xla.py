"""ELLPACK SpMV in pure XLA: gather + multiply + row reduction.

The portable baseline path (ellgemv/ellgemvsd/ellgemv16sd semantics,
ellspmv.c:1129-1221). XLA's dynamic gather on TPU is slow for random column
patterns — the Pallas kernel (ops/ell_pallas.py) is the performance path;
this one is the always-works fallback and the CPU/testing reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_rows", "num_columns"))
def _ell_spmv(colidx, values, diag, x, y, num_rows: int, num_columns: int):
    n_pad = values.shape[0]
    acc = jnp.zeros(n_pad, values.dtype) if y is None \
        else jnp.pad(y.astype(values.dtype), (0, n_pad - y.shape[0]))
    if values.shape[1]:
        acc = acc + (values * x.astype(values.dtype)[colidx]).sum(
            axis=1, dtype=values.dtype)
    if diag is not None:
        # diag[i] is zero for i >= min(rows, cols); clamp the x index so the
        # padded tail gathers in bounds (the TPU-safe analogue of
        # ellgemvsd's y[i] += ad[i]*x[i], ellspmv.c:1177).
        xi = jnp.minimum(jnp.arange(n_pad), max(num_columns - 1, 0))
        acc = acc + diag * x.astype(values.dtype)[xi]
    return acc


def ell_spmv_xla(ell, x, y=None):
    """y := A*x + y for an EllMatrix; returns a vector of length
    `ell.num_rows` (padding rows dropped)."""
    x = jnp.asarray(x)
    out = _ell_spmv(jnp.asarray(ell.colidx), jnp.asarray(ell.values),
                    None if ell.diag is None else jnp.asarray(ell.diag),
                    x, None if y is None else jnp.asarray(y),
                    ell.num_rows, ell.num_columns)
    return out[:ell.num_rows]
