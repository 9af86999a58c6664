"""CSR SpMV in pure XLA as a segment reduction.

The reference's CSR kernels walk rowptr per row (csrgemv, csrspmv.c:1588-1593).
On TPU a data-dependent per-row loop defeats the compiler; the TPU-native
formulation is a flat product over stored entries followed by a fixed-shape
segment-sum over the precomputed row ids — which is also exactly the
structure of the nonzero-balanced kernel csrgemvnz (csrspmv.c:1681-1761),
minus its atomics (a segment reduction has no write conflicts by
construction; SURVEY §2.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_rows", "num_columns"))
def _csr_spmv(colidx, values, rowids, diag, x, y,
              num_rows: int, num_columns: int):
    acc = jnp.zeros(num_rows, values.dtype) if y is None \
        else y.astype(values.dtype)
    if values.shape[0]:
        prod = values * x.astype(values.dtype)[colidx]
        acc = acc + jax.ops.segment_sum(prod, rowids, num_segments=num_rows)
    if diag is not None:
        k = min(num_rows, num_columns)
        acc = acc.at[:k].add(diag[:k] * x.astype(values.dtype)[:k])
    return acc


def csr_spmv_xla(csr, x, y=None):
    """y := A*x + y for a CsrMatrix."""
    return _csr_spmv(jnp.asarray(csr.colidx), jnp.asarray(csr.values),
                     jnp.asarray(csr.rowids),
                     None if csr.diag is None else jnp.asarray(csr.diag),
                     jnp.asarray(x), None if y is None else jnp.asarray(y),
                     csr.num_rows, csr.num_columns)
