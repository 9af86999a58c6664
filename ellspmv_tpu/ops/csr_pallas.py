"""Pallas-backed CSR SpMV.

The reference's CSR kernels walk rowptr per row (csrgemv,
csrspmv.c:1588-1593) — a memory-latency-bound pattern with no TPU analogue.
The TPU-native realization reuses the windowed-gather machinery: the CSR
entries are repacked (host-side, once, cached on the CsrMatrix) into the
sliced-ELL hybrid, whose buckets run the Pallas ELL kernel; ultra-long rows
fall to the segment-sum tail. This is the same relationship csrgemvnz has
to csrgemv in the reference (a different schedule over identical data,
csrspmv.c:1681-1761) — here the schedule is chosen for the hardware rather
than per CLI flag.
"""

from __future__ import annotations

import numpy as np

_SELL_ATTR = "_sell_cache"


def _to_sell(csr):
    cached = getattr(csr, _SELL_ATTR, None)
    if cached is not None:
        return cached
    from ellspmv_tpu.formats.coo import CooMatrix
    from ellspmv_tpu.formats.sell import sell_from_coo

    coo = CooMatrix(csr.num_rows, csr.num_columns,
                    np.asarray(csr.rowids), np.asarray(csr.colidx),
                    np.asarray(csr.values))
    sm = sell_from_coo(coo, value_dtype=np.asarray(csr.values).dtype)
    object.__setattr__(csr, _SELL_ATTR, sm)
    return sm


def csr_spmv_pallas(csr, x, y=None):
    """y := A*x + y through the sliced-ELL repack + Pallas kernels (with
    the split diagonal applied as an epilogue, csrgemvsd semantics
    csrspmv.c:1598-1629)."""
    import jax.numpy as jnp

    from ellspmv_tpu.formats.sell import sell_spmv

    sm = _to_sell(csr)
    out = sell_spmv(sm, x, None)
    if csr.diag is not None:
        val_dt = out.dtype
        k = min(csr.num_rows, csr.num_columns)
        d = jnp.asarray(csr.diag)[:k]
        out = out.at[:k].add(d * jnp.asarray(x).astype(val_dt)[:k])
    if y is not None:
        out = out + jnp.asarray(y).astype(out.dtype)
    return out
