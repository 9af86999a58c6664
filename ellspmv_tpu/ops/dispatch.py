"""Kernel dispatch — the analogue of the reference's flag dispatch in main
(ellspmv.c:1834-1843, csrspmv.c:2851-2868), keyed on format and backend."""

from __future__ import annotations

from ellspmv_tpu.formats.csr import CsrMatrix
from ellspmv_tpu.formats.dia import DiaMatrix, dia_spmv
from ellspmv_tpu.formats.ell import EllMatrix
from ellspmv_tpu.formats.sell import SellMatrix, sell_spmv


def spmv(matrix, x, y=None, backend: str = "auto"):
    """y := A*x + y.

    backend: 'auto' | 'xla' | 'pallas'. 'auto' prefers the Pallas kernel on
    TPU when the matrix has a precomputed plan (or one can be built) and
    falls back to XLA.
    """
    if isinstance(matrix, DiaMatrix):
        return dia_spmv(matrix, x, y)   # gather-free; XLA streams it
    if isinstance(matrix, SellMatrix):
        return sell_spmv(matrix, x, y, backend=backend)
    if isinstance(matrix, EllMatrix):
        if backend in ("auto", "pallas"):
            from ellspmv_tpu.ops import ell_pallas
            if ell_pallas.supported(matrix, x):
                return ell_pallas.ell_spmv_pallas(matrix, x, y)
            if backend == "pallas":
                raise ValueError("pallas backend unsupported for this "
                                 "matrix/platform")
        from ellspmv_tpu.ops.ell_xla import ell_spmv_xla
        return ell_spmv_xla(matrix, x, y)
    if isinstance(matrix, CsrMatrix):
        if backend == "pallas":
            from ellspmv_tpu.ops import csr_pallas
            return csr_pallas.csr_spmv_pallas(matrix, x, y)
        from ellspmv_tpu.ops.csr_xla import csr_spmv_xla
        return csr_spmv_xla(matrix, x, y)
    raise TypeError(f"unsupported matrix type {type(matrix)}")
