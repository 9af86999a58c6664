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


def traceable_spmv(matrix, backend: str = "auto"):
    """Return (operand_pytree, fn) where ``fn(operand, x, y|None) -> y`` can
    be traced inside an outer jit with the matrix data passed as jit
    ARGUMENTS. Closing over a large matrix inside jit embeds its arrays as
    constants in the compiled program (hundreds of MB of HLO); benchmark
    loops and solvers use this instead."""
    import jax
    import jax.numpy as jnp

    if isinstance(matrix, EllMatrix) and backend in ("auto", "pallas"):
        from ellspmv_tpu.ops import ell_pallas
        on_tpu = jax.devices()[0].platform == "tpu"
        import os
        if on_tpu or os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET"):
            dp = ell_pallas.get_plan(matrix)
            if dp is not None:
                n, m = matrix.num_rows, matrix.num_columns
                val_dt = jnp.asarray(matrix.values).dtype
                diag = None if matrix.diag is None                     else jnp.asarray(matrix.diag)[:n]
                xi = None if diag is None                     else jnp.minimum(jnp.arange(n), max(m - 1, 0))

                def fn(op, x, y=None):
                    dp_, diag_ = op
                    out = dp_(x)[:n].astype(val_dt)
                    if diag_ is not None:
                        out = out + diag_ * x.astype(val_dt)[xi]
                    if y is not None:
                        out = out + y.astype(val_dt)
                    return out

                return (dp, diag), fn
        if backend == "pallas":
            raise ValueError("pallas backend unsupported for this "
                             "matrix/platform")
    # XLA paths: the matrix containers are pytrees already
    if isinstance(matrix, (EllMatrix, CsrMatrix, DiaMatrix)):
        return matrix, lambda m, x, y=None: spmv(m, x, y, backend="xla")
    raise TypeError(f"no traceable spmv for {type(matrix)}")
