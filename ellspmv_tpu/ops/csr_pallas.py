"""Pallas CSR SpMV kernel (placeholder — implemented in the kernel
milestone)."""

from __future__ import annotations


def csr_spmv_pallas(csr, x, y=None):
    raise NotImplementedError("pallas CSR kernel not yet built")
