"""Pallas ELLPACK SpMV kernel (placeholder — implemented in the kernel
milestone; `supported` gates dispatch)."""

from __future__ import annotations


def supported(ell, x) -> bool:
    return False


def ell_spmv_pallas(ell, x, y=None):
    raise NotImplementedError("pallas ELL kernel not yet built")
