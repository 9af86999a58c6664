"""Physical per-iteration HBM traffic from the device plan.

The reference's byte accounting (min_bytes/max_bytes, ellspmv.c:1858-1862)
is a FORMAT-INDEPENDENT model: x once (min) or per nonzero (max) over the
padded ELLPACK arrays with their nominal dtypes. Our kernels move
different bytes — double-double f32 pairs instead of f64 values, int8/int16
local columns instead of int32 indices, and per-tile x-window DMAs instead
of element gathers — so a format that stores less than ELLPACK (DIA stores
no column indices at all) legitimately reports an *effective* bandwidth
above the raw HBM line. That number is the right parity metric against the
reference's 148 GB/s, but on its own it reads like a broken roofline.

This module computes the ACTUAL bytes the planned kernel moves per SpMV so
every report can carry both columns:

- effective GB/s = reference min-bytes model / time (parity metric);
- actual GB/s   = plan traffic / time (physical roofline, <= HBM peak).

Counted per iteration: every plan operand array once (they stream HBM->VMEM
each call), the x window DMA per tile (or once for resident-x plans), and
the y write. Host-side or XLA-fallback paths have no plan to count and
return None — reports then omit the physical column rather than invent one.
"""

from __future__ import annotations

import numpy as np


def _arr_bytes(*arrays) -> int:
    total = 0
    for a in arrays:
        if a is None:
            continue
        total += int(np.prod(a.shape)) * np.dtype(a.dtype).itemsize
    return total


def _ell_plan_bytes(dp) -> int:
    """Traffic of one windowed-ELL Pallas kernel call (DevicePlan)."""
    c = dp.cfg
    vb = 4 * (2 if c.dd else 1)       # f32 payload, hi+lo pair when dd
    ops = _arr_bytes(dp.lcol, dp.qb, dp.wbase128, *dp.vals)
    xw = (1 if c.static else c.T) * c.K128 * 128 * vb
    y = c.n_out * vb
    return ops + xw + y


def _dia_plan_bytes(dp) -> int:
    """Traffic of one windowed/resident DIA kernel call (DiaDevicePlan)."""
    c = dp.cfg
    vb = 4 * (2 if c["dd"] else 1)
    ops = _arr_bytes(*dp.vals)
    if c.get("w128"):
        xw = c["T"] * c["w128"] * 128 * vb      # per-tile window DMA
    else:
        xw = c["nx128"] * 128 * vb              # resident image, DMA'd once
    return ops + xw + c["n"] * vb


def _cached_ell_plan(ell):
    dp = getattr(ell, "_pallas_plan_cache", None)
    return dp if dp is not None and dp != "unsupported" else None


def _cached_dia_plan(dia):
    dp = getattr(dia, "_dia_device_plan", None)
    return dp if dp is not None and dp != "unsupported" else None


def estimate_actual_bytes(matrix) -> int | None:
    """Physical bytes per SpMV for `matrix`'s planned kernel, or None when
    no device plan exists (XLA fallback paths — their gather traffic is
    data-dependent and not modeled here)."""
    from ellspmv_tpu.formats.csr import CsrMatrix
    from ellspmv_tpu.formats.dia import DiaMatrix
    from ellspmv_tpu.formats.ell import EllMatrix
    from ellspmv_tpu.formats.hybrid import HybridMatrix
    from ellspmv_tpu.formats.sell import SellMatrix
    from ellspmv_tpu.formats.stream import StreamMatrix

    if isinstance(matrix, EllMatrix):
        dp = _cached_ell_plan(matrix)
        if dp is None:
            return None
        total = _ell_plan_bytes(dp)
        if matrix.diag is not None:
            # split-diagonal epilogue: read ad + x[i], accumulate into y
            vb = np.dtype(np.asarray(matrix.values).dtype).itemsize
            total += 3 * matrix.num_rows * vb
        return total

    if isinstance(matrix, DiaMatrix):
        dp = _cached_dia_plan(matrix)
        if dp is None:
            return None
        return _dia_plan_bytes(dp)

    if isinstance(matrix, SellMatrix):
        total = 0
        for b in matrix.buckets:
            sub = estimate_actual_bytes(b)
            if sub is None:
                return None
            total += sub
        vb = np.dtype(np.asarray(matrix.values).dtype).itemsize
        if matrix.tail is not None:
            # XLA tail: colidx + values + gathered x + y accumulate
            total += _arr_bytes(matrix.tail.colidx, matrix.tail.values)
            total += 2 * int(np.asarray(matrix.tail.colidx).size) * vb
        if not matrix.trivial_reassembly:
            # row-take reassembly pass: read tiles + order, write rows
            n_sub = (matrix.num_sub_rows if matrix.num_sub_rows is not None
                     else matrix.num_rows)
            total += 2 * n_sub * vb + _arr_bytes(matrix.order)
        if matrix.extra_rows is not None:
            total += 3 * matrix.num_rows * vb
        return total

    if isinstance(matrix, CsrMatrix):
        sm = getattr(matrix, "_sell_cache", None)
        if sm is None:
            return None
        total = estimate_actual_bytes(sm)
        if total is None:
            return None
        if matrix.diag is not None:
            vb = np.dtype(np.asarray(matrix.values).dtype).itemsize
            total += 3 * matrix.num_rows * vb
        return total

    if isinstance(matrix, HybridMatrix):
        rest = estimate_actual_bytes(matrix.rest)
        if rest is None:
            return None
        total = rest
        if matrix.hub is not None:
            hub = estimate_actual_bytes(matrix.hub)
            if hub is None:
                return None
            vb = np.dtype(np.asarray(matrix.values).dtype).itemsize
            total += hub + _arr_bytes(matrix.hub_cols)
            total += 2 * int(np.asarray(matrix.hub_cols).size) * vb
        return total

    if isinstance(matrix, StreamMatrix):
        vb = 8 if matrix.dd else 4      # dd pairs move 8 B/elem
        if matrix.prod is not None:
            total = _ell_plan_bytes(matrix.prod)   # incl. product write
        elif matrix.prod_cols is not None:
            total = _arr_bytes(matrix.prod_cols, matrix.prod_vals)
            total += 2 * matrix.prod_len * vb   # gathered x + product write
        else:
            return None
        # route + sum passes, counted EXACTLY from the plan shapes
        # (VERDICT r3 item 4 — no modeled constants). Sort-path levels
        # have data-dependent comparator-network traffic we do not model:
        # report no physical column at all rather than an estimate.
        npay = 2 if matrix.dd else 1       # dd = separate hi/lo f32 arrays
        levels = matrix.ddsum.levels
        if any(lv.perm is None for lv in levels) \
                or matrix.ddsum.final_perm is None:
            return None
        for lv in levels:
            total += _perm_bytes(lv.perm, npay)
            for b in lv.buckets:
                # per grid step: window DMA read + output tile write;
                # estart/oc metadata counted explicitly
                total += 4 * npay * b.T * (b.K * 128 + b.sub * 8 * 128)
                total += _arr_bytes(b.estart, b.oc)
        # parts concat (one write of the terminal stream) + final route
        n_parts = sum(lv.out_len - lv.multi_len for lv in levels)
        total += 4 * npay * n_parts
        total += _perm_bytes(matrix.ddsum.final_perm, npay)
        total += matrix.num_rows * vb      # y merge/write
        if matrix.diag is not None:
            total += 3 * matrix.num_rows * vb
        return total

    return None


def _perm_bytes(p, npay: int) -> int:
    """Exact traffic of one static-router application (ops/permute.py)
    with `npay` f32 payload arrays: W1 reads the stream + its maps and
    writes the mid half-blocks; take reads the gathered mid rows + gsrc
    and writes the (padded) taken layout; W2 reads taken + its maps and
    writes the routed stream."""
    BLOCK = 128 * 128
    payload = 4 * npay * BLOCK * (p.NBi * (1 + p.HA)       # W1 in + mid out
                                  + p.NBo * p.HB * 3       # take r/w + W2 in
                                  + p.NBo)                 # W2 out
    maps = _arr_bytes(p.l1, p.q1, p.gsrc, p.l1b, p.q2, p.l3)
    return payload + maps
