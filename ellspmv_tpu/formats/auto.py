"""Automatic format selection: windowed ELL vs sort-based stream.

The reference dispatches kernels on user flags (ellspmv.c:1834-1843); the
TPU build adds a structural auto-tuner. The choice that matters on TPU is
column locality:

- matrices whose (sorted) rows have quasi-local columns get a windowed
  Pallas ELL plan (narrow per-slot gather windows) — the fast path for
  stencils, banded and FEM matrices;
- power-law/random-column matrices either explode ELLPACK's padding
  (ellsize = rows x max row nnz, ellspmv.c:955) or defeat the windows,
  and run fastest through the sort-based stream format.

`auto_from_coo` builds the ELL plan when padding is acceptable, prices it
with the planner's cycle model, prices the stream path with measured v5e
sort throughput, and returns the cheaper matrix.
"""

from __future__ import annotations

import numpy as np

from ellspmv_tpu.formats.coo import CooMatrix

# Stream cost: ~stream_ns_per_nnz per element (per-device calibration,
# bench/calibrate.py; measured v5e fallback) plus fixed per-kernel
# overheads.
_STREAM_FIXED_NS = 3e5
# ELL padding acceptance: beyond this blowup the dense slot arrays cost
# more HBM traffic than the stream's sort movement.
_MAX_PAD_RATIO = 4.0


def auto_from_coo(coo: CooMatrix, separate_diagonal: bool = False,
                  sort_rows: bool = True, value_dtype=None,
                  index_dtype=None, allow_dia: bool = True):
    """Return the cheaper of (planned ELLPACK, stream) for this matrix.

    The decision is recorded on the returned matrix as `_auto_choice`
    ('ell' or 'stream') with `_auto_reason` for verbose reporting.
    """
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.formats.stream import stream_from_coo
    from ellspmv_tpu.ops import ell_pallas
    from ellspmv_tpu.ops import plan as plan_mod

    expanded = coo.expand_symmetry()
    n = expanded.num_rows
    nnz = max(expanded.num_nonzeros, 1)
    counts = (np.bincount(expanded.rowidx, minlength=n)
              if n else np.zeros(0, int))
    rowsize = int(counts.max()) if counts.size else 0
    ellsize = n * rowsize
    dd = np.dtype(value_dtype or expanded.values.dtype) == np.float64

    def pick_stream(reason):
        sm = stream_from_coo(coo, separate_diagonal=separate_diagonal,
                             value_dtype=value_dtype)
        object.__setattr__(sm, "_auto_choice", "stream")
        object.__setattr__(sm, "_auto_reason", reason)
        return sm

    if ellsize > _MAX_PAD_RATIO * nnz and ellsize > 1 << 20:
        return pick_stream(
            f"ELL padding blowup ({ellsize:,} slots for {nnz:,} nonzeros)")

    from ellspmv_tpu.bench import calibrate

    # DIA: when the matrix lives on a handful of dense diagonals, the
    # gather-free resident-x kernel is the cheapest formulation; price it
    # by streamed bytes at the calibrated HBM rate
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.ops import dia_pallas
    vb = 8 if dd else 4
    if allow_dia and separate_diagonal is False and nnz >= 3 * n:
        dia = dia_from_coo(coo, value_dtype=value_dtype)
        if (dia is not None
                and dia.diasize <= 2 * nnz       # diagonal fill >= 50%
                and dia_pallas.get_plan(dia) is not None):
            hbm_per_s = (calibrate.get("hbm_bytes_per_cycle")
                         * calibrate.get("cycles_per_s"))
            dia_ns = ((dia.diasize + 2 * n) * vb) / hbm_per_s * 1e9
            ell_ns = None
            ell_try = ell_from_coo(coo, sort_rows=sort_rows,
                                   value_dtype=value_dtype,
                                   index_dtype=index_dtype)
            dp_try = ell_pallas.get_plan(ell_try)
            if dp_try is not None:
                ell_ns = (plan_mod.estimate_cycles(dp_try.plan, vb, dd)
                          / calibrate.get("cycles_per_s") * 1e9)
            if ell_ns is None or dia_ns < ell_ns:
                object.__setattr__(dia, "_auto_choice", "dia")
                object.__setattr__(
                    dia, "_auto_reason",
                    f"{dia.num_diags} dense diagonals (est "
                    f"{dia_ns / 1e6:.3f} ms"
                    + (f" <= ELL {ell_ns / 1e6:.3f} ms)" if ell_ns
                       else ", no ELL plan)"))
                return dia
            # ELL beat DIA: fall through to the ELL-vs-stream pricing
    ell = ell_from_coo(coo, separate_diagonal=separate_diagonal,
                       sort_rows=sort_rows, value_dtype=value_dtype,
                       index_dtype=index_dtype)
    dp = ell_pallas.get_plan(ell)
    stream_ns = calibrate.get("stream_ns_per_nnz") * nnz + _STREAM_FIXED_NS
    if dp is None:
        # no windowed plan (no column locality): XLA fallback would gather
        # element-wise (~80M elem/s on v5e) — stream wins beyond tiny n
        if nnz * 12.5 > stream_ns:
            return pick_stream("no windowed plan (no column locality)")
        choice, reason = "ell", "tiny matrix (XLA fallback acceptable)"
    else:
        ell_ns = (plan_mod.estimate_cycles(dp.plan, 8 if dd else 4, dd)
                  / calibrate.get("cycles_per_s") * 1e9)
        if ell_ns > stream_ns:
            return pick_stream(
                f"windowed plan too wide (est {ell_ns / 1e6:.2f} ms vs "
                f"stream {stream_ns / 1e6:.2f} ms)")
        choice = "ell"
        reason = (f"windowed plan (est {ell_ns / 1e6:.3f} ms <= stream "
                  f"{stream_ns / 1e6:.3f} ms)")
    object.__setattr__(ell, "_auto_choice", choice)
    object.__setattr__(ell, "_auto_reason", reason)
    return ell
