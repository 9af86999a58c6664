"""Automatic format selection: DIA vs windowed ELL vs SELL-split vs
sort-free routed stream.

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

# Stream cost: ~stream_routed_ns_per_nnz per element when the static
# router replaces the runtime sorts (the usual case; sort rate when
# ELLSPMV_TPU_NO_PERMUTE forces the fallback) plus fixed per-kernel
# overheads (per-device calibration, bench/calibrate.py; measured v5e
# fallbacks).
_STREAM_FIXED_NS = 3e5
# ELL padding acceptance: beyond this blowup the dense slot arrays cost
# more HBM traffic than the stream's sort movement.
_MAX_PAD_RATIO = 4.0
# Measured v5e fallback rates for the unplanned paths (BENCH_NOTES):
# XLA element gathers run ~80 Melem/s and the segment-sum scatter
# ~8 Melem/s — both hardware floors, not tunables.
_XLA_GATHER_NS = 12.5
_SEGSUM_NS = 125.0


def _stream_price(nnz: int, ncols: int | None = None) -> float:
    """Estimated ns per SpMV for the stream format at this nnz.

    The routed rate was measured at ~1M columns, where the product
    kernel's per-tile window span sits at its column-density floor
    (ks_mean ~6.4). Beyond ~1.5M columns the builder column-chunks the
    stream (formats/stream.py): each chunk's per-tile span returns to
    ~span_chunk/262144 at the cost of one extra merge sum level over the
    per-chunk partials. Price both effects: the products share scales
    with the predicted chunked span, and chunked instances pay a merge
    surcharge proportional to the forwarded-partial fraction."""
    import os

    from ellspmv_tpu.bench import calibrate
    rate_name = ("stream_ns_per_nnz"
                 if os.environ.get("ELLSPMV_TPU_NO_PERMUTE")
                 else "stream_routed_ns_per_nnz")
    rate = calibrate.get(rate_name)
    if ncols and rate_name == "stream_routed_ns_per_nnz" and nnz > 0:
        BLOCK = 128 * 128
        span_max = int(os.environ.get("ELLSPMV_TPU_STREAM_SPAN",
                                      "262144"))
        n_chunks = max(1, -(-ncols // span_max))
        n_chunks = min(n_chunks, max(1, -(-nnz // (32 * BLOCK))))
        span_c = -(-ncols // n_chunks)
        nnz_c = max(nnz // n_chunks, 1)
        n_blocks = -(-nnz_c // BLOCK)
        n_groups = max(-(-n_blocks // 128), 1)
        ks_pred = 1024.0 * span_c * n_groups / nnz_c / 128.0
        # products were ~27% of the measured 1M pipeline at ks ~6.4
        rate *= 0.73 + 0.27 * max(ks_pred, 6.4) / 6.4
        if n_chunks > 1:
            # merge level: ~one partial per (touched row, chunk) streams
            # through a second route+sum — bounded by nnz, shrinking
            # when rows confine to single chunks
            rate *= 1.0 + 0.35 * min(1.0, ncols / max(nnz / 6.5, 1))
    return rate * nnz + _STREAM_FIXED_NS


def _price_sell(sm, dd: bool) -> float:
    """Estimated ns per SpMV for a SellMatrix: per-bucket planner cycle
    estimates (XLA gather rate for plan-less buckets), the CSR tail's
    segment-sum scatter, and the reassembly passes at the calibrated HBM
    rate. Host-side only — no device arrays are built for rejected
    candidates."""
    from ellspmv_tpu.bench import calibrate
    from ellspmv_tpu.ops import plan as plan_mod

    vb = 8 if dd else 4
    cyc = calibrate.get("cycles_per_s")
    hbm_per_s = calibrate.get("hbm_bytes_per_cycle") * cyc
    ns = _STREAM_FIXED_NS        # a few fixed kernel launches
    for b in sm.buckets:
        p = plan_mod.best_plan(
            b, value_dtype=np.float64 if dd else np.float32)
        if p is None:
            ns += b.ellsize * _XLA_GATHER_NS
        else:
            est = plan_mod.estimate_cycles(p, vb, dd) / cyc * 1e9
            ks_exec = (float(p.qb[:, 1, :].max(axis=0).mean())
                       if p.qb.size else p.KS)
            if ks_exec > 16:
                # Deep select-scans (random columns: each slot scans ~the
                # whole window): the cycle model's gather-op count
                # underestimates the dynamic slot loop ~6x there —
                # measured on the power-law windowed hybrid's degenerate
                # rest buckets (BENCH_NOTES round 1, 19 of 27.4 ms in the
                # two widest buckets vs the model's ~3 ms).
                est *= 6.0
            ns += est
    if sm.tail is not None:
        ns += sm.tailsize * _SEGSUM_NS
    n_sub = sm.num_sub_rows if sm.num_sub_rows is not None else sm.num_rows
    if not sm.trivial_reassembly:
        ns += 3 * n_sub * vb / hbm_per_s * 1e9
    if sm.extra_rows is not None:
        ns += 3 * len(np.asarray(sm.extra_rows)) * vb / hbm_per_s * 1e9
    return ns


def auto_from_coo(coo: CooMatrix, separate_diagonal: bool = False,
                  sort_rows: bool = True, value_dtype=None,
                  index_dtype=None, allow_dia: bool = True):
    """Return the cheapest of (DIA, planned ELLPACK, SELL-split, stream)
    for this matrix, priced with the per-device calibration.

    The decision is recorded on the returned matrix as `_auto_choice`
    ('dia', 'ell', 'sell' or 'stream') with `_auto_reason` for verbose
    reporting.
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

    from ellspmv_tpu.bench import calibrate

    if ellsize > _MAX_PAD_RATIO * nnz and ellsize > 1 << 20:
        # ELLPACK is dead (rows x max-row-nnz padding, ellspmv.c:955).
        # Two live candidates: the sort-free routed stream, and the SELL
        # length-sort + long-row split (few ultra-long rows over a LOCAL
        # bulk — the dense-rows class). Measured v5e round 3 on that
        # class at 1M rows: routed stream 6.80 ms vs SELL 30.6 ms
        # (benchmarks/r3_hw_log.txt) — the routed rate usually wins; the
        # price competition stays so a genuinely narrow-windowed SELL
        # split can still take it. Hub-hybrid is subsumed: its rest part
        # is priced exactly like these buckets and its hub gather passes
        # make it strictly worse on v5e (BENCH_NOTES: 27.4 ms hybrid vs
        # 1.7 ms stream at 125k rows).
        blow = f"ELL padding blowup ({ellsize:,} slots for {nnz:,} nonzeros)"
        stream_ns = _stream_price(nnz, coo.num_columns)
        from ellspmv_tpu.formats.sell import sell_from_coo
        try:
            sell = sell_from_coo(coo, sort_rows=True, length_sort=True,
                                 value_dtype=value_dtype,
                                 index_dtype=index_dtype)
            sell_ns = _price_sell(sell, dd)
        except MemoryError:
            sell, sell_ns = None, float("inf")
        if sell is not None and sell_ns < stream_ns:
            object.__setattr__(sell, "_auto_choice", "sell")
            object.__setattr__(
                sell, "_auto_reason",
                f"{blow}; SELL split (est {sell_ns / 1e6:.3f} ms <= "
                f"stream {stream_ns / 1e6:.3f} ms)")
            return sell
        return pick_stream(
            f"{blow}"
            + (f"; stream (est {stream_ns / 1e6:.3f} ms < SELL "
               f"{sell_ns / 1e6:.3f} ms)" if sell is not None else ""))

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
    stream_ns = _stream_price(nnz, coo.num_columns)
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
