"""Benchmark harness: warmup + timed repeat loop with the reference's exact
metric accounting, plus an HBM roofline (the TPU replacement for the
reference's PAPI hardware-counter region, SURVEY §5).

Metric formulas are byte-for-byte those of the reference:

- ELL (ellspmv.c:1857-1862):
    flops     = 2*(ellsize + diagsize)          # diagsize counted always
    min_bytes = rows*sv + cols*sv + ellsize*si + ellsize*sv + diagsize*sv
    max_bytes = rows*sv + ellsize*sv + ellsize*si + ellsize*sv
                + diagsize*sv + diagsize*sv     # x re-read per nonzero
- CSR (csrspmv.c:2882-2887): same plus rowptr bytes ((rows+1)*si min,
    rows*si max).
- Gnz/s uses the file's stored nonzero count (ellspmv.c:1871).

Two timing protocols:

- ``per_iter``: one device dispatch per iteration, synchronized — the
  reference's protocol (t0 before kernel, t1 after the barrier,
  ellspmv.c:1825-1847). Reported per-iteration times include host dispatch
  overhead, which on a remote-tunneled TPU is tens of ms.
- ``chained``: `repeat` iterations run inside one jitted `lax.fori_loop`
  with a forced serial dependency (x_{k+1} = scale*y_k), timed at two loop
  lengths; the slope isolates pure device time per iteration. This is the
  protocol `bench.py` uses for roofline numbers.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ellspmv_tpu.bench.traffic import estimate_actual_bytes
from ellspmv_tpu.config import hbm_peak_bytes_per_s
from ellspmv_tpu.formats.csr import CsrMatrix
from ellspmv_tpu.formats.ell import EllMatrix


@dataclasses.dataclass
class SpmvMetrics:
    """Static per-iteration work accounting (reference formulas)."""
    num_nonzeros: int      # stored entries in the file (Gnz/s numerator)
    num_flops: int
    min_bytes: int
    max_bytes: int

    @staticmethod
    def for_matrix(matrix) -> "SpmvMetrics":
        if isinstance(matrix, EllMatrix):
            sv = np.dtype(matrix.values.dtype).itemsize
            si = np.dtype(matrix.colidx.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            ellsize, diagsize = matrix.ellsize, matrix.diagsize
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * (ellsize + diagsize),
                min_bytes=(n * sv + m * sv + ellsize * si + ellsize * sv
                           + diagsize * sv),
                max_bytes=(n * sv + ellsize * sv + ellsize * si
                           + ellsize * sv + diagsize * sv + diagsize * sv))
        if isinstance(matrix, CsrMatrix):
            sv = np.dtype(matrix.values.dtype).itemsize
            si = np.dtype(matrix.rowptr.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            csrsize, diagsize = matrix.csrsize, matrix.diagsize
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * (csrsize + diagsize),
                min_bytes=(n * sv + m * sv + (n + 1) * si + csrsize * si
                           + csrsize * sv + diagsize * sv),
                max_bytes=(n * sv + csrsize * sv + n * si + csrsize * si
                           + csrsize * sv + diagsize * sv + diagsize * sv))
        from ellspmv_tpu.formats.hybrid import HybridMatrix
        if isinstance(matrix, HybridMatrix):
            sv = np.dtype(matrix.values.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            work = (matrix.rest.sellsize + matrix.rest.tailsize
                    + (0 if matrix.hub is None
                       else matrix.hub.sellsize + matrix.hub.tailsize))
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * work,
                min_bytes=n * sv + m * sv + work * (4 + sv),
                max_bytes=n * sv + work * (4 + 2 * sv))
        from ellspmv_tpu.formats.sell import SellMatrix
        if isinstance(matrix, SellMatrix):
            sv = np.dtype(matrix.values.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            work = matrix.sellsize + matrix.tailsize
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * work,
                min_bytes=n * sv + m * sv + work * (4 + sv),
                max_bytes=n * sv + work * (4 + 2 * sv))
        from ellspmv_tpu.formats.stream import StreamMatrix
        if isinstance(matrix, StreamMatrix):
            # padding-free: every stored entry is moved once as a 4-byte
            # key + value through the sort and once through the sum kernel
            sv = np.dtype(matrix.values.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            work = matrix.worksize
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * work,
                min_bytes=n * sv + m * sv + work * (4 + sv),
                max_bytes=n * sv + work * (4 + 2 * sv))
        from ellspmv_tpu.formats.dia import DiaMatrix
        if isinstance(matrix, DiaMatrix):
            # DIA accounting (no reference analogue): stored diagonal values
            # all participate; no column indices are read at all.
            sv = np.dtype(matrix.data.dtype).itemsize
            n, m = matrix.num_rows, matrix.num_columns
            diasize = matrix.diasize
            return SpmvMetrics(
                num_nonzeros=matrix.num_nonzeros,
                num_flops=2 * diasize,
                min_bytes=n * sv + m * sv + diasize * sv,
                max_bytes=n * sv + diasize * sv + diasize * sv)
        raise TypeError(f"unsupported matrix type {type(matrix)}")


@dataclasses.dataclass
class BenchResult:
    times: list[float]          # seconds per timed iteration
    metrics: SpmvMetrics
    y: jax.Array | None         # result after warmup+timed iterations
    protocol: str
    hbm_peak: float             # bytes/s roofline denominator
    warning: str | None = None  # e.g. dispatch-dominated per_iter timing
    span_iters: int | None = None   # chained: iterations in the timed span
    actual_bytes: int | None = None  # physical traffic/iter (device plan)

    @property
    def best(self) -> float:
        return min(self.times)

    def gnz_per_s(self, t=None) -> float:
        return self.metrics.num_nonzeros * 1e-9 / (t or self.best)

    def gflop_per_s(self, t=None) -> float:
        return self.metrics.num_flops * 1e-9 / (t or self.best)

    def min_gb_per_s(self, t=None) -> float:
        return self.metrics.min_bytes * 1e-9 / (t or self.best)

    def max_gb_per_s(self, t=None) -> float:
        return self.metrics.max_bytes * 1e-9 / (t or self.best)

    def roofline_fraction(self) -> float:
        """Achieved effective bandwidth (min-bytes model) / HBM peak."""
        return self.metrics.min_bytes / self.best / self.hbm_peak

    def actual_gb_per_s(self, t=None) -> float | None:
        """Physical HBM traffic rate (device-plan byte count), or None when
        no plan-based accounting exists for this matrix/kernel."""
        if self.actual_bytes is None:
            return None
        return self.actual_bytes * 1e-9 / (t or self.best)

    def physical_roofline(self) -> float | None:
        """Actual traffic / HBM peak — always <= ~1, unlike the effective
        (min-bytes-model) roofline, which formats that move fewer bytes
        than ELLPACK's minimum legitimately exceed."""
        if self.actual_bytes is None:
            return None
        return self.actual_bytes / self.best / self.hbm_peak

    def iteration_lines(self) -> list[str]:
        """Per-iteration report in the reference's format
        (ellspmv.c:1868-1875). Under the chained protocol there are no
        individual iteration timestamps — the measurement is ONE slope over
        a long in-jit span — so print it once, labeled as a slope, instead
        of `repeat` synthetic copies."""
        if self.protocol == "chained":
            t = self.best
            span = f" over a {self.span_iters}-iteration chained span" \
                if self.span_iters else ""
            return [
                f"{t:.9f} seconds/iteration (slope{span}; "
                f"{self.gnz_per_s(t):.3f} Gnz/s, "
                f"{self.gflop_per_s(t):.3f} Gflop/s, "
                f"{self.min_gb_per_s(t):.1f} to {self.max_gb_per_s(t):.1f} "
                f"GB/s)"]
        out = []
        for t in self.times:
            out.append(
                f"{t:.6f} seconds ({self.gnz_per_s(t):.3f} Gnz/s, "
                f"{self.gflop_per_s(t):.3f} Gflop/s, "
                f"{self.min_gb_per_s(t):.1f} to {self.max_gb_per_s(t):.1f} "
                f"GB/s)")
        return out


def _sync(x):
    # Through the axon remote tunnel, block_until_ready can return before
    # device completion; a 1-element device->host fetch is a true fence.
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def _timed_call(fn, *args) -> float:
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


def _dispatch_warning(best: float, dispatch: float) -> str | None:
    """Per-iteration times under 3x the host->device round trip measure
    dispatch, not the kernel (the remote tunnel adds ~30 ms per call)."""
    if best < 3 * dispatch:
        return (f"per-iteration times are dispatch-dominated (dispatch "
                f"round trip ~{dispatch * 1e3:.1f} ms); use "
                "--protocol=chained for kernel-time measurements")
    return None


def benchmark_spmv(spmv_fn: Callable | None, matrix, x, y=None,
                   repeat: int = 1, warmup: int = 0,
                   protocol: str = "per_iter",
                   device=None, metrics_matrix=None,
                   metrics: SpmvMetrics | None = None) -> BenchResult:
    """Benchmark `spmv_fn(matrix, x, y) -> y_new`. `spmv_fn=None` uses the
    library dispatch (and, in the chained protocol, the traceable form that
    keeps matrix data out of the compiled program's constants).

    per_iter: mirrors the reference loop — `warmup` untimed iterations
    (ellspmv.c:1745-1801) then `repeat` timed ones, accumulating into y.
    chained: y-accumulation with a serial x-dependency inside one jit;
    returns `repeat` copies of the slope time.
    """
    if metrics is None:
        metrics = SpmvMetrics.for_matrix(
            matrix if metrics_matrix is None else metrics_matrix)
    hbm_peak = hbm_peak_bytes_per_s(device)
    x = jnp.asarray(x)
    if spmv_fn is None and protocol == "per_iter":
        from ellspmv_tpu.ops import spmv as _dispatch
        spmv_fn = lambda m, xv, yv: _dispatch(m, xv, yv)
    if protocol == "per_iter":
        yk = None if y is None else jnp.asarray(y)
        # Compile before the timed loop regardless of --warmup: the
        # reference's iter-1 line is a real kernel because C is precompiled
        # (its whole v1.10 timing fix, ellspmv.c:30-37, exists to time ONLY
        # SpMV); one discarded dispatch per trace signature (y=None and
        # y=array give different traces) plays that role here. --warmup
        # stays about caches/iteration count (ellspmv.c:1745-1801), not
        # codegen.
        d1 = spmv_fn(matrix, x, yk)
        _sync(spmv_fn(matrix, x, d1))
        for _ in range(warmup):
            yk = spmv_fn(matrix, x, yk)
        _sync(yk if yk is not None else x)
        times = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            yk = spmv_fn(matrix, x, yk)
            _sync(yk)
            times.append(time.perf_counter() - t0)
        # warn when the measurement is dominated by host->device dispatch
        # (the remote-tunneled TPU adds ~30 ms per call): time a no-op
        # round trip and compare (csrspmv has no analogue; its timer is
        # in-process, ellspmv.c:1825-1847)
        try:
            noop = jax.jit(lambda v: v + 1)
            z = jnp.zeros((), np.float32)
            _sync(noop(z))
            dispatch = min(_timed_call(noop, z) for _ in range(3))
            warning = _dispatch_warning(min(times), dispatch)
        except Exception:
            warning = None
        return BenchResult(times, metrics, yk, protocol, hbm_peak,
                           warning=warning,
                           actual_bytes=estimate_actual_bytes(
                               matrix if metrics_matrix is None
                               else metrics_matrix))

    if protocol == "chained":
        if matrix.num_rows != matrix.num_columns:
            raise ValueError("chained protocol needs a square matrix "
                             "(x is re-derived from y each iteration)")
        val_dtype = np.asarray(
            getattr(matrix, "values", getattr(matrix, "data", None))).dtype
        # the chained carry must be dtype-stable: iterate at the matrix's
        # value dtype (an f32 kernel returns f32 y, which becomes the next
        # x — an f64 x0 would flip the carry dtype after one iteration)
        x = x.astype(val_dtype)
        # small enough that ||A||*scale < 1 for any realistic matrix: the
        # chained y would otherwise grow by (scale*||A||)^k and overflow in
        # long adaptive runs (values don't affect TPU timing)
        scale = jnp.asarray(1e-6, val_dtype)

        # Pass the matrix data as jit ARGUMENTS: closing over it inside the
        # loop would embed the arrays as constants in the compiled program.
        dd_chain = None
        if spmv_fn is None:
            if val_dtype == np.float64:
                # fp64 iterations carry double-double (f32 hi/lo) pairs —
                # the framework's native f64 representation (cg_dd keeps
                # its vectors this way end-to-end). Same 8 B/elem moved;
                # the per-iteration f64<->dd split/merge passes (up to
                # ~half the traffic on low-arity matrices) vanish. One
                # split at entry and one merge at exit sit outside the
                # timed slope.
                from ellspmv_tpu.ops.dispatch import traceable_spmv_dd
                dd_chain = traceable_spmv_dd(matrix)
            if dd_chain is not None:
                operand, fn = dd_chain
            else:
                from ellspmv_tpu.ops.dispatch import traceable_spmv
                try:
                    operand, fn = traceable_spmv(matrix)
                except TypeError:
                    # no traceable form (e.g. the SELL hybrid): fall back
                    # to a closure — fine for small/medium matrices
                    from ellspmv_tpu.ops import spmv as _dispatch
                    operand, fn = matrix, (lambda m, xv, yv:
                                           _dispatch(m, xv, yv))
        else:
            tr = getattr(spmv_fn, "traceable", None)
            if tr is not None:
                # e.g. the sharded stream: (operand, fn) with plan arrays
                # as jit arguments instead of closure constants
                operand, fn = tr
            else:
                operand, fn = matrix, spmv_fn

        if dd_chain is not None:
            from ellspmv_tpu.ops.dd_vec import DDVec, dd_from_f64
            scale32 = jnp.asarray(float(scale), jnp.float32)

            def make_loop(iters: int):
                @jax.jit
                def run(x0, y0, op):
                    def body(_, carry):
                        xk, yk = carry
                        yn = fn(op, xk, yk)
                        # serial dependency so XLA cannot hoist or
                        # overlap; componentwise scaling keeps the pair a
                        # valid dd value (each component rounds once)
                        return DDVec(yn.hi * scale32,
                                     yn.lo * scale32), yn
                    return jax.lax.fori_loop(0, iters, body, (x0, y0))
                return run

            x = dd_from_f64(x.astype(jnp.float64))
            zero = DDVec(jnp.zeros(matrix.num_rows, jnp.float32),
                         jnp.zeros(matrix.num_rows, jnp.float32))
            y0 = zero if y is None \
                else dd_from_f64(jnp.asarray(y, jnp.float64))
        else:
            def make_loop(iters: int):
                @jax.jit
                def run(x0, y0, op):
                    def body(_, carry):
                        xk, yk = carry
                        yn = fn(op, xk, yk)
                        # serial dependency so XLA cannot hoist or overlap
                        return yn * scale, yn
                    return jax.lax.fori_loop(0, iters, body, (x0, y0))
                return run

            y0 = jnp.zeros(matrix.num_rows, val_dtype) if y is None \
                else jnp.asarray(y)

        def measure(lo, hi):
            run_lo, run_hi = make_loop(lo), make_loop(hi + lo)
            _sync(run_lo(x, y0, operand)); _sync(run_hi(x, y0, operand))
            per_iter, out = float("inf"), None
            for _ in range(3):   # best of 3 slope pairs (dispatch jitter)
                t0 = time.perf_counter(); _sync(run_lo(x, y0, operand))
                t_lo = time.perf_counter() - t0
                t0 = time.perf_counter(); out = run_hi(x, y0, operand)
                _sync(out)
                t_hi = time.perf_counter() - t0
                per_iter = min(per_iter, max((t_hi - t_lo) / hi, 1e-12))
            return per_iter, out

        lo, hi = max(1, warmup or 2), max(8, repeat)
        per_iter, out = measure(lo, hi)
        # Rescale so the measured span dwarfs the ~±4 ms dispatch jitter
        # of the remote tunnel: a 50 ms span still gave ±8% slope error
        # (the headline read anywhere in 588-719 GB/s run to run).  Target
        # ~0.3 s, rounded UP to a power of two so the loop-length-dependent
        # compile hits the persistent cache across runs.
        if per_iter * hi < 0.25:
            hi2 = 1 << int(np.ceil(np.log2(0.3 / max(per_iter, 1e-7))))
            hi2 = min(hi2, 4096)
            if hi2 > 2 * hi:
                per_iter, out = measure(lo, hi2)
                hi = hi2
        y_out = out[1]
        if dd_chain is not None:
            from ellspmv_tpu.ops.dd_vec import dd_to_f64
            y_out = dd_to_f64(y_out)
        return BenchResult([per_iter] * repeat, metrics, y_out, protocol,
                           hbm_peak, span_iters=hi,
                           actual_bytes=estimate_actual_bytes(
                               matrix if metrics_matrix is None
                               else metrics_matrix))

    raise ValueError(f"unknown protocol {protocol!r}")
