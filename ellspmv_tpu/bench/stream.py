"""Measured HBM peak: a STREAM-style scale kernel timed by loop-length slope.

The reference compares SpMV bandwidth against a quoted theoretical peak
(README:144-146, 256 GB/s for 2×Xeon 6130). On TPU we can do better: measure
the achievable copy bandwidth on the actual chip and report roofline
fractions against both the measured and the theoretical peak.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(x.ravel()[:1])


def measure_peak_bandwidth(size_mb: int = 256, iters: int = 32) -> float:
    """Achievable HBM bandwidth in bytes/s from y = c*x (read n + write n),
    measured as a two-point slope to cancel dispatch overhead."""
    n = size_mb * 1024 * 1024 // 4
    x = jnp.ones(n, jnp.float32)

    def make(k):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, v: v * 1.0000001, x)
        return run

    lo, hi = max(2, iters // 8), iters
    run_lo, run_hi = make(lo), make(hi)
    _sync(run_lo(x)); _sync(run_hi(x))
    t0 = time.perf_counter(); _sync(run_lo(x)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); _sync(run_hi(x)); t_hi = time.perf_counter() - t0
    per_iter = max((t_hi - t_lo) / (hi - lo), 1e-12)
    return 2 * n * 4 / per_iter
