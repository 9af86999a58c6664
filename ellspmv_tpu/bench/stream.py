"""Measured HBM peak: a STREAM-style triad timed by loop-length slope.

The reference compares SpMV bandwidth against a quoted theoretical peak
(README:144-146, 256 GB/s for 2×Xeon 6130). On TPU we can do better: measure
the achievable copy bandwidth on the actual chip and report roofline
fractions against both the measured and the theoretical peak.

Hardened to the calibrator's standard (bench/calibrate.py:139-158; VERDICT
r2 item 6 — the old single-slope 256 MB version had the same hazard class
that once cached a 1e8 GB/s "HBM rate"):

- >=288 MB working set (two carries + temp) so the loop carry cannot stay
  VMEM-resident and measure VMEM instead of HBM;
- median of 5 slope trials (one tunnel-jittered pair cannot poison it);
- plausibility gate: an impossible reading degrades to the nominal peak
  from the device table instead of being returned.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def measure_peak_bandwidth(size_mb: int = 288, iters: int = 64,
                           log=None) -> float:
    """Achievable HBM bandwidth in bytes/s from a chained triad
    (out = b + 0.5*a: 2 reads + 1 write per iteration), measured as the
    median of 5 two-point loop-length slopes."""
    from ellspmv_tpu.config import hbm_peak_bytes_per_s

    n = size_mb * 1024 * 1024 // 4 // 3       # 3 arrays in flight
    a = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))

    @jax.jit
    def triad(a, b, iters):
        def body(_, c):
            a_, b_ = c
            return b_ + a_ * 0.5, a_
        return jax.lax.fori_loop(0, iters, body, (a, b))

    lo, hi = max(2, iters // 16), iters
    _sync(triad(a, b, lo)); _sync(triad(a, b, hi))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter(); _sync(triad(a, b, lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); _sync(triad(a, b, hi))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (hi - lo))
    slopes.sort()
    per_iter = max(slopes[len(slopes) // 2], 1e-9)
    bw = 3 * n * 4 / per_iter

    nominal = hbm_peak_bytes_per_s()
    # no real chip streams below 5% or above 120% of its nominal HBM peak;
    # outside that the measurement is tunnel jitter — report nominal
    if not (0.05 * nominal <= bw <= 1.2 * nominal):
        if log:
            log.write(f"measure_peak_bandwidth: {bw / 1e9:.0f} GB/s "
                      f"implausible vs nominal {nominal / 1e9:.0f} GB/s "
                      "(tunnel jitter?); reporting nominal\n")
        return float(nominal)
    return float(bw)
