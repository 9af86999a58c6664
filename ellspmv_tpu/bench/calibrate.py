"""Per-device cost-model calibration.

The planner (ops/plan.py) and the auto format chooser (formats/auto.py)
rank candidates with a small cycle model. Round 1 hardcoded its constants
to measured v5e values; on v5p/v6e they would mis-rank tile sizes and
formats (round-1 VERDICT weakness 5). This module measures the two
quantities that actually move the rankings — the HBM stream rate and the
`lax.sort` throughput — once per device kind, caches them in a JSON file,
and serves them (with the v5e values as fallback) to the cost models.

Run the calibration explicitly:

    python -m ellspmv_tpu.bench.calibrate        # measure + save

It never runs implicitly: imports and planning only ever read the cache.
Tests inject synthetic values with `inject({...})`.
"""

from __future__ import annotations

import json
import os
import time

# Measured v5e values (round-1/2 hardware sessions) — the fallback.
#
# vpu_sublane_rows_per_cycle is an EFFECTIVE pipelined rate, refit
# 2026-08-19 from the poisson/banded row-tile sweeps: the round-1 value
# (24, one isolated gather's latency) made the VPU term dominate every
# ranking, so the gather penalty vetoed big row tiles even where the
# VPU work hides entirely under the HBM stream (poisson measured
# 0.095 ms at G=64 vs 0.175 ms at G=8+supertile). 320 is the joint fit
# with _gather_penalty over eight end-to-end points (banded block/32
# G=8/16/32/64, raw S=16 G=8, poisson G=8..64); it reproduces the
# banded exposed-VPU times within ~15% and leaves stencil-class plans
# HBM-bound, matching all measured rankings.
#
# subtile_overhead_cycles: a supertile's inner subtile step (shared-body
# fori + window re-slice) costs ~75 ns on top of the per-grid-step 300
# cycles, fit from poisson rt=1024/sub=8 (0.175 ms) vs rt=8192 (0.095 ms).
DEFAULTS = {
    "hbm_bytes_per_cycle": 870.0,
    "vpu_sublane_rows_per_cycle": 320.0,
    "tile_overhead_cycles": 300.0,
    "subtile_overhead_cycles": 70.0,
    # runtime lax.sort rate — prices the stream's SORT fallback
    # (ELLSPMV_TPU_NO_PERMUTE) and sort-based primitives generally
    "stream_ns_per_nnz": 3.0,
    # end-to-end rate of the ROUTED stream pipeline (static router +
    # supertiled product + ALIGNED-RUN sums): measured v5e round 4 —
    # config3 3.45 ms / 7.05M = 0.49 ns/nnz (round 3 was 0.54-0.69 with
    # the gathered realign). The round-2 chooser priced streams at the
    # sort rate and mis-picked SELL on dense-rows (priced 27 ms =
    # measured 30.6 ms, but stream measured 6.8 ms). Slightly above the
    # best point so borderline picks stay conservative.
    "stream_routed_ns_per_nnz": 0.55,
    "cycles_per_s": 940e6,
}

# Core clocks by device kind (for cycle-unit conversions); unknown kinds
# fall back to the v5e clock — rankings only need relative consistency.
_CLOCKS = {
    "TPU v5 lite": 940e6,
    "TPU v5e": 940e6,
    "TPU v5p": 1.75e9,
    "TPU v6 lite": 940e6,
    "TPU v6e": 940e6,
}

_CACHE_PATH = os.environ.get(
    "ELLSPMV_TPU_CALIB_PATH",
    os.path.expanduser("~/.cache/ellspmv_tpu/calibration.json"))

_injected: dict | None = None
_file_cache: dict | None = None


def inject(values: dict | None) -> None:
    """Test hook: override calibration values (None restores)."""
    global _injected
    _injected = dict(values) if values is not None else None


def _device_kind() -> str:
    try:
        import jax
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def _load_file() -> dict:
    global _file_cache
    if _file_cache is None:
        try:
            with open(_CACHE_PATH) as f:
                _file_cache = json.load(f)
        except Exception:
            _file_cache = {}
    return _file_cache


def get(name: str) -> float:
    """Calibrated value for `name`: injected > cached-per-device-kind >
    v5e default."""
    if _injected is not None and name in _injected:
        return float(_injected[name])
    per_kind = _load_file().get(_device_kind(), {})
    if name in per_kind:
        return float(per_kind[name])
    return DEFAULTS[name]


# Plausibility bounds: a jittered measurement must degrade to the default,
# never be cached (no real TPU streams <8 or >20000 B/cycle or sorts
# <0.1 ns/elem).  A bogus cached rate silently mis-tunes every plan.
_PLAUSIBLE = {"hbm_bytes_per_cycle": (8.0, 2e4),
              "stream_ns_per_nnz": (0.1, 1e3)}


def _apply_plausibility_gate(out: dict, log=None) -> dict:
    for name, (lo_ok, hi_ok) in _PLAUSIBLE.items():
        if name in out and not (lo_ok <= out[name] <= hi_ok):
            if log:
                log.write(f"calibration: {name}={out[name]:.3g} outside "
                          f"[{lo_ok}, {hi_ok}] - implausible (tunnel "
                          f"jitter?), keeping default {DEFAULTS[name]}\n")
            out[name] = DEFAULTS[name]
    return out


def _sync(x):
    import numpy as np
    import jax
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def calibrate(save: bool = True, log=None) -> dict:
    """Measure HBM stream rate and sort throughput on the current device;
    optionally persist per device kind."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    kind = _device_kind()
    clock = _CLOCKS.get(kind, DEFAULTS["cycles_per_s"])
    out = {"cycles_per_s": clock}

    def timed(chain, *args, lo=4, hi=16):
        # Remote-tunnel dispatch jitter is +-several ms per call; the
        # (hi-lo) chain must be long enough that the slope signal
        # dominates it, and a single jittered trial must not be able to
        # poison the result (a min over clamped slopes once returned the
        # 1e-9 floor -> a cached "HBM rate" of 1e8 GB/s that silently
        # mis-tuned every subsequent plan).  Median of 5 trials.
        _sync(chain(*args, lo))
        _sync(chain(*args, hi))
        slopes = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(chain(*args, lo))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _sync(chain(*args, hi))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) / (hi - lo))
        slopes.sort()
        return max(slopes[len(slopes) // 2], 1e-9)

    # HBM stream rate: chained triad (read a + read b -> write out).
    # The working set (2 carries + temp = ~288 MB) must exceed VMEM
    # (~128 MiB on v5e) or XLA keeps the whole loop carry VMEM-resident
    # and the "HBM" rate measures VMEM (observed: flat time from 8 to
    # 1024 iterations at n=8M).
    n = 24 << 20
    a = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))

    @jax.jit
    def triad(a, b, iters):
        def body(_, c):
            a_, b_ = c
            return b_ + a_ * 0.5, a_
        return jax.lax.fori_loop(0, iters, body, (a, b))

    t = timed(triad, a, b, lo=4, hi=68)    # ~22 ms slope signal
    gbps = 3 * n * 4 / t      # 2 reads + 1 write per iteration
    out["hbm_bytes_per_cycle"] = gbps / clock

    # sort throughput (the stream path's former dominant cost; still the
    # fallback path and the auto-chooser's stream price)
    m = 8 << 20               # 100 MB of (i32,f32,f32): HBM-resident
    keys = jnp.asarray(
        np.random.RandomState(2).randint(0, 1 << 30, m).astype(np.int32))
    v1 = jnp.asarray(np.random.RandomState(3).rand(m).astype(np.float32))
    v2 = jnp.asarray(np.random.RandomState(4).rand(m).astype(np.float32))

    @jax.jit
    def sortchain(k, v1, v2, iters):
        def body(_, c):
            k_, a_, b_ = c
            return jax.lax.sort((k_, a_, b_), num_keys=1, is_stable=False)
        return jax.lax.fori_loop(0, iters, body, (k, v1, v2))

    t = timed(sortchain, keys, v1, v2, lo=2, hi=6)
    out["stream_ns_per_nnz"] = max(t / m * 1e9, 0.05)

    _apply_plausibility_gate(out, log)

    if log:
        log.write(f"calibration [{kind}]: HBM {gbps / 1e9:.0f} GB/s "
                  f"({out['hbm_bytes_per_cycle']:.0f} B/cycle), sort "
                  f"{out['stream_ns_per_nnz']:.2f} ns/elem\n")

    if save:
        global _file_cache
        cache = dict(_load_file())
        cache[kind] = out
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
        _file_cache = cache
    return out


def main(argv=None):
    import sys
    calibrate(save=True, log=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
