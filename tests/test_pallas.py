"""Pallas ELL kernel tests, run in interpreter mode on the CPU backend.

On real TPU hardware the same kernel compiles via Mosaic; these tests pin
the kernel's semantics (plan construction, windowed gathers, double-double
fp64) against the NumPy oracle.
"""

import numpy as np
import pytest

from ellspmv_tpu.formats.ell import ell_from_coo
from ellspmv_tpu.models.generators import banded_random, poisson2d
from ellspmv_tpu.ops import plan as plan_mod
from ellspmv_tpu.ops.ell_pallas import ell_spmv_pallas, get_plan
from ellspmv_tpu.ops.reference import ell_spmv_numpy
from tests.conftest import random_coo


def check(coo, dtype, rtol, sep_diag=False, y0=None, row_tile=1024):
    ell = ell_from_coo(coo, sort_rows=True, separate_diagonal=sep_diag,
                       value_dtype=dtype)
    dp = get_plan(ell)
    assert dp is not None, "plan unexpectedly unsupported"
    rng = np.random.RandomState(7)
    x = rng.rand(ell.num_columns).astype(dtype)
    got = np.asarray(ell_spmv_pallas(ell, x, y0), np.float64)
    want = ell_spmv_numpy(ell, x.astype(np.float64),
                          None if y0 is None else np.asarray(y0, np.float64))
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)
    return dp.plan


def test_poisson_f32():
    p = check(poisson2d(32), np.float32, 2e-5)
    assert p.KS <= 9


def test_poisson_f64_dd():
    # double-double accuracy: ~1e-13 on 5-term rows
    check(poisson2d(24), np.float64, 1e-12)


@pytest.mark.parametrize("dtype,rtol", [(np.float32, 5e-5),
                                        (np.float64, 1e-11)])
def test_banded(dtype, rtol):
    check(banded_random(1500, 9, 64, seed=3), dtype, rtol)


def test_separate_diagonal_and_y_accumulate():
    coo = banded_random(900, 7, 50, seed=5)
    y0 = np.random.RandomState(11).randn(900)
    check(coo, np.float64, 1e-11, sep_diag=True, y0=y0)


def test_rectangular():
    coo = random_coo(np.random.RandomState(0), 300, 200, 1200)
    # random columns over only 200 cols: still plan-able (window = whole x)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    dp = get_plan(ell)
    if dp is None:
        pytest.skip("window budget exceeded (acceptable for random)")
    x = np.random.RandomState(1).rand(200)
    got = np.asarray(ell_spmv_pallas(ell, x), np.float64)
    want = ell_spmv_numpy(ell, x)
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11 * scale)


def test_plan_rejects_wide_random():
    """A huge unsorted random matrix must exceed the locality budget and
    fall back (plan None), not produce a wrong kernel."""
    coo = random_coo(np.random.RandomState(0), 4096, 1 << 20, 8192)
    ell = ell_from_coo(coo, value_dtype=np.float32)
    assert plan_mod.build_plan(ell, max_k128=16) is None


def test_plan_budgets():
    ell = ell_from_coo(poisson2d(64), sort_rows=True,
                       value_dtype=np.float32)
    p = plan_mod.build_plan(ell)
    assert p is not None
    assert p.K128 % 8 == 0
    assert p.lcol.min() >= 0 and p.lcol.max() < p.KS * 128
    qb, ks = p.qb[:, 0, :], p.qb[:, 1, :]
    extra = p.G - 1 if p.slope else 0
    assert (qb >= 0).all() and (qb + p.KS + extra <= p.K128).all()
    assert (ks >= 1).all() and (ks <= p.KS).all()
    assert p.wbase128.max() + p.K128 <= p.nx128
    # slot-major relayout round-trip: lcol/vals entry (t, s*G+g, lane)
    # corresponds to original row t*R + g*128 + lane, slot s
    S, G = p.rowsize, p.G
    t, s, g, lane = 0, 1, 0, 5
    row = t * G * 128 + g * 128 + lane
    orig = np.asarray(ell.values)[row, s]
    assert p.vals[t, s * G + g, lane] == np.float32(orig)


def test_zero_value_entries_do_not_widen_window():
    """Stored zeros (and padding) must not blow up the window span."""
    coo = banded_random(512, 5, 32, seed=1)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float32)
    p_ref = plan_mod.build_plan(ell)
    # add an explicit zero entry at a far-away column
    import dataclasses
    coo2 = dataclasses.replace(
        coo,
        rowidx=np.concatenate([coo.rowidx, np.array([0], np.int32)]),
        colidx=np.concatenate([coo.colidx, np.array([511], np.int32)]),
        values=np.concatenate([coo.values, np.array([0.0])]))
    ell2 = ell_from_coo(coo2, sort_rows=True, value_dtype=np.float32)
    p2 = plan_mod.build_plan(ell2)
    assert p2.K128 == p_ref.K128


def test_slope1_negative_rebased_columns():
    """Regression: slope-1 rebased columns are negative for entries left of
    their 128-row group (banded matrices); the empty-slot sentinel must not
    swallow them (it did: per-slot ks came out 1 and entries were skipped,
    producing ~0.3 relative error on hardware)."""
    from ellspmv_tpu.models.generators import banded_random
    from ellspmv_tpu.ops.ell_pallas import DevicePlan
    coo = banded_random(60_000, 16, 512, seed=0)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float32)
    p = plan_mod.build_plan(ell, row_tile=8192, slope=1,
                            value_dtype=np.float32)
    assert p is not None and p.G == 64
    # invariant: every real entry's gather step is within its slot's ks
    lcol = p.lcol.reshape(p.num_tiles, p.rowsize, p.G, 128).astype(np.int64)
    ks = p.qb[:, 1, :].astype(np.int64)
    vals = np.zeros((p.n_pad, p.rowsize))
    vals[:ell.padded_rows] = np.asarray(ell.values)
    real = (vals != 0).reshape(p.num_tiles, p.G, 128,
                               p.rowsize).transpose(0, 3, 1, 2)
    assert int((real & ((lcol >> 7) >= ks[:, :, None, None])).sum()) == 0
    dp = DevicePlan(ell, p, dd=False)
    x = np.random.RandomState(1).rand(ell.num_columns).astype(np.float32)
    got = np.asarray(dp(x), np.float64)[:ell.num_rows]
    want = ell_spmv_numpy(ell, x.astype(np.float64))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5 * scale)


def test_rebucket_slots_preserves_semantics_and_narrows():
    """Offset bucketing: a stencil with boundary rows keeps identical SpMV
    results while per-slot spans shrink (boundary rows re-align to the
    interior rows' diagonals)."""
    from ellspmv_tpu.ops.plan import rebucket_slots, _Stats
    coo = poisson2d(48)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    ell2 = rebucket_slots(ell)
    assert ell2 is not ell
    x = np.random.RandomState(0).rand(ell.num_columns)
    from tests.conftest import assert_fp64_close
    assert_fp64_close(ell_spmv_numpy(ell2, x), ell_spmv_numpy(ell, x))
    s1, s2 = _Stats(ell), _Stats(ell2)
    span1 = (s1.smax[1].astype(np.int64) - s1.smin[1]).clip(0).max()
    span2 = (s2.smax[1].astype(np.int64) - s2.smin[1]).clip(0).max()
    assert span2 < span1


def test_rebucket_banded_random():
    """Partially-full random-banded rows: results agree to summation-order
    ulp noise (entries are permuted within their rows)."""
    from ellspmv_tpu.ops.plan import rebucket_slots
    from tests.conftest import assert_fp64_close
    coo = banded_random(2048, 8, 64, seed=4)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    ell2 = rebucket_slots(ell)
    x = np.random.RandomState(1).rand(ell.num_columns)
    assert_fp64_close(ell_spmv_numpy(ell2, x), ell_spmv_numpy(ell, x))


def test_static_window_resident_x(rng):
    """Uniform random columns over a wide space: the resident-x scan path.
    build_plan(static=True) must cover the whole x image from wbase 0."""
    from ellspmv_tpu.formats.coo import CooMatrix
    n, m, k = 4096, 65536, 5
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = rng.randint(0, m, n * k)
    keys = rows * m + cols
    _, keep = np.unique(keys, return_index=True)
    coo = CooMatrix(n, m, rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32), rng.randn(len(keep)))
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    p = plan_mod.build_plan(ell, static=True)
    assert p is not None and p.static_window == 1
    assert (p.wbase128 == 0).all() and p.K128 == p.nx128
    assert p.lcol.min() >= 0 and p.lcol.max() < p.KS * 128
    # kernel correctness through the static plan
    from ellspmv_tpu.ops.ell_pallas import DevicePlan
    import os
    os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"] = "1"
    try:
        dp = DevicePlan(ell, p, dd=True)
        x = rng.rand(m)
        got = np.asarray(dp(x))[:n]
        want = ell_spmv_numpy(ell, x)
        scale = max(np.max(np.abs(want)), 1.0)
        # f32-level tolerance: under interpret mode XLA fuses the kernel
        # internals and rewrites the double-double error-free transforms
        # (BENCH_NOTES.md); gather/window structure is what this pins.
        # On hardware the Mosaic kernel is opaque and stays at ~1e-14.
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5 * scale)
    finally:
        del os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"]


def test_rebucket_column_widened(rng):
    """Widened column bucketing: semantics preserved, scan (per-slot span
    sum) reduced on a random matrix with full rows."""
    from ellspmv_tpu.formats.coo import CooMatrix
    from ellspmv_tpu.ops.plan import rebucket_slots
    n, m, k = 2048, 32768, 6
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = rng.randint(0, m, n * k)
    keys = rows * m + cols
    _, keep = np.unique(keys, return_index=True)
    coo = CooMatrix(n, m, rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32), rng.randn(len(keep)))
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    # full rows: in-place column rebucket is the identity
    assert rebucket_slots(ell, key="column") is ell
    e2 = rebucket_slots(ell, key="column", widen_to=4 * ell.rowsize)
    assert e2 is not ell and e2.rowsize == 4 * ell.rowsize
    x = rng.rand(m)
    np.testing.assert_allclose(ell_spmv_numpy(e2, x)[:n],
                               ell_spmv_numpy(ell, x)[:n], rtol=1e-12)
    p1 = plan_mod.build_plan(ell, static=True)
    p2 = plan_mod.build_plan(e2, static=True)
    assert p1 is not None and p2 is not None
    scan1 = float(p1.qb[:, 1, :].sum(axis=1).mean())
    scan2 = float(p2.qb[:, 1, :].sum(axis=1).mean())
    assert scan2 < 0.6 * scan1, (scan1, scan2)


def test_get_plan_picks_scan_plan_for_random(rng):
    """get_plan on a random wide matrix must produce SOME plan (the XLA
    random gather is ~100x off on TPU) and it should be scan-efficient."""
    from ellspmv_tpu.formats.coo import CooMatrix
    n, m, k = 2048, 32768, 6
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = rng.randint(0, m, n * k)
    keys = rows * m + cols
    _, keep = np.unique(keys, return_index=True)
    coo = CooMatrix(n, m, rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32), rng.randn(len(keep)))
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    dp = get_plan(ell)
    assert dp is not None
    # widened column bucketing should have produced a wider slot space
    assert dp.cfg.S > ell.rowsize


def test_dia_pallas_matches_oracle(rng, monkeypatch):
    """Resident-x shifted-stream DIA kernel (ops/dia_pallas.py) vs the
    dense oracle, fp64 and f32, incl. lane-straddling offsets."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.ops import dia_pallas
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    coo = poisson2d(20)     # offsets {-20,-1,0,1,20}: straddles + aligned
    n = coo.num_rows
    for dt, rtol in ((np.float64, 5e-6), (np.float32, 5e-6)):
        dia = dia_from_coo(coo, value_dtype=dt)
        assert dia is not None
        dia = dia.device_put()
        assert dia_pallas.supported(dia)
        x = rng.rand(n)
        y0 = rng.randn(n)
        got = np.asarray(dia_pallas.dia_spmv_pallas(dia, x, y0),
                         np.float64)
        want = coo_spmv_numpy(coo, x, y0)
        scale = max(np.max(np.abs(want)), 1.0)
        np.testing.assert_allclose(got, want, rtol=rtol,
                                   atol=rtol * scale)


def test_dia_pallas_offsets_beyond_128(rng, monkeypatch):
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.formats.coo import CooMatrix
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.ops import dia_pallas
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    n = 700
    offs = [-300, -129, -7, 0, 5, 127, 128, 301]
    rows_l, cols_l = [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o), dtype=np.int64)
        rows_l.append(r)
        cols_l.append(r + o)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = rng.randn(len(rows))
    coo = CooMatrix(n, n, rows.astype(np.int32), cols.astype(np.int32),
                    vals)
    dia = dia_from_coo(coo, value_dtype=np.float64).device_put()
    assert dia_pallas.supported(dia)
    x = rng.rand(n)
    got = np.asarray(dia_pallas.dia_spmv_pallas(dia, x), np.float64)
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(got, want, rtol=5e-6, atol=5e-6 * scale)


def test_bfloat16_pallas_path(rng, monkeypatch):
    """bf16 storage / f32 compute in the windowed kernel (round-1 r9):
    --precision=bfloat16 must not fall back to the XLA gather path."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    import ml_dtypes
    from ellspmv_tpu.ops import ell_pallas
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    coo = poisson2d(24)
    ell = ell_from_coo(coo, sort_rows=True,
                       value_dtype=ml_dtypes.bfloat16).device_put()
    dp = ell_pallas.get_plan(ell)
    assert dp is not None
    assert np.dtype(np.asarray(dp.vals[0]).dtype) == np.dtype(
        ml_dtypes.bfloat16)          # stored bf16, not upcast
    x = rng.rand(coo.num_columns)
    got = np.asarray(ell_pallas.ell_spmv_pallas(ell, x), np.float64)
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)
    # bf16 storage: ~8-bit mantissa on the values
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * scale)


def test_dia_pallas_windowed_mode(rng, monkeypatch):
    """Windowed x staging (w128 set): a VMEM budget too small for the
    resident image must fall back to double-buffered per-tile windows
    with identical results (the path headline-scale n takes on
    hardware)."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.ops import dia_pallas, plan as plan_mod
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    coo = poisson2d(40)     # n=1600: several 128-row groups
    n = coo.num_rows
    for dt, rtol in ((np.float64, 5e-6), (np.float32, 5e-6)):
        dia = dia_from_coo(coo, value_dtype=dt).device_put()
        # resident x needs nx128*128*4*vb > budget -> force windowed
        monkeypatch.setattr(plan_mod, "VMEM_BUDGET_BYTES", 80_000)
        dp = dia_pallas.get_plan(dia)
        assert dp is not None and dp.cfg["w128"] is not None
        x = rng.rand(n)
        y0 = rng.randn(n)
        got = np.asarray(dia_pallas.dia_spmv_pallas(dia, x, y0),
                         np.float64)
        want = coo_spmv_numpy(coo, x, y0)
        scale = max(np.max(np.abs(want)), 1.0)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)


def test_dia_pallas_infeasible_span(monkeypatch):
    """A diagonal span too wide for even a G=1 window is refused (plan
    None), not mis-built."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.formats.coo import CooMatrix
    from ellspmv_tpu.formats.dia import dia_from_coo
    from ellspmv_tpu.ops import dia_pallas, plan as plan_mod

    n = 600
    rows = np.arange(n, dtype=np.int64)
    cols = np.concatenate([rows, (rows + 512) % n])
    rows = np.concatenate([rows, rows])
    coo = CooMatrix(n, n, rows, cols, np.ones(2 * n))
    dia = dia_from_coo(coo, value_dtype=np.float64).device_put()
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_BYTES", 4_000)
    assert dia_pallas.get_plan(dia) is None


def test_rebucket_block_widened():
    """Gather-block-aligned bucketing (key='block'): semantics preserved
    and the mean per-slot gather span beats offset-quantile buckets at the
    same widening on a banded-RANDOM matrix (the adversarial config2
    class, where entries have no diagonal structure)."""
    from ellspmv_tpu.ops.plan import rebucket_slots
    from tests.conftest import assert_fp64_close
    coo = banded_random(20_000, 16, 512, seed=0)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    w = 2 * ell.rowsize
    e_blk = rebucket_slots(ell, key="block", widen_to=w)
    e_off = rebucket_slots(ell, key="offset", widen_to=w)
    assert e_blk is not ell and e_blk.rowsize == w
    x = np.random.RandomState(1).rand(ell.num_columns)
    assert_fp64_close(ell_spmv_numpy(e_blk, x), ell_spmv_numpy(ell, x))
    p_blk = plan_mod.best_plan(e_blk, value_dtype=np.float64)
    p_off = plan_mod.best_plan(e_off, value_dtype=np.float64)
    assert p_blk is not None and p_off is not None
    ks_blk = float(p_blk.qb[:, 1, :].mean())
    ks_off = float(p_off.qb[:, 1, :].mean())
    assert ks_blk < ks_off, (ks_blk, ks_off)


def test_rebucket_block_quantile():
    """Per-row quantile block capacities (key='block', quantile=q):
    semantics preserved; with widen_to=None the slot space is sized from
    the per-row count quantiles (>= the input rowsize); with an explicit
    width the capacities rescale into it."""
    from ellspmv_tpu.ops.plan import rebucket_slots
    from tests.conftest import assert_fp64_close
    coo = banded_random(20_000, 16, 512, seed=0)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    x = np.random.RandomState(1).rand(ell.num_columns)
    want = ell_spmv_numpy(ell, x)
    e_q = rebucket_slots(ell, key="block", quantile=0.9)
    assert e_q.rowsize >= ell.rowsize
    assert_fp64_close(ell_spmv_numpy(e_q, x), want)
    e_qw = rebucket_slots(ell, key="block", widen_to=2 * ell.rowsize,
                          quantile=0.9)
    assert e_qw.rowsize == 2 * ell.rowsize
    assert_fp64_close(ell_spmv_numpy(e_qw, x), want)


def test_supertile_matches_single_tile():
    """Supertiling (sub>1: SUB subtiles share one grid step + window DMA)
    must reproduce the sub=1 results exactly on the same plan."""
    import os
    from ellspmv_tpu.ops.ell_pallas import DevicePlan
    coo = banded_random(40_000, 8, 256, seed=2)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    p = plan_mod.build_plan(ell, row_tile=1024, slope=1,
                            value_dtype=np.float64)
    assert p is not None and p.num_tiles >= 5  # odd T: exercises padding
    x = np.random.RandomState(3).rand(ell.num_columns)
    os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"] = "1"
    # pin nacc: supertiled plans default to 2 accumulator chains while
    # sub=1 uses 1, which permutes the summation order (~1e-14 deltas);
    # this test isolates the supertile transformation itself.
    os.environ["ELLSPMV_TPU_NACC"] = "1"
    try:
        os.environ["ELLSPMV_TPU_SUB"] = "1"
        y1 = np.asarray(DevicePlan(ell, p, dd=True)(x))[:coo.num_rows]
        os.environ["ELLSPMV_TPU_SUB"] = "4"
        dp4 = DevicePlan(ell, p, dd=True)
        assert dp4.cfg.sub == 4 and dp4.cfg.T == -(-p.num_tiles // 4)
        y4 = np.asarray(dp4(x))[:coo.num_rows]
    finally:
        del os.environ["ELLSPMV_TPU_SUB"]
        del os.environ["ELLSPMV_TPU_NACC"]
        del os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(y1, y4)
    want = ell_spmv_numpy(ell, x)
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(y4, want, rtol=5e-5, atol=5e-5 * scale)


def test_chunked_dynamic_scan_slope1():
    """KS > the unroll cap takes the dynamic fori path; with slope=1 and
    G <= 8 it runs the CHUNKED scan (one (U+G-1,128) window load per U
    static select steps — the stream product kernel's hot path). Pin its
    results against the NumPy oracle for both dd and f32."""
    import os
    from ellspmv_tpu.ops.ell_pallas import DevicePlan

    coo = banded_random(20_000, 6, 6000, seed=5)   # wide band -> KS > 16
    x = np.random.RandomState(11).rand(coo.num_columns)
    os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"] = "1"
    try:
        for dtype, rtol in ((np.float64, 1e-13), (np.float32, 5e-5)):
            ell = ell_from_coo(coo, sort_rows=True, value_dtype=dtype)
            p = plan_mod.build_plan(ell, row_tile=1024, slope=1,
                                    value_dtype=dtype)
            assert p is not None and p.slope == 1 and p.G == 8
            assert p.KS > 16, f"KS={p.KS}: not the dynamic path"
            dp = DevicePlan(ell, p, dd=(dtype == np.float64))
            got = np.asarray(dp(x.astype(dtype)), np.float64)[:coo.num_rows]
            want = ell_spmv_numpy(ell, x.astype(np.float64))
            scale = max(np.max(np.abs(want)), 1.0)
            np.testing.assert_allclose(got, want, rtol=rtol,
                                       atol=rtol * scale)
    finally:
        del os.environ["ELLSPMV_TPU_PALLAS_INTERPRET"]


def test_rebucket_pair_semantics_and_span():
    """Pair-window slot assignment (rebucket_slots key='pair'): SpMV
    results agree to summation-order ulp noise, every slot's slope-1
    rebased span is <= 2 gather blocks BY CONSTRUCTION (at any tile
    size), and the interval-covering capacities never overflow a row."""
    from ellspmv_tpu.ops.plan import rebucket_slots
    from tests.conftest import assert_fp64_close

    coo = banded_random(4096, 16, 512, seed=0)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    e2 = rebucket_slots(ell, key="pair")
    assert e2 is not ell
    # no entries lost
    assert int((np.asarray(e2.values) != 0).sum()) == \
        int((np.asarray(ell.values) != 0).sum())
    x = np.random.RandomState(1).rand(ell.num_columns)
    assert_fp64_close(ell_spmv_numpy(e2, x), ell_spmv_numpy(ell, x))
    # per-slot slope-1 span <= 2 blocks, independent of tile size
    cols = np.asarray(e2.colidx)
    real = np.asarray(e2.values) != 0
    rows = np.arange(cols.shape[0], dtype=np.int64)[:, None]
    blk = (cols.astype(np.int64) - ((rows >> 7) << 7)) >> 7
    for s in range(e2.rowsize):
        m = real[:, s]
        if m.any():
            assert blk[m, s].max() - blk[m, s].min() <= 1
    # the planner sees the ks<=2 structure at a large tile size
    p = plan_mod.build_plan(e2, row_tile=1024, slope=1,
                            value_dtype=np.float64)
    assert p is not None
    assert int(p.qb[:, 1, :].max()) <= 2


def test_rebucket_pair_non_square_noop(rng):
    from ellspmv_tpu.formats.coo import CooMatrix
    from ellspmv_tpu.ops.plan import rebucket_slots
    rows = np.repeat(np.arange(64, dtype=np.int64), 3)
    cols = rng.randint(0, 96, len(rows))
    keys = rows * 96 + cols
    _, keep = np.unique(keys, return_index=True)
    coo = CooMatrix(64, 96, rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32), rng.randn(len(keep)))
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    assert rebucket_slots(ell, key="pair") is ell
