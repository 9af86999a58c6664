"""Stream (sort-based) SpMV: the TPU-native path for matrices with no
column locality (power-law / webbase, BASELINE configs[3]).

Kernels run in Pallas interpret mode on CPU. CAVEAT (documented in
BENCH_NOTES): under interpret mode XLA fuses the kernel internals into the
surrounding program and can rewrite the double-double error-free
transforms, so fp64 results here are compared at f32-level tolerance; the
true <=1e-13 behavior is verified on hardware by the bench oracle checks.
"""

import numpy as np
import pytest

from ellspmv_tpu.formats.stream import stream_from_coo, stream_spmv
from ellspmv_tpu.ops.reference import coo_spmv_numpy
from tests.conftest import random_coo


def _check(coo, value_dtype, rng, y=None, rtol=None, sep_diag=False):
    sm = stream_from_coo(coo, value_dtype=value_dtype,
                         separate_diagonal=sep_diag)
    x = rng.rand(coo.num_columns)
    got = np.asarray(stream_spmv(sm, x, y), np.float64)
    want = coo_spmv_numpy(coo.expand_symmetry(), x,
                          None if y is None else np.asarray(y, np.float64))
    if rtol is None:
        rtol = 2e-4 if value_dtype == np.float32 else 5e-5
    scale = max(np.max(np.abs(want), initial=0.0), 1.0)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)
    return sm


def test_stream_random_rect(rng):
    coo = random_coo(rng, 700, 500, 4000)
    _check(coo, np.float64, rng)


def test_stream_random_f32(rng):
    coo = random_coo(rng, 600, 600, 5000)
    _check(coo, np.float32, rng)


def test_stream_accumulates_y(rng):
    coo = random_coo(rng, 300, 400, 2500)
    y = rng.randn(300)
    _check(coo, np.float64, rng, y=y)


def test_stream_duplicates_accumulate(rng):
    coo = random_coo(rng, 100, 100, 1500, with_dups=True)
    _check(coo, np.float64, rng)


def test_stream_symmetric_expands(rng):
    coo = random_coo(rng, 250, 250, 1200, symmetric=True)
    _check(coo, np.float64, rng)


def test_stream_separate_diagonal(rng):
    coo = random_coo(rng, 200, 200, 1500)
    _check(coo, np.float64, rng, sep_diag=True)


def test_stream_long_rows_recurse(rng):
    """Rows longer than the 128-entry slot cap split into sub-rows and the
    sub-sums feed a second stream-sum level."""
    n = 500
    # two hub rows with ~1500 entries each, plus background
    rows = np.concatenate([np.full(1500, 7), np.full(1400, 200),
                           rng.randint(0, n, 3000)]).astype(np.int32)
    cols = rng.randint(0, n, rows.shape[0]).astype(np.int32)
    vals = rng.randn(rows.shape[0])
    from ellspmv_tpu.formats.coo import CooMatrix
    coo = CooMatrix(n, n, rows, cols, vals)
    sm = _check(coo, np.float64, rng)
    assert len(sm.ddsum.levels) >= 2


def test_stream_empty_rows_and_matrix(rng):
    from ellspmv_tpu.formats.coo import CooMatrix
    # rows 3 and 5 empty
    rows = np.array([0, 1, 2, 4, 4], np.int32)
    cols = np.array([1, 0, 3, 2, 4], np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    coo = CooMatrix(6, 5, rows, cols, vals)
    _check(coo, np.float64, rng)
    empty = CooMatrix(4, 4, np.zeros(0, np.int32), np.zeros(0, np.int32),
                      np.zeros(0))
    sm = stream_from_coo(empty, value_dtype=np.float64)
    out = np.asarray(stream_spmv(sm, np.ones(4)))
    np.testing.assert_array_equal(out, np.zeros(4))


def test_stream_sum_exact_small_ints(rng):
    """Host-plan invariants: with small-integer f32 values every sum is
    exact, so the full pipeline must reproduce numpy bincount exactly."""
    from ellspmv_tpu.ops.stream_sum import apply_stream_sum, build_stream_sum
    n = 300
    E = 5000
    dest = rng.randint(0, n, E).astype(np.int64)
    dest[rng.rand(E) < 0.05] = -1                      # pad positions
    # force some rows over the cap so a second level builds
    dest[:400] = 11
    E_pad = -(-E // 1024) * 1024
    dest = np.pad(dest, (0, E_pad - E), constant_values=-1)
    vals = rng.randint(-8, 9, E_pad).astype(np.float32)
    plan = build_stream_sum(dest, n_rows=n)
    assert len(plan.levels) >= 2
    got = np.asarray(apply_stream_sum(plan, np.asarray(vals),
                                      interpret=True))
    want = np.bincount(dest[dest >= 0], weights=vals[dest >= 0],
                       minlength=n).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_stream_dispatch_and_bench(rng):
    from ellspmv_tpu.bench.harness import benchmark_spmv
    from ellspmv_tpu.ops import spmv

    coo = random_coo(rng, 400, 400, 3000)
    sm = stream_from_coo(coo, value_dtype=np.float64)
    x = rng.rand(400)
    got = np.asarray(spmv(sm, x))
    want = coo_spmv_numpy(coo, x)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)
    res = benchmark_spmv(None, sm, x, repeat=2, warmup=1,
                         protocol="chained")
    assert res.best > 0
    assert res.metrics.num_nonzeros == coo.num_nonzeros


def test_stream_chunked_matches_oracle(rng, monkeypatch):
    """Column-chunked level 1 (the wide-column scale path): per-chunk
    partial sums + merge level reproduce the oracle; single-chunk rows
    terminate at level 1."""
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "4")
    coo = random_coo(rng, 600, 900, 6000)
    sm = _check(coo, np.float64, rng)
    assert len(sm.ddsum.chunk_bases) == 5        # 4 chunks built
    assert len(sm.ddsum.levels) >= 2             # merge level exists


def test_stream_chunked_sort_path(rng, monkeypatch):
    """Chunked stream with the runtime-sort fallback: the inter-chunk
    BLOCK-pad gap fillers must keep rank == position."""
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "3")
    monkeypatch.setenv("ELLSPMV_TPU_NO_PERMUTE", "1")
    coo = random_coo(rng, 400, 700, 4000)
    _check(coo, np.float64, rng)


def test_stream_chunked_f32_and_y(rng, monkeypatch):
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "5")
    coo = random_coo(rng, 300, 800, 3500)
    _check(coo, np.float32, rng, y=rng.randn(300))


def test_stream_chunked_empty_rows_and_hubs(rng, monkeypatch):
    """Empty rows get their terminal zero from exactly one chunk; hub
    rows longer than the cap split per chunk and re-merge."""
    from ellspmv_tpu.formats.coo import CooMatrix
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "4")
    n = 500
    rows = np.concatenate([np.full(900, 7), np.full(800, 200),
                           rng.randint(0, n // 2, 2500)]).astype(np.int32)
    cols = rng.randint(0, n, rows.shape[0]).astype(np.int32)
    vals = rng.randn(rows.shape[0])
    coo = CooMatrix(n, n, rows, cols, vals)   # rows >= n//2 mostly empty
    sm = _check(coo, np.float64, rng)
    assert len(sm.ddsum.levels) >= 2


def test_stream_chunked_sepdiag_symmetric(rng, monkeypatch):
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "3")
    coo = random_coo(rng, 350, 350, 2200)
    _check(coo, np.float64, rng, sep_diag=True)
    sym = random_coo(rng, 280, 280, 1300, symmetric=True)
    _check(sym, np.float64, rng)


def test_stream_chunk_count_rule():
    """Auto chunk count: span-bounded, capped by the mega-group density
    floor, forced by the env knob."""
    import os
    from unittest import mock

    from ellspmv_tpu.formats.stream import stream_from_coo
    from ellspmv_tpu.formats.coo import CooMatrix

    # tiny matrix, huge forced span -> single chunk regardless
    rows = np.arange(64, dtype=np.int32)
    cols = np.arange(64, dtype=np.int32)
    coo = CooMatrix(64, 64, rows, cols, np.ones(64))
    sm = stream_from_coo(coo, value_dtype=np.float64)
    assert len(sm.ddsum.chunk_bases) == 0        # unchunked
    with mock.patch.dict(os.environ,
                         {"ELLSPMV_TPU_STREAM_CHUNKS": "2"}):
        sm2 = stream_from_coo(coo, value_dtype=np.float64)
    assert len(sm2.ddsum.chunk_bases) == 3       # forced 2 chunks
    x = np.linspace(0, 1, 64)
    np.testing.assert_allclose(
        np.asarray(__import__("ellspmv_tpu.formats.stream",
                              fromlist=["stream_spmv"]).stream_spmv(
            sm2, x), np.float64),
        x, rtol=1e-12)


def test_stream_cells_router(rng, monkeypatch):
    """Uniform-cell level-1 route (the take-free W1-direct-write path,
    VERDICT r5 scale work): fixed 16-block groups, W1 writes the mid
    dest-major via a strided BlockSpec, W2 reads contiguous slot rows."""
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "3")
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_BPG", "2")
    monkeypatch.setenv("ELLSPMV_TPU_CELLS_MIN", "0")
    coo = random_coo(rng, 500, 900, 6000)
    sm = _check(coo, np.float64, rng)
    perm = sm.ddsum.levels[0].perm
    assert perm is not None and perm.bpg == 2     # cells route active
    assert len(perm.gsrc) == 0                    # no take stage
    # f32 path through the same route
    coo2 = random_coo(rng, 300, 700, 3000)
    _check(coo2, np.float32, rng, y=rng.randn(300))


def test_stream_cells_dense_row_survives_deal(rng, monkeypatch):
    """A dense row used to overflow one (input block, dest block) cell
    (its ~15000 stream slots are consecutive dest positions) and forced
    the take-stage fallback.  The proportional dest-block deal in the
    cells reorder spreads every bucket across the group's input blocks
    (<= BLOCK/bpg per cell, always under the 2x-margin capacity), so the
    cells route must now ENGAGE and stay correct."""
    from ellspmv_tpu.formats.coo import CooMatrix
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "3")
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_BPG", "4")   # capacity 8192
    monkeypatch.setenv("ELLSPMV_TPU_CELLS_MIN", "0")
    n = 400
    rows = np.concatenate([np.zeros(15000, np.int32),
                           rng.randint(0, n, 3000).astype(np.int32)])
    cols = np.concatenate([
        rng.randint(0, n // 3, 15000),
        rng.randint(0, n, 3000)]).astype(np.int32)
    vals = rng.randn(rows.shape[0])
    coo = CooMatrix(n, n, rows, cols, vals)       # dup entries accumulate
    sm = _check(coo, np.float64, rng)
    perm = sm.ddsum.levels[0].perm
    assert perm is not None and perm.bpg == 4     # cells route engaged


def test_stream_cells_build_error_falls_back(rng, monkeypatch):
    """Any ValueError out of build_permute_cells (overflow, budget) must
    fall back to the general router, not fail the conversion."""
    from ellspmv_tpu.ops import permute as permute_mod
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_CHUNKS", "3")
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_BPG", "2")
    monkeypatch.setenv("ELLSPMV_TPU_CELLS_MIN", "0")

    def boom(target, bpg=None):
        raise ValueError("forced cells failure")
    # stream_from_coo imports the symbol at call time from ops.permute
    monkeypatch.setattr(permute_mod, "build_permute_cells", boom)
    coo = random_coo(rng, 500, 900, 6000)
    sm = _check(coo, np.float64, rng)
    perm = sm.ddsum.levels[0].perm
    assert perm is None or perm.bpg == 0          # general route / sort


def test_stream_chunked_exact_small_ints(rng, monkeypatch):
    """Chunked build is EXACTLY the same sum as unchunked on small-int
    f32 values (both must equal numpy bincount)."""
    from ellspmv_tpu.ops.stream_sum import apply_stream_sum, \
        build_stream_sum
    n = 300
    E = 6000
    dest = rng.randint(0, n, E).astype(np.int64)
    dest[rng.rand(E) < 0.05] = -1
    dest[:300] = 11                            # over-cap row
    E_pad = -(-E // 1024) * 1024
    dest = np.pad(dest, (0, E_pad - E), constant_values=-1)
    vals = rng.randint(-8, 9, E_pad).astype(np.float32)
    want = np.bincount(dest[dest >= 0], weights=vals[dest >= 0],
                       minlength=n).astype(np.float32)
    starts = [0, 1500, 2900, 4100, E_pad]      # 4 uneven chunks
    plan = build_stream_sum(dest, n_rows=n, chunk_starts=starts)
    assert len(plan.chunk_bases) == 5
    got = np.asarray(apply_stream_sum(plan, np.asarray(vals),
                                      interpret=True))
    np.testing.assert_array_equal(got, want)
    # sort fallback over the same chunked plan
    monkeypatch.setenv("ELLSPMV_TPU_NO_PERMUTE", "1")
    plan2 = build_stream_sum(dest, n_rows=n, chunk_starts=starts)
    got2 = np.asarray(apply_stream_sum(plan2, np.asarray(vals),
                                       interpret=True))
    np.testing.assert_array_equal(got2, want)


def test_stream_sum_key_space_guard():
    """The virtual slot key space is int32; an impossible size must raise
    rather than wrap (the IDXTYPEWIDTH-analogue guard for this format)."""
    from unittest import mock

    from ellspmv_tpu.ops import stream_sum

    dest = np.zeros(1024, np.int64)
    with mock.patch.object(stream_sum, "_I32_SENTINEL",
                           np.int32(np.iinfo(np.int32).max)):
        # shrink the overflow threshold by pretending int32 is tiny
        def fake_iinfo(*a, **k):
            class I:
                max = 1000
            return I()

        with mock.patch.object(stream_sum.np, "iinfo", fake_iinfo):
            with pytest.raises(ValueError, match="int32"):
                stream_sum.build_stream_sum(dest, n_rows=2048)


def test_auto_format_chooser(rng):
    """auto_from_coo picks windowed ELL for local matrices and stream for
    power-law/random ones."""
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.ell import EllMatrix
    from ellspmv_tpu.formats.stream import StreamMatrix
    from ellspmv_tpu.models.generators import banded_random, power_law

    local = auto_from_coo(banded_random(20000, 8, 64, seed=1),
                          value_dtype=np.float64)
    assert isinstance(local, EllMatrix), local._auto_reason
    skewed = auto_from_coo(power_law(20000, 8, seed=1),
                           value_dtype=np.float64)
    assert isinstance(skewed, StreamMatrix), getattr(
        skewed, "_auto_reason", "?")


def test_stream_price_scales_with_column_span():
    """The routed-stream price must reflect wide-column instances: with
    column chunking the product span stays at its floor, but chunked
    instances pay the merge-level surcharge — a 10M-column / 65M-nnz
    instance prices moderately above the 1M-column rate, NOT the 3.7x
    the unchunked ks blowup once cost (BENCH_NOTES rounds 4-5)."""
    from ellspmv_tpu.formats.auto import _stream_price
    nnz = 65_000_000
    at_1m = _stream_price(nnz, 1_000_000)
    at_10m = _stream_price(nnz, 10_000_000)
    assert 1.05 * at_1m < at_10m < 2.0 * at_1m
    # ...and sparse wide instances (density below the chunkable floor)
    # still price the span blowup that no chunking can remove
    sparse_wide = _stream_price(2_000_000, 10_000_000)
    assert sparse_wide > 1.5 * _stream_price(2_000_000, 1_000_000)
    # below the measured span floor the correction is a no-op
    assert _stream_price(7_000_000, 1_000_000) == pytest.approx(
        _stream_price(7_000_000, 700_000), rel=0.2)


def test_stream_bfloat16_precision(rng):
    """--precision=bfloat16 maps to the f32 kernel path with bf16 storage
    rounding; results agree at bf16-level tolerance."""
    coo = random_coo(rng, 200, 200, 1200)
    sm = stream_from_coo(coo, value_dtype="bfloat16")
    x = rng.rand(200)
    got = np.asarray(stream_spmv(sm, x), np.float64)
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * scale)


def test_stream_multi_megablock_grouping(rng, monkeypatch):
    """Multiple router megablock groups: entries re-grouped by destination
    megablock with per-group BLOCK padding (so product tiles never
    straddle groups). Exercised at a tiny megablock size."""
    monkeypatch.setenv("ELLSPMV_TPU_STREAM_MEGA", str(16384 * 2))
    coo = random_coo(rng, 1200, 900, 40000, with_dups=True)
    sm = _check(coo, np.float64, rng)
    lvl1 = sm.ddsum.levels[0]
    assert lvl1.perm is not None            # router active
    assert sm.prod_len % 16384 == 0


def test_stream_router_active_and_matches_sort(rng):
    """Router output == sort output bit-for-bit on the same build."""
    import os
    coo = random_coo(rng, 800, 700, 20000)
    x = rng.rand(coo.num_columns)
    sm1 = stream_from_coo(coo, value_dtype=np.float64)
    assert sm1.ddsum.levels[0].perm is not None
    assert sm1.ddsum.final_perm is not None
    got1 = np.asarray(stream_spmv(sm1, x), np.float64)
    os.environ["ELLSPMV_TPU_NO_PERMUTE"] = "1"
    try:
        sm2 = stream_from_coo(coo, value_dtype=np.float64)
        assert sm2.ddsum.levels[0].perm is None
        got2 = np.asarray(stream_spmv(sm2, x), np.float64)
    finally:
        del os.environ["ELLSPMV_TPU_NO_PERMUTE"]
    np.testing.assert_array_equal(got1, got2)


def test_stream_folded_buckets_and_gap_keys(rng):
    """Exercise the supertiled sum buckets (_fold_buckets: S=1 tiles fold
    16 per grid step, with a sub=1 tail) and the aligned-run gap-filler
    keys on BOTH the router and sort paths. 80K mostly-1-entry rows give
    a 79-tile S=1 bucket (folds 4x16 + 15 tail); a few heavier rows give
    partial runs whose alignment gaps must be zero-filled by the sort."""
    import os
    n = 80_000
    rows = np.arange(n, dtype=np.int64)
    # heavy rows -> partial (non-128-multiple) runs in the S>=2 buckets
    heavy = rng.choice(n, 40, replace=False)
    rows = np.concatenate([rows, np.repeat(heavy, 7)])
    cols = rng.randint(0, n, len(rows))
    vals = rng.randn(len(rows))
    from ellspmv_tpu.formats.coo import CooMatrix
    coo = CooMatrix(n, n, rows.astype(np.int64), cols.astype(np.int64),
                    vals)
    x = rng.rand(n)
    sm = stream_from_coo(coo, value_dtype=np.float64)
    assert any(b.sub > 1 for lv in sm.ddsum.levels for b in lv.buckets), \
        "expected at least one folded bucket"
    got = np.asarray(stream_spmv(sm, x), np.float64)
    from ellspmv_tpu.ops.reference import coo_spmv_numpy
    want = coo_spmv_numpy(coo, x)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-13
    os.environ["ELLSPMV_TPU_NO_PERMUTE"] = "1"
    try:
        sm2 = stream_from_coo(coo, value_dtype=np.float64)
        # sort path carries the gap-filler keys beyond the entry count
        assert len(np.asarray(sm2.ddsum.levels[0].keys)) \
            >= sm2.ddsum.levels[0].in_len
        got2 = np.asarray(stream_spmv(sm2, x), np.float64)
    finally:
        del os.environ["ELLSPMV_TPU_NO_PERMUTE"]
    err2 = np.max(np.abs(got2 - want)) / np.max(np.abs(want))
    assert err2 < 1e-13


def test_auto_picks_dia_for_stencil(rng, monkeypatch):
    """The auto chooser prices the gather-free DIA kernel for
    diagonal-dense matrices (round-2: DIA is the fastest stencil path)."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.formats.auto import auto_from_coo
    from ellspmv_tpu.formats.dia import DiaMatrix
    from ellspmv_tpu.models.generators import poisson2d

    m = auto_from_coo(poisson2d(48), value_dtype=np.float64)
    assert isinstance(m, DiaMatrix)
    assert m._auto_choice == "dia"
    # gated off for sharded runs
    m2 = auto_from_coo(poisson2d(48), value_dtype=np.float64,
                       allow_dia=False)
    assert not isinstance(m2, DiaMatrix)


def test_stream_traceable_dd_pair(monkeypatch, rng):
    """StreamMatrix exposes the dd-pair traceable form: the chained bench
    loop then never crosses the emulated-f64 boundary between iterations
    (the glue it skips measured ~0.1 ms/iter at 1M rows on v5e)."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    from ellspmv_tpu.models.generators import power_law
    from ellspmv_tpu.ops.dd_vec import dd_from_f64, dd_to_f64
    from ellspmv_tpu.ops.dispatch import traceable_spmv_dd
    from ellspmv_tpu.ops.reference import coo_spmv_numpy

    coo = power_law(2000, 5, seed=3)
    sm = stream_from_coo(coo, value_dtype=np.float64).device_put()
    pair = traceable_spmv_dd(sm)
    assert pair is not None
    op, fn = pair
    x = rng.rand(coo.num_columns)
    got = np.asarray(dd_to_f64(fn(op, dd_from_f64(np.asarray(x)))))
    want = coo_spmv_numpy(coo, x)
    scale = max(np.max(np.abs(want)), 1.0)
    # interpret mode loses the dd error-free transforms to XLA rewrites
    assert np.max(np.abs(got - want)) / scale < 5e-5
    # y accumulates in dd
    got2 = np.asarray(dd_to_f64(fn(op, dd_from_f64(np.asarray(x)),
                                   dd_from_f64(np.asarray(want)))))
    assert np.max(np.abs(got2 - 2 * want)) / scale < 5e-5
    # and the chained protocol picks it up (spmv_fn=None, f64 matrix)
    from ellspmv_tpu.bench.harness import benchmark_spmv
    res = benchmark_spmv(None, sm, x, repeat=2, warmup=1,
                         protocol="chained")
    assert res.best > 0 and np.isfinite(np.asarray(res.y)).all()
