"""Hub-column hybrid tests (power-law matrices, configs[3])."""

import numpy as np
import pytest

from ellspmv_tpu.formats.hybrid import hybrid_from_coo, hybrid_spmv
from ellspmv_tpu.models.generators import power_law
from ellspmv_tpu.ops.reference import coo_spmv_numpy
from tests.conftest import assert_fp64_close, random_coo


def test_hub_split_correct(rng):
    coo = power_law(4000, 8, seed=1)
    hm = hybrid_from_coo(coo, hub_width=512, slice_rows=256, tail_cap=16)
    assert hm.hub is not None
    assert 0.2 < hm.hub_nnz_fraction < 0.95
    x = rng.randn(4000)
    y0 = rng.randn(4000)
    got = np.asarray(hybrid_spmv(hm, x, y0))
    assert_fp64_close(got, coo_spmv_numpy(coo, x, y0))


def test_hub_disabled_when_uniform(rng):
    coo = random_coo(rng, 2000, 2000, 8000)
    hm = hybrid_from_coo(coo, hub_width=128)
    assert hm.hub is None          # uniform degrees: hub not profitable
    x = rng.randn(2000)
    assert_fp64_close(np.asarray(hybrid_spmv(hm, x)),
                      coo_spmv_numpy(coo, x))


def test_hub_planable(rng):
    """The hub part's columns all lie in [0, H): its SELL buckets must be
    plan-able by the windowed kernel (that's the point of the split)."""
    from ellspmv_tpu.ops import plan as pm
    coo = power_law(20000, 8, seed=2)
    hm = hybrid_from_coo(coo, hub_width=1024, slice_rows=1024)
    assert hm.hub is not None
    planable = [pm.best_plan(b, value_dtype=np.float64) is not None
                for b in hm.hub.buckets]
    assert any(planable)


def test_traceable_hybrid(rng, monkeypatch):
    """Traceability of the hybrid (matrix data as jit arguments).

    Tolerance note: under CPU interpret mode INSIDE a jit, XLA fuses the
    interpret-kernel internals and may rewrite the dd error-free
    transforms (degrades a few elements to ~f32 — see BENCH_NOTES);
    hardware Mosaic kernels are opaque custom calls and keep full dd
    accuracy (covered by the bench oracle check and test_pallas)."""
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")
    import jax
    from ellspmv_tpu.ops.dispatch import traceable_spmv
    coo = power_law(1200, 4, seed=3)
    hm = hybrid_from_coo(coo, hub_width=256, slice_rows=128, tail_cap=8,
                         value_dtype=np.float64).device_put()
    op, fn = traceable_spmv(hm)
    x = rng.randn(1200)
    got = np.asarray(jax.jit(lambda o, v: fn(o, v))(op, np.asarray(x)))
    want = coo_spmv_numpy(coo, x)
    np.testing.assert_allclose(got, want, rtol=2e-6,
                               atol=2e-6 * np.abs(want).max())


def test_metrics(rng):
    from ellspmv_tpu.bench.harness import SpmvMetrics
    coo = power_law(2000, 6, seed=4)
    hm = hybrid_from_coo(coo, hub_width=256, slice_rows=256)
    m = SpmvMetrics.for_matrix(hm)
    assert m.num_flops > 0 and m.min_bytes < m.max_bytes
