"""Pallas double-double dot product tests (interpret mode on CPU)."""

import math

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def force_interpret(monkeypatch):
    monkeypatch.setenv("ELLSPMV_TPU_PALLAS_INTERPRET", "1")


def test_dd_vdot_accuracy():
    from ellspmv_tpu.ops.dd_reduce import dd_vdot
    rng = np.random.RandomState(0)
    x = rng.randn(5000)
    y = rng.randn(5000)
    got = float(dd_vdot(np.asarray(x), np.asarray(y)))
    want = math.fsum(x * y)
    assert abs(got - want) <= 1e-13 * sum(abs(x * y))


def test_dd_vdot_padding():
    from ellspmv_tpu.ops.dd_reduce import dd_vdot
    x = np.arange(1, 1001, dtype=np.float64)
    got = float(dd_vdot(x, x))
    assert got == float(np.sum(x * x))


def test_cg_uses_dd_vdot(monkeypatch):
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.models.solvers import cg
    from ellspmv_tpu.ops.ell_xla import ell_spmv_xla
    coo = poisson2d(12)
    ell = ell_from_coo(coo)
    res = cg(lambda v: ell_spmv_xla(ell, v), np.ones(144), tol=1e-10,
             maxiter=500)
    x = np.asarray(res.x)
    np.testing.assert_allclose(coo.to_dense() @ x, np.ones(144),
                               rtol=1e-8, atol=1e-8)


def test_cg_dd_solves(monkeypatch):
    """dd-vector CG semantics. NOTE: under CPU interpret mode, XLA:CPU
    fuses the interpret-mode kernel into the solver program and rewrites
    its error-free transforms, so accuracy degrades to ~f32 there; on real
    TPU hardware (opaque Mosaic custom call) the recursive and true
    residuals track to 6e-9 (measured). The CPU test therefore asserts
    f32-level accuracy only."""
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import poisson2d
    from ellspmv_tpu.models.solvers import cg_dd
    from ellspmv_tpu.ops.ell_pallas import get_plan
    coo = poisson2d(16)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    dp = get_plan(ell)
    assert dp is not None
    b = np.ones(256)
    res = cg_dd(dp, b, tol=1e-6, maxiter=800)
    x = np.asarray(res.x)
    np.testing.assert_allclose(coo.to_dense() @ x, b, rtol=3e-5, atol=3e-5)
