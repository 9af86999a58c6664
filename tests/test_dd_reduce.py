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
