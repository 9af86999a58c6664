"""RCM reordering tests: permutation validity, bandwidth reduction, SpMV
equivalence through the reordered space, planner unlock."""

import numpy as np

from ellspmv_tpu.formats.ell import ell_from_coo
from ellspmv_tpu.models.reorder import bandwidth, reorder_rcm
from ellspmv_tpu.ops import plan as plan_mod
from ellspmv_tpu.ops.reference import coo_spmv_numpy
from tests.conftest import assert_fp64_close, random_coo


def shuffled_banded(rng, n, nnz_per_row, bw):
    """A banded matrix hidden behind a random permutation — the structure
    RCM should recover."""
    from ellspmv_tpu.models.generators import banded_random
    coo = banded_random(n, nnz_per_row, bw, seed=7)
    p = rng.permutation(n).astype(coo.rowidx.dtype)
    import dataclasses
    return dataclasses.replace(coo, rowidx=p[coo.rowidx],
                               colidx=p[coo.colidx])


def test_rcm_reduces_bandwidth(rng):
    coo = shuffled_banded(rng, 2000, 5, 20)
    assert bandwidth(coo) > 1000          # destroyed by the shuffle
    rm = reorder_rcm(coo)
    assert bandwidth(rm.coo) < 200        # recovered


def test_rcm_permutation_valid(rng):
    coo = random_coo(rng, 300, 300, 1200)
    rm = reorder_rcm(coo)
    assert sorted(rm.perm) == list(range(300))
    np.testing.assert_array_equal(rm.perm[rm.inv], np.arange(300))


def test_spmv_through_reordering(rng):
    coo = shuffled_banded(rng, 500, 6, 15)
    rm = reorder_rcm(coo)
    x = rng.randn(500)
    want = coo_spmv_numpy(coo, x)
    ell = ell_from_coo(rm.coo, sort_rows=True)
    from ellspmv_tpu.ops.ell_xla import ell_spmv_xla
    yp = np.asarray(ell_spmv_xla(ell, rm.permute_x(x)))
    assert_fp64_close(rm.unpermute_y(yp), want)


def test_rcm_unlocks_planner(rng):
    """Shuffled banded matrix: no plan raw, plan after RCM."""
    coo = shuffled_banded(rng, 4096, 6, 24)
    raw = ell_from_coo(coo, sort_rows=True)
    assert plan_mod.best_plan(raw, max_k128=16, max_ks=8) is None
    rm = reorder_rcm(coo)
    sorted_ell = ell_from_coo(rm.coo, sort_rows=True)
    p = plan_mod.best_plan(sorted_ell, max_k128=16, max_ks=8)
    assert p is not None


def test_disconnected_components(rng):
    # two independent blocks — BFS must restart
    from ellspmv_tpu.formats.coo import CooMatrix
    rows = np.array([0, 1, 2, 3], np.int32)
    cols = np.array([1, 0, 3, 2], np.int32)
    coo = CooMatrix(4, 4, rows, cols, np.ones(4))
    rm = reorder_rcm(coo)
    assert sorted(rm.perm) == [0, 1, 2, 3]
