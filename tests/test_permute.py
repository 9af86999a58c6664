"""Static-permutation engine (ops/permute.py): host Koenig-colored block
routing (W1 regroup -> row take -> W2 place) vs a plain numpy permutation
oracle. Kernels run in Pallas interpret mode on CPU."""

import numpy as np
import pytest

from ellspmv_tpu.ops.permute import (_edge_color_numpy, apply_permute,
                                     build_permute)


def _check_coloring(src, dst, col, max_colors):
    assert col.min() >= 0 and col.max() < max_colors
    # distinct per src node and per dst node
    assert len(np.unique(src * max_colors + col)) == len(src)
    assert len(np.unique(dst * max_colors + col)) == len(dst)


@pytest.mark.parametrize("seed,n_src,n_dst,deg", [
    (0, 40, 40, 8), (1, 16, 64, 16), (2, 128, 128, 128), (3, 5, 5, 2),
])
def test_edge_color_numpy(seed, n_src, n_dst, deg):
    rng = np.random.RandomState(seed)
    src = np.repeat(np.arange(n_src), deg)
    dst = rng.permutation(np.repeat(np.arange(n_dst),
                                    len(src) // n_dst + 1)[:len(src)])
    # trim to enforce dst degree bound
    keep = np.zeros(len(src), bool)
    cnt = {}
    for i, d in enumerate(dst):
        if cnt.get(d, 0) < deg:
            cnt[d] = cnt.get(d, 0) + 1
            keep[i] = True
    src, dst = src[keep], dst[keep]
    col = _edge_color_numpy(src, dst, max_colors=max(deg, 2))
    _check_coloring(src, dst, col, max(deg, 2))


def test_edge_color_native_matches_contract():
    from ellspmv_tpu.io import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(7)
    E = 5000
    src = rng.randint(0, 64, E)
    dst = rng.randint(0, 64, E)
    col = native.edge_color(src, dst, 128)
    _check_coloring(src, dst, col, 128)


def _apply_oracle(target, vals, n_out_pad):
    """out[target[k]] = vals[k]; unspecified positions = nan."""
    out = np.full(n_out_pad, np.nan, np.float32)
    real = target >= 0
    out[target[real]] = vals[real]
    return out


@pytest.mark.parametrize("seed,n,n_out", [
    (0, 40000, 40000),       # multiple blocks in and out
    (1, 100000, 120000),     # output bigger than input
    (2, 3000, 50000),        # sparse targets (gaps in output)
    (3, 16384, 16384),       # exactly one block
    (4, 130, 130),           # tiny
    (5, 70000, 40000),       # many input pads
])
def test_permute_matches_oracle(seed, n, n_out):
    rng = np.random.RandomState(seed)
    target = np.full(n, -1, np.int64)
    n_real = min(int(0.8 * n), n_out)
    ks = rng.choice(n, n_real, replace=False)
    target[ks] = rng.choice(n_out, n_real, replace=False)
    vals = rng.randn(n).astype(np.float32)
    vals2 = rng.randn(n).astype(np.float32)

    plan = build_permute(target, n_out)
    out, out2 = apply_permute(plan, vals, vals2, interpret=True)
    out, out2 = np.asarray(out), np.asarray(out2)
    want = _apply_oracle(target, vals, plan.n_out)
    ok = ~np.isnan(want)
    np.testing.assert_array_equal(out[ok], want[ok])
    want2 = _apply_oracle(target, vals2, plan.n_out)
    np.testing.assert_array_equal(out2[ok], want2[ok])


def test_permute_native_assembly_matches_numpy():
    """Above the 200K-element threshold the fused C++ assembly
    (native/color.cc mtxio_build_permute) builds the plan; it must
    produce a routing equivalent to the numpy builder (maps may differ —
    colorings are not unique — but the applied permutation must be
    identical), and both paths must enforce the half-block budget."""
    from ellspmv_tpu.io import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(7)
    n = 260_000
    n_out = 300_000
    target = np.full(n, -1, np.int64)
    n_real = int(0.9 * n)
    ks = rng.choice(n, n_real, replace=False)
    # block-local-ish targets so the half-block budget holds at scale
    # (mirror the stream builder's megablock pre-ordering)
    tr = np.sort(rng.choice(n_out, n_real, replace=False))
    target[np.sort(ks)] = tr
    vals = rng.randn(n).astype(np.float32)

    plan_native = build_permute(target, n_out)
    (out_n,) = apply_permute(plan_native, vals, interpret=True)
    import os
    os.environ["ELLSPMV_TPU_NO_NATIVE"] = "1"
    try:
        plan_np = build_permute(target, n_out)
    finally:
        del os.environ["ELLSPMV_TPU_NO_NATIVE"]
    (out_np,) = apply_permute(plan_np, vals, interpret=True)
    assert (plan_native.HA, plan_native.HB) == (plan_np.HA, plan_np.HB)
    want = _apply_oracle(target, vals, plan_native.n_out)
    ok = ~np.isnan(want)
    np.testing.assert_array_equal(np.asarray(out_n)[ok], want[ok])
    np.testing.assert_array_equal(np.asarray(out_np)[ok], want[ok])


def test_permute_empty_and_single():
    plan = build_permute(np.full(100, -1, np.int64), 100)
    (out,) = apply_permute(plan, np.zeros(100, np.float32),
                           interpret=True)
    assert out.shape[0] == plan.n_out

    t = np.full(5, -1, np.int64)
    t[3] = 7
    plan = build_permute(t, 16)
    v = np.arange(5, dtype=np.float32)
    (out,) = apply_permute(plan, v, interpret=True)
    assert np.asarray(out)[7] == 3.0


def test_permute_rejects_bad_targets():
    with pytest.raises(ValueError):
        build_permute(np.array([0, 0]), 4)    # duplicate
    with pytest.raises(ValueError):
        build_permute(np.array([5]), 4)       # out of range


def test_permute_halfblock_budget():
    """An input block scattering into >3*128 destination blocks must be
    rejected (the caller pre-orders by destination megablock instead)."""
    n_blocks = 600
    # one input block, elements hitting 600 distinct destination blocks
    target = np.full(16384, -1, np.int64)
    target[:n_blocks] = np.arange(n_blocks) * 16384
    with pytest.raises(ValueError):
        build_permute(target, n_blocks * 16384)


def test_route_grid_batching_path(monkeypatch, rng):
    """ELLSPMV_TPU_ROUTE_BATCH>1 (the measured-slower ablation path) must
    stay correct: batched W1/W2 grids produce the identical permutation."""
    import importlib

    monkeypatch.setenv("ELLSPMV_TPU_ROUTE_BATCH", "2")
    import ellspmv_tpu.ops.permute as P
    importlib.reload(P)
    try:
        n = 5 * P.BLOCK
        target = rng.permutation(n).astype(np.int64)
        plan = P.build_permute(target, n)
        assert plan.NBi % 2 == 0 and plan.NBo % 2 == 0
        x = rng.rand(n).astype(np.float32)
        (out,) = P.apply_permute(plan.device_put(), x, interpret=True)
        want = np.zeros(plan.n_out, np.float32)
        want[target] = x
        np.testing.assert_array_equal(np.asarray(out)[target], x)
    finally:
        monkeypatch.delenv("ELLSPMV_TPU_ROUTE_BATCH")
        importlib.reload(P)
