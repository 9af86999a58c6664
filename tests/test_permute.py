"""Static-permutation engine (ops/permute.py): host Clos routing planner
(take granules + Koenig-colored 3-gather route kernel) vs a plain numpy
permutation oracle. Kernels run in Pallas interpret mode on CPU."""

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
    # random bipartite multigraph with max degree <= deg on both sides
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
    # cap degrees at 128 (they are ~78 expected, fine)
    col = native.edge_color(src, dst, 128)
    _check_coloring(src, dst, col, 128)


def _apply_oracle(target, pre, vals_orig, n_out_pad):
    """out[target[k]] = vals_orig[k]; unspecified positions = nan."""
    out = np.full(n_out_pad, np.nan, np.float32)
    for j, k in enumerate(pre):
        if k >= 0 and target[k] >= 0:
            out[target[k]] = vals_orig[k]
    return out


@pytest.mark.parametrize("seed,n,n_out,free_block,sup_rows", [
    (0, 1000, 1000, 256, 64),      # multiple supertiles
    (1, 5000, 5000, 512, 64),
    (2, 300, 2000, 128, 32),       # sparse targets (gaps in output)
    (3, 4096, 4096, 4096, 256),    # one free block, one supertile
    (4, 130, 130, 128, 32),        # tiny
])
def test_permute_matches_oracle(seed, n, n_out, free_block, sup_rows):
    rng = np.random.RandomState(seed)
    target = np.full(n, -1, np.int64)
    n_real = int(0.9 * n)
    ks = rng.choice(n, n_real, replace=False)
    target[ks] = rng.choice(n_out, n_real, replace=False)
    vals = rng.randn(n).astype(np.float32)
    vals2 = rng.randn(n).astype(np.float32)

    pb = build_permute(target, n_out, free_block=free_block,
                       sup_rows=sup_rows)
    plan, pre = pb.plan, pb.pre
    assert plan.n_in == len(pre)
    # caller-side pre-ordering of the stored stream
    v_in = np.where(pre >= 0, vals[np.maximum(pre, 0)], 0).astype(np.float32)
    v2_in = np.where(pre >= 0, vals2[np.maximum(pre, 0)],
                     0).astype(np.float32)

    out, out2 = apply_permute(plan, v_in, v2_in, interpret=True)
    out, out2 = np.asarray(out), np.asarray(out2)
    want = _apply_oracle(target, pre, vals, plan.n_out)
    ok = ~np.isnan(want)
    np.testing.assert_array_equal(out[ok], want[ok])
    want2 = _apply_oracle(target, pre, vals2, plan.n_out)
    np.testing.assert_array_equal(out2[ok], want2[ok])


def test_permute_rejects_bad_targets():
    with pytest.raises(ValueError):
        build_permute(np.array([0, 0]), 4, free_block=128)   # duplicate
    with pytest.raises(ValueError):
        build_permute(np.array([5]), 4, free_block=128)      # out of range
    with pytest.raises(ValueError):
        build_permute(np.array([0]), 4, free_block=100)      # bad block
