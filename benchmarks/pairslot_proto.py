"""Prototype: pair-window slot assignment for banded-random matrices.

Block-bucketed slots hit a tile-max wall: ks is the span MAX over a
tile's 1024 rows, so any spill anywhere poisons the slot, and capacity
quantiles can't fix it (benchmarks 2026-08-18). This flips the design:
slot ranges are DECLARED to span adjacent rebased-block pairs {i, i+1}
(ks=2 by construction), each row greedily fills the left-expiring range
first, and range capacities come from an exact interval-covering solve:
for every block interval [a, b], sum of intersecting range capacities >=
max over rows of the interval's entry count (Hall's condition, so the
per-row greedy never overflows).

Static analysis (S, feasibility); run on CPU.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def pair_caps(cnt):
    """Exact minimal total capacity for ranges i={i,i+1}, i=0..nb-2, via
    the rightmost-greedy interval cover (integral optimum for interval
    covering with unit costs)."""
    import numpy as np
    n_pad, nb = cnt.shape
    P = np.zeros((n_pad, nb + 1), np.int32)
    np.cumsum(cnt, axis=1, out=P[:, 1:])
    caps = np.zeros(max(nb - 1, 1), np.int64)
    for b in range(nb):                    # right endpoint, ascending
        for a in range(b + 1):
            need = int((P[:, b + 1] - P[:, a]).max())
            lo, hi = max(a - 1, 0), min(b, nb - 2)
            have = int(caps[lo:hi + 1].sum())
            if have < need:
                caps[hi] += need - have
    return caps


def pair_assign(cols, vals, caps=None):
    """Re-slot a column-sorted padded ELL so slot range i only holds
    entries of rebased blocks {i, i+1}. Returns (slot, caps, blk, real,
    overflow_rows)."""
    import numpy as np

    n_pad, S = cols.shape
    real = vals != 0
    rows = np.arange(n_pad, dtype=np.int64)[:, None]
    blk = (cols.astype(np.int64) - ((rows >> 7) << 7)) >> 7   # slope-1
    bmin = int(blk[real].min())
    blk = np.where(real, blk - bmin, 0)
    nb = int(blk[real].max()) + 1
    cnt = np.zeros((n_pad, nb), np.int32)
    for b in range(nb):
        cnt[:, b] = ((blk == b) & real).sum(axis=1)
    if caps is None:
        caps = pair_caps(cnt)
    base = np.concatenate([[0], np.cumsum(caps)])   # range i slots
    # greedy per row, blocks left to right: block b fills range b-1's
    # leftover first (expires after b), then range b
    l = np.zeros((n_pad, nb), np.int32)
    r = np.zeros((n_pad, nb), np.int32)
    remL = np.zeros(n_pad, np.int32)
    for b in range(nb):
        n_b = cnt[:, b]
        l[:, b] = np.minimum(n_b, remL)
        rest = n_b - l[:, b]
        cap_b = int(caps[b]) if b < nb - 1 else 0
        r[:, b] = np.minimum(rest, cap_b)
        remL = cap_b - r[:, b]
    over = (l.sum(axis=1) + r.sum(axis=1)) != cnt.sum(axis=1)
    # slot index per entry: within range i, block i's right entries come
    # first (columns ascending), then block i+1's left entries
    # entry k of row with block b: rank among same-block entries
    idx_in_blk = np.zeros((n_pad, S), np.int32)
    for b in range(nb):
        m = (blk == b) & real
        idx_in_blk[m] = (np.cumsum(m, axis=1) - 1)[m]
    is_left = idx_in_blk < l[np.arange(n_pad)[:, None], blk]
    # left entries of block b: range b-1, after r[b-1] own entries
    rb = r[np.arange(n_pad)[:, None], blk]
    lb = l[np.arange(n_pad)[:, None], blk]
    prev_r = np.zeros((n_pad, S), np.int32)
    prev_r = r[np.arange(n_pad)[:, None], np.maximum(blk - 1, 0)]
    slot = np.where(
        is_left,
        base[np.maximum(blk - 1, 0)] + prev_r + idx_in_blk,
        base[np.minimum(blk, len(caps) - 1)] + (idx_in_blk - lb))
    slot = np.where(real, slot, -1)
    return slot, caps, blk, real, over


def main():
    import numpy as np
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--nnz", type=int, default=16)
    ap.add_argument("--bw", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.models.generators import banded_random
    from ellspmv_tpu.formats.ell import EllMatrix
    from ellspmv_tpu.ops import plan as plan_mod

    coo = banded_random(args.n, args.nnz, args.bw, seed=0)
    ell = ell_from_coo(coo, sort_rows=True, value_dtype=np.float64)
    cols = np.asarray(ell.colidx)
    vals = np.asarray(ell.values)

    slot, caps, blk, real, over = pair_assign(cols, vals)
    S_out = int(caps.sum())
    print(f"caps={caps.tolist()} S={S_out} overflow_rows={int(over.sum())}",
          flush=True)
    if over.any():
        return 1
    # materialize and run the real planner for span stats
    n_pad = cols.shape[0]
    pad_col = np.minimum(np.arange(n_pad), ell.num_columns - 1)
    nc = np.broadcast_to(pad_col[:, None], (n_pad, S_out)).astype(
        cols.dtype).copy()
    nv = np.zeros((n_pad, S_out), vals.dtype)
    rr = np.nonzero(real)
    nc[rr[0], slot[rr]] = cols[rr]
    nv[rr[0], slot[rr]] = vals[rr]
    e2 = EllMatrix(colidx=nc, values=nv, diag=ell.diag,
                   num_rows=ell.num_rows, num_columns=ell.num_columns,
                   num_nonzeros=ell.num_nonzeros)
    p = plan_mod.build_plan(e2, row_tile=1024, slope=1,
                            value_dtype=np.float64)
    if p is None:
        print("no plan", flush=True)
        return 1
    ks = p.qb[:, 1, :]
    print(f"S={p.rowsize} KS={p.KS} ks_mean={ks.mean():.2f} "
          f"exec={int(ks.max(axis=0).sum())}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
