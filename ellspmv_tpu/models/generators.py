"""Benchmark matrix generators — the framework's "model families".

The reference benchmarks whatever Matrix Market file it is given; the
driver's benchmark configs (BASELINE.json) name specific matrix classes.
These generators build them directly as COO, so benchmarks need no giant
.mtx files on disk:

- `poisson2d`: 2-D 5-point Poisson stencil (uniform 5 nnz/row — ideal ELL,
  zero padding; BASELINE configs[1]);
- `banded_random`: random banded matrix (FEM-like bounded bandwidth —
  the cant/consph stand-in; configs[2]);
- `power_law`: skewed row/column degree matrix (webbase-like; the ELL
  padding blowup + hybrid-format case; configs[3]);
- `dense_rows`: pathological few-dense-rows case for the SELL/CSR-tail
  split.
"""

from __future__ import annotations

import numpy as np

from ellspmv_tpu.formats.coo import CooMatrix


def poisson2d(nx: int, ny: int | None = None, value_dtype=np.float64
              ) -> CooMatrix:
    """5-point Laplacian on an nx×ny grid, natural (row-major) ordering.

    Row i=(r,c) couples to (r±1,c) and (r,c±1) with -1, diagonal 4.
    """
    if ny is None:
        ny = nx
    n = nx * ny
    idx = np.arange(n, dtype=np.int64)
    r, c = idx // ny, idx % ny
    rows = [idx]
    cols = [idx]
    vals = [np.full(n, 4.0)]
    for (dr, dc) in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        rr, cc = r + dr, c + dc
        ok = (rr >= 0) & (rr < nx) & (cc >= 0) & (cc < ny)
        rows.append(idx[ok])
        cols.append((rr * ny + cc)[ok])
        vals.append(np.full(ok.sum(), -1.0))
    rowidx = np.concatenate(rows)
    colidx = np.concatenate(cols)
    values = np.concatenate(vals).astype(value_dtype)
    idx_dt = np.int32 if n < 2**31 else np.int64
    return CooMatrix(n, n, rowidx.astype(idx_dt), colidx.astype(idx_dt),
                     values)


def banded_random(n: int, nnz_per_row: int, bandwidth: int,
                  seed: int = 0, value_dtype=np.float64) -> CooMatrix:
    """Random matrix with `nnz_per_row` entries per row, columns uniform in
    a ±bandwidth window around the diagonal (FEM-like locality)."""
    rng = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    off = rng.randint(-bandwidth, bandwidth + 1, size=n * nnz_per_row)
    cols = np.clip(rows + off, 0, n - 1)
    # dedupe (row, col) pairs to keep exact nnz counting simple
    keys = rows * n + cols
    _, keep = np.unique(keys, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.randn(len(rows)).astype(value_dtype)
    idx_dt = np.int32 if n < 2**31 else np.int64
    return CooMatrix(n, n, rows.astype(idx_dt), cols.astype(idx_dt), vals)


def power_law(n: int, avg_nnz_per_row: int, alpha: float = 1.8,
              seed: int = 0, value_dtype=np.float64) -> CooMatrix:
    """Skewed matrix: row lengths ~ Zipf(alpha) capped at n, columns chosen
    by preferential attachment (hub columns) — a webbase-like structure."""
    rng = np.random.RandomState(seed)
    raw = rng.zipf(alpha, size=n).astype(np.int64)
    counts = np.minimum(raw, n)
    scale = counts.sum() / (avg_nnz_per_row * n)
    counts = np.maximum(1, (counts / max(scale, 1e-9)).astype(np.int64))
    counts = np.minimum(counts, n)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    # column popularity ~ power law too
    popularity = 1.0 / np.arange(1, n + 1) ** 0.8
    popularity /= popularity.sum()
    cols = rng.choice(n, size=len(rows), p=popularity)
    keys = rows * n + cols
    _, keep = np.unique(keys, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.randn(len(rows)).astype(value_dtype)
    idx_dt = np.int32 if n < 2**31 else np.int64
    return CooMatrix(n, n, rows.astype(idx_dt), cols.astype(idx_dt), vals)


def dense_rows(n: int, base_nnz: int, num_dense: int, dense_nnz: int,
               seed: int = 0, value_dtype=np.float64) -> CooMatrix:
    """Mostly-uniform matrix with a few very long rows — the worst case for
    plain ELL (rowsize = dense_nnz for every row)."""
    rng = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), base_nnz)
    cols = rng.randint(0, n, len(rows))
    drows = rng.choice(n, num_dense, replace=False)
    rows = np.concatenate([rows, np.repeat(drows, dense_nnz)])
    cols = np.concatenate([cols,
                           rng.randint(0, n, num_dense * dense_nnz)])
    keys = rows * n + cols
    _, keep = np.unique(keys, return_index=True)
    rows, cols = rows[keep], cols[keep]
    vals = rng.randn(len(rows)).astype(value_dtype)
    idx_dt = np.int32 if n < 2**31 else np.int64
    return CooMatrix(n, n, rows.astype(idx_dt), cols.astype(idx_dt), vals)
