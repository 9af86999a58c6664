"""Sliced-ELL + CSR-tail hybrid — for skewed (power-law) matrices.

Plain ELLPACK pads every row to the global max row length
(ellsize = num_rows * max_row_nnz, ellspmv.c:955), which explodes on
power-law matrices (BASELINE configs[3]). The TPU-native hybrid:

- rows are processed in slices of ``slice_rows`` (= the Pallas kernel's row
  tile, so a slice is exactly one kernel grid step);
- each slice stores only its own max row length, and slices are bucketed by
  that length (rounded to the next power of two) into a handful of
  EllMatrix instances — one Pallas/XLA kernel launch per bucket instead of
  one global padded monolith;
- entries beyond ``tail_cap`` per row (the ultra-long hub rows) split into
  a CSR tail evaluated as a segment reduction;
- y is reassembled by a slice-granular (not element-granular) gather, which
  the TPU handles at DMA-friendly 4KB+ granularity.

This format is new relative to the reference (SURVEY §7 'ELL padding
blowup' risk); its SpMV semantics are still ``y := A*x + y``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ellspmv_tpu.formats.coo import CooMatrix
from ellspmv_tpu.formats.csr import CsrMatrix, csr_from_coo
from ellspmv_tpu.formats.ell import EllMatrix, ell_from_coo


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class SellMatrix:
    buckets: list           # list[EllMatrix], one per rowsize bucket
    order: np.ndarray       # (T,) int: original tile t lives at concat pos
    slice_rows: int
    tail: Optional[CsrMatrix]
    num_rows: int
    num_columns: int
    num_nonzeros: int
    # SELL-sigma: rows sorted by length before slicing so each slice is
    # uniform (row_unperm maps sorted y back to natural order); None when
    # length sorting is off.
    row_unperm: Optional[np.ndarray] = None

    @property
    def sellsize(self) -> int:
        """Stored slots across buckets (the ELL-padding-free work size)."""
        return sum(b.ellsize for b in self.buckets)

    @property
    def tailsize(self) -> int:
        return 0 if self.tail is None else self.tail.csrsize

    @property
    def values(self):
        # dtype carrier for the bench harness
        return self.buckets[0].values if self.buckets else self.tail.values

    def device_put(self, value_dtype=None) -> "SellMatrix":
        import jax.numpy as jnp
        return SellMatrix(
            [b.device_put(value_dtype) for b in self.buckets],
            jnp.asarray(np.asarray(self.order)), self.slice_rows,
            None if self.tail is None else self.tail.device_put(value_dtype),
            self.num_rows, self.num_columns, self.num_nonzeros,
            None if self.row_unperm is None
            else jnp.asarray(np.asarray(self.row_unperm)))


def sell_from_coo(coo: CooMatrix, slice_rows: int = 1024,
                  tail_cap: int = 64, sort_rows: bool = True,
                  length_sort: bool = False,
                  value_dtype=None, index_dtype=None) -> SellMatrix:
    """Convert COO to the bucketed sliced-ELL + CSR-tail hybrid.

    `length_sort=True` is SELL-sigma: rows are permuted by descending
    nonzero count before slicing, so slices are length-uniform — long rows
    land together in wide buckets (evaluated as scatter-free row sums)
    instead of spilling into the CSR tail, whose segment-sum scatter is the
    slowest primitive on TPU. y is un-permuted on output (one n-sized
    gather)."""
    coo = coo.expand_symmetry()
    n, m = coo.num_rows, coo.num_columns
    nnz_total = coo.num_nonzeros
    R = slice_rows

    row_unperm = None
    if length_sort and n:
        cnt0 = np.bincount(coo.rowidx, minlength=n)
        perm = np.argsort(-cnt0, kind="stable")      # old row at position k
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        coo = CooMatrix(n, m, inv[coo.rowidx].astype(coo.rowidx.dtype),
                        coo.colidx, coo.values)
        row_unperm = inv                              # y_nat = y_sorted[inv]

    n_pad = max(_round_up(n, R), R)
    T = n_pad // R

    # rank of each entry within its row (stable by file order, or by column
    # when sorting — matching rowsort's effect, ellspmv.c:960-1079)
    if sort_rows:
        order = np.lexsort((coo.colidx, coo.rowidx))
    else:
        order = np.argsort(coo.rowidx, kind="stable")
    rows = coo.rowidx[order]
    cols = coo.colidx[order]
    vals = coo.values[order]
    counts = np.bincount(rows, minlength=n_pad)
    rowptr = np.concatenate([[0], np.cumsum(counts)])
    rank = np.arange(len(rows)) - rowptr[rows]

    in_tail = rank >= tail_cap
    tail = None
    if in_tail.any():
        tail_coo = CooMatrix(n, m, rows[in_tail], cols[in_tail],
                             vals[in_tail])
        tail = csr_from_coo(tail_coo, value_dtype=value_dtype,
                            index_dtype=index_dtype)
    keep = ~in_tail
    rows, cols, vals, rank = rows[keep], cols[keep], vals[keep], rank[keep]

    # per-slice rowsize (capped), bucketed to powers of two ≥ 4
    capped = np.minimum(counts[:n_pad], tail_cap)
    slice_s = capped.reshape(T, R).max(axis=1)
    bucket_s = np.maximum(4, 2 ** np.ceil(
        np.log2(np.maximum(slice_s, 1))).astype(np.int64))
    bucket_sizes = sorted(set(int(b) for b in bucket_s))

    buckets = []
    concat_pos = np.zeros(T, np.int64)
    pos = 0
    tile_of_row = rows // R
    for S in bucket_sizes:
        tiles = np.nonzero(bucket_s == S)[0]
        concat_pos[tiles] = pos + np.arange(len(tiles))
        pos += len(tiles)
        # select entries of these tiles; renumber rows contiguously
        tile_rank = np.full(T, -1, np.int64)
        tile_rank[tiles] = np.arange(len(tiles))
        sel = tile_rank[tile_of_row] >= 0
        sub_rows = tile_rank[tile_of_row[sel]] * R + rows[sel] % R
        sub = CooMatrix(len(tiles) * R, m, sub_rows, cols[sel], vals[sel])
        buckets.append(ell_from_coo(sub, sort_rows=sort_rows,
                                    value_dtype=value_dtype,
                                    index_dtype=index_dtype,
                                    row_tile=R, rowsize=S))
    return SellMatrix(buckets=buckets, order=concat_pos, slice_rows=R,
                      tail=tail, num_rows=n, num_columns=m,
                      num_nonzeros=nnz_total, row_unperm=row_unperm)


def sell_spmv(sm: SellMatrix, x, y=None, backend: str = "auto"):
    """y := A*x + y over the hybrid: per-bucket ELL kernels, slice-granular
    reassembly, segment-sum tail."""
    import jax.numpy as jnp

    from ellspmv_tpu.ops import spmv as _spmv
    from ellspmv_tpu.ops.csr_xla import csr_spmv_xla

    x = jnp.asarray(x)
    R = sm.slice_rows
    parts = []
    for b in sm.buckets:
        yb = _spmv(b, x, None, backend=backend)      # (bucket_rows,)
        parts.append(yb.reshape(-1, R))
    tiles = jnp.concatenate(parts, axis=0)           # (T, R) concat order
    y2d = tiles[jnp.asarray(np.asarray(sm.order))]   # original tile order
    out = y2d.reshape(-1)[:sm.num_rows]
    if sm.tail is not None:
        out = csr_spmv_xla(sm.tail, x, out)
    if sm.row_unperm is not None:                    # SELL-sigma un-permute
        out = out[jnp.asarray(np.asarray(sm.row_unperm))]
    if y is not None:
        out = out + jnp.asarray(y).astype(out.dtype)
    return out
