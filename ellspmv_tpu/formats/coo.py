"""COO triplet container — the load-time format.

The reference holds COO as three malloc'd arrays straight out of the MM
parser (ellspmv.c:1316-1356). Here it is a small host-side dataclass of NumPy
arrays (0-based indices) with the shared preprocessing steps used by every
downstream format conversion: symmetric expansion and diagonal extraction.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CooMatrix:
    num_rows: int
    num_columns: int
    rowidx: np.ndarray   # (nnz,) int32/int64, 0-based
    colidx: np.ndarray   # (nnz,) int32/int64, 0-based
    values: np.ndarray   # (nnz,) float
    symmetry: str = "general"   # 'general' | 'symmetric'
    field: str = "real"

    @property
    def num_nonzeros(self) -> int:
        """Stored entries (file entries; symmetric off-diagonals count once)."""
        return int(self.rowidx.shape[0])

    def expand_symmetry(self) -> "CooMatrix":
        """Materialize the transpose images of off-diagonal entries.

        Matches csr_from_coo's symmetric handling (csrspmv.c:1409-1427): each
        off-diagonal (i, j, v) contributes both (i, j, v) and (j, i, v);
        diagonal entries contribute once. The reference's ellspmv never
        expands (it treats symmetric files as their stored triangle — a
        documented divergence we do NOT reproduce; SURVEY §7).
        """
        if self.symmetry != "symmetric":
            return self
        off = self.rowidx != self.colidx
        rowidx = np.concatenate([self.rowidx, self.colidx[off]])
        colidx = np.concatenate([self.colidx, self.rowidx[off]])
        values = np.concatenate([self.values, self.values[off]])
        return CooMatrix(self.num_rows, self.num_columns,
                         rowidx, colidx, values, "general", self.field)

    def split_diagonal(self):
        """Split entries into (off-diagonal COO, dense diagonal vector).

        Duplicate diagonal entries accumulate (ellspmv.c:1100 uses ``+=``).
        The diagonal has length min(rows, cols) as in ell_from_coo_size
        (ellspmv.c:956).
        """
        diag_len = min(self.num_rows, self.num_columns)
        on_diag = self.rowidx == self.colidx
        diag = np.zeros(diag_len, dtype=self.values.dtype)
        np.add.at(diag, self.rowidx[on_diag], self.values[on_diag])
        rest = CooMatrix(self.num_rows, self.num_columns,
                         self.rowidx[~on_diag], self.colidx[~on_diag],
                         self.values[~on_diag], self.symmetry, self.field)
        return rest, diag

    def row_counts(self) -> np.ndarray:
        """Nonzeros per row (ell_from_coo_size's histogram,
        ellspmv.c:946-949)."""
        return np.bincount(self.rowidx, minlength=self.num_rows).astype(
            self.rowidx.dtype)

    def to_dense(self) -> np.ndarray:
        """Dense oracle for tests (duplicates accumulate)."""
        a = np.zeros((self.num_rows, self.num_columns),
                     dtype=np.result_type(self.values.dtype, np.float64))
        coo = self.expand_symmetry()
        np.add.at(a, (coo.rowidx, coo.colidx), coo.values)
        return a
