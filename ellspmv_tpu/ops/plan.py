"""Host-side kernel plan for the Pallas ELLPACK SpMV kernel.

The TPU kernel cannot gather x[col] arbitrarily: Mosaic's dynamic gather
works within 128-lane groups only. The plan restructures a (row-sorted)
EllMatrix so every gather the kernel issues is a narrow, lane-local one:

- rows are processed in tiles of ``R`` (= ``G``×128) rows;
- each tile's x accesses fall inside a per-tile window of ``K128``×128
  entries, DMA'd HBM→VMEM once per tile (the sector-cache analogue: x stays
  on-chip while a/colidx stream past it, ellspmv.c:1737-1743 / SURVEY §5);
- within a tile, each ELL slot s (column rank, thanks to --sort-rows) is a
  quasi-diagonal whose columns span only ``KS``×128 entries; the kernel
  resolves a slot's gathers with KS lane-gather+select steps from the
  slot's sub-window (``qb[t, s]``);
- the ELL value/column arrays are re-laid out slot-major as (T, S*G, 128)
  per-tile blocks so every kernel operand already has the (sublane, 128)
  shape the VPU wants — no in-kernel relayouts.

Tile-size selection is two-phase for speed: per-slot column extrema are
computed once at the finest (128-row) granularity and folded to each
candidate tile size; only the winning candidate's operands are
materialized.

The plan degrades gracefully: matrices whose windows would be too wide
(KS or K128 over budget — e.g. unsorted or power-law columns) return None
and the caller falls back to the XLA path or a hybrid split.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Budgets. KS is the number of gather+select steps per slot; K128 the x
# window height in 128-element rows (VMEM scratch = K128*512 bytes per
# buffer for f32).
DEFAULT_MAX_KS = 64
DEFAULT_MAX_K128 = 2048      # 1 MiB f32 window
DEFAULT_ROW_TILE = 1024

# Cost-model constants for plan selection (v5e-class): HBM bytes per core
# cycle, and VPU (8,128)-op issue per cycle.
_HBM_BYTES_PER_CYCLE = 870.0
_VPU_SUBLANE_ROWS_PER_CYCLE = 24.0   # v5e measured ~3 (8,128)-ops/cycle
# Fixed per-grid-step cost (measured ~200-300 cycles on v5e: grid
# bookkeeping + DMA issue) — punishes very small tiles.
_TILE_OVERHEAD_CYCLES = 300.0

_I32_BIG = np.int32(np.iinfo(np.int32).max)


@dataclasses.dataclass
class EllPlan:
    """Device-ready operands for the Pallas ELL kernel (all numpy here;
    `ell_pallas` moves them to the device once and caches)."""

    rowsize: int
    num_tiles: int
    G: int                 # 128-row groups per tile
    KS: int                # gather steps per slot
    K128: int              # x window height in 128-rows
    n_pad: int             # padded row count (num_tiles * G * 128)
    nx128: int             # padded x length in 128-blocks
    wbase128: np.ndarray   # (num_tiles,) int32: x window start / 128
    qb: np.ndarray         # (num_tiles, rowsize) int32: slot sub-window base
    lcol: np.ndarray       # (num_tiles, rowsize*G, 128) int32 local columns
    vals: np.ndarray       # same shape, kernel dtype (f32, or f64 for dd)

    @property
    def vmem_window_bytes(self) -> int:
        return self.K128 * 128 * self.vals.dtype.itemsize


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cost(T, S, G, KS, K128, value_bytes, dd) -> float:
    """Rough per-SpMV device cycles: max of the HBM stream time and the VPU
    gather/select/FMA time, plus per-tile fixed overhead. Ranks candidate
    tile sizes only."""
    nnz_slots = T * S * G * 128
    hbm = (nnz_slots * (value_bytes + 4)
           + T * K128 * 128 * value_bytes        # x window per tile
           + T * G * 128 * value_bytes)          # y
    gather_ops = (5 if dd else 3) * KS + (20 if dd else 2)
    vpu = T * S * G * gather_ops / _VPU_SUBLANE_ROWS_PER_CYCLE * 8
    return max(hbm / _HBM_BYTES_PER_CYCLE, vpu) + T * _TILE_OVERHEAD_CYCLES


def estimate_cycles(plan: "EllPlan", value_bytes: int, dd: bool) -> float:
    return _cost(plan.num_tiles, plan.rowsize, plan.G, plan.KS, plan.K128,
                 value_bytes, dd)


class _Stats:
    """Per-slot column extrema at 128-row granularity, foldable to any
    tile size that is a multiple of 128."""

    def __init__(self, ell):
        S = ell.rowsize
        n_pad_in = ell.padded_rows
        n128 = _round_up(n_pad_in, 128)
        cols = np.zeros((n128, S), np.int32)
        cols[:n_pad_in] = np.asarray(ell.colidx, np.int32)
        real = np.zeros((n128, S), bool)
        real[:n_pad_in] = np.asarray(ell.values) != 0
        t128 = n128 // 128
        self.smin = np.where(real, cols, _I32_BIG).reshape(
            t128, 128, S).min(axis=1)                    # (t128, S)
        self.smax = np.where(real, cols, np.int32(-1)).reshape(
            t128, 128, S).max(axis=1)
        self.t128 = t128
        self.S = S

    def fold(self, G: int):
        """Slot extrema for tiles of G*128 rows: (T, S) arrays."""
        t = _round_up(self.t128, G) // G
        smin = np.full((t * G, self.S), _I32_BIG, np.int32)
        smax = np.full((t * G, self.S), -1, np.int32)
        smin[:self.t128] = self.smin
        smax[:self.t128] = self.smax
        return (smin.reshape(t, G, self.S).min(axis=1),
                smax.reshape(t, G, self.S).max(axis=1))


def _windows(smin, smax, nx128, max_ks, max_k128):
    """Derive (wbase128, K128, qb, KS) from per-tile slot extrema, or None
    when over budget."""
    tile_min = smin.min(axis=1)
    tile_max = smax.max(axis=1)
    empty = tile_max < 0
    tile_min = np.where(empty, 0, tile_min)
    tile_max = np.where(empty, 0, tile_max)

    wbase128 = (tile_min.astype(np.int64) >> 7)
    K128 = int(np.max((tile_max.astype(np.int64) >> 7) - wbase128 + 1))
    K128 = _round_up(max(K128, 1), 8)
    if K128 > max_k128 or K128 > nx128:
        K128 = min(K128, nx128)
        if K128 > max_k128:
            return None
    wbase128 = np.minimum(wbase128, max(nx128 - K128, 0))

    slot_empty = smax < 0
    smin64 = np.where(slot_empty, wbase128[:, None] << 7,
                      smin.astype(np.int64))
    smax64 = np.where(slot_empty, wbase128[:, None] << 7,
                      smax.astype(np.int64))
    qb = (smin64 >> 7) - wbase128[:, None]
    KS = int(np.max((smax64 >> 7) - (wbase128[:, None] + qb) + 1))
    KS = max(KS, 1)
    if KS > max_ks:
        return None
    qb = np.minimum(qb, np.maximum(K128 - KS, 0))
    return wbase128, K128, qb, KS


def build_plan(ell, row_tile: int = DEFAULT_ROW_TILE,
               max_ks: int = DEFAULT_MAX_KS,
               max_k128: int = DEFAULT_MAX_K128,
               value_dtype=np.float32, _stats=None) -> EllPlan | None:
    """Build a kernel plan at one tile size, or None if over budget."""
    S = ell.rowsize
    if S == 0:
        return None
    n_pad_in = ell.padded_rows
    m = ell.num_columns
    R = min(row_tile, max(128, _round_up(n_pad_in, 128)))
    G = R // 128
    n_pad = _round_up(n_pad_in, R)
    num_tiles = n_pad // R
    # x window rows and the padded x height must be sublane-aligned (8):
    # odd-height DMAs into VMEM scratch fault the TPU.
    nx128 = _round_up(max(_round_up(m, 128) // 128, 1), 8)

    stats = _stats if _stats is not None else _Stats(ell)
    win = _windows(*stats.fold(G), nx128, max_ks, max_k128)
    if win is None:
        return None
    wbase128, K128, qb, KS = win

    cols = np.zeros((n_pad, S), np.int32)
    cols[:n_pad_in] = np.asarray(ell.colidx, np.int32)
    real = np.zeros((n_pad, S), bool)
    real[:n_pad_in] = np.asarray(ell.values) != 0

    # Padding/zero entries contribute 0 regardless of the gathered x value;
    # give them local column 0 (they never widen a window).
    base = ((wbase128[:, None] + qb) << 7).astype(np.int64)  # (T, S)
    lcol = cols.reshape(num_tiles, R, S).astype(np.int64) - base[:, None, :]
    lcol = np.where(real.reshape(num_tiles, R, S), lcol, 0)
    if lcol.min() < 0 or lcol.max() >= KS * 128:
        # Shouldn't happen; fall back rather than gather out of window.
        return None

    vals = np.zeros((n_pad, S), np.dtype(value_dtype))
    vals[:n_pad_in] = np.asarray(ell.values)

    # Slot-major relayout: (T, R, S) -> (T, S*G, 128) per-tile blocks
    def relayout(a, dt):
        return np.ascontiguousarray(
            a.reshape(num_tiles, G, 128, S).transpose(0, 3, 1, 2)
        ).reshape(num_tiles, S * G, 128).astype(dt, copy=False)

    return EllPlan(
        rowsize=S, num_tiles=num_tiles, G=G, KS=KS, K128=K128,
        n_pad=n_pad, nx128=nx128,
        wbase128=wbase128.astype(np.int32),
        qb=qb.astype(np.int32),
        lcol=relayout(lcol, np.int32),
        vals=relayout(vals, np.dtype(value_dtype)),
    )


def best_plan(ell, row_tiles=(1024, 512, 256, 128),
              max_ks: int = DEFAULT_MAX_KS,
              max_k128: int = DEFAULT_MAX_K128,
              value_dtype=np.float32) -> EllPlan | None:
    """Pick the cheapest tile size by the cost model over shared stats,
    materializing only the winner (smaller tiles narrow the per-slot
    windows — fewer gather steps — but re-DMA x more often)."""
    S = ell.rowsize
    if S == 0:
        return None
    dd = np.dtype(value_dtype) == np.float64
    vb = 8 if dd else 4
    m = ell.num_columns
    nx128 = _round_up(max(_round_up(m, 128) // 128, 1), 8)
    stats = _Stats(ell)
    best_rt, best_cost = None, float("inf")
    for rt in row_tiles:
        R = min(rt, max(128, _round_up(ell.padded_rows, 128)))
        G = R // 128
        win = _windows(*stats.fold(G), nx128, max_ks, max_k128)
        if win is None:
            continue
        _, K128, _, KS = win
        T = _round_up(ell.padded_rows, R) // R
        c = _cost(T, S, G, KS, K128, vb, dd)
        if c < best_cost:
            best_rt, best_cost = rt, c
    if best_rt is None:
        return None
    return build_plan(ell, row_tile=best_rt, max_ks=max_ks,
                      max_k128=max_k128, value_dtype=value_dtype,
                      _stats=stats)
