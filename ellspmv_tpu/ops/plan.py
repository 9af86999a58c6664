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
- the ELL value/column arrays are re-laid out slot-major as (S*G, 128)
  blocks per tile so every kernel operand already has the (sublane, 128)
  shape the VPU wants — no in-kernel relayouts.

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
_VPU_SUBLANE_ROWS_PER_CYCLE = 8.0


def estimate_cycles(plan: "EllPlan", value_bytes: int, dd: bool) -> float:
    """Rough per-SpMV device cycles: max of the HBM stream time and the VPU
    gather/select/FMA time. Used only to rank candidate plans."""
    S, G, T = plan.rowsize, plan.G, plan.num_tiles
    nnz_slots = T * S * G * 128
    idx_bytes = 4
    hbm = (nnz_slots * (value_bytes + idx_bytes)
           + T * plan.K128 * 128 * value_bytes       # x window per tile
           + T * G * 128 * value_bytes)              # y
    gather_ops = (5 if dd else 3) * plan.KS + (20 if dd else 2)
    vpu = T * S * G * gather_ops / _VPU_SUBLANE_ROWS_PER_CYCLE * 8
    # Fixed per-grid-step cost (measured ~200-300 cycles on v5e: grid
    # bookkeeping + DMA issue) — punishes very small tiles.
    overhead = T * 250.0
    return max(hbm / _HBM_BYTES_PER_CYCLE, vpu) + overhead


def best_plan(ell, row_tiles=(1024, 512, 256, 128),
              max_ks: int = DEFAULT_MAX_KS,
              max_k128: int = DEFAULT_MAX_K128,
              value_dtype=np.float32) -> "EllPlan | None":
    """Build plans at several row-tile sizes and keep the cheapest by the
    cost model (smaller tiles narrow the per-slot windows — fewer gather
    steps — but re-DMA x more often)."""
    dd = np.dtype(value_dtype) == np.float64
    vb = 8 if dd else 4
    best = None
    best_cost = float("inf")
    for rt in row_tiles:
        p = build_plan(ell, row_tile=rt, max_ks=max_ks, max_k128=max_k128,
                       value_dtype=value_dtype)
        if p is None:
            continue
        c = estimate_cycles(p, vb, dd)
        if c < best_cost:
            best, best_cost = p, c
    return best


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
    vals: np.ndarray       # same shape, kernel dtype (f32 or f32x2 for dd)

    @property
    def vmem_window_bytes(self) -> int:
        return self.K128 * 128 * self.vals.dtype.itemsize


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_plan(ell, row_tile: int = DEFAULT_ROW_TILE,
               max_ks: int = DEFAULT_MAX_KS,
               max_k128: int = DEFAULT_MAX_K128,
               value_dtype=np.float32) -> EllPlan | None:
    """Build a kernel plan, or None if the matrix doesn't fit the kernel's
    locality budget (caller falls back)."""
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

    cols = np.zeros((n_pad, S), np.int64)
    vals = np.zeros((n_pad, S), np.float64)
    cols[:n_pad_in, :ell.rowsize] = np.asarray(ell.colidx)
    vals[:n_pad_in, :ell.rowsize] = np.asarray(ell.values)

    real = vals != 0.0
    # Padding/zero entries contribute 0 regardless of the gathered x value,
    # so give them column = tile window base (they never widen a window).
    BIG = np.int64(1) << 60
    cmin = np.where(real, cols, BIG).reshape(num_tiles, R, S)
    cmax = np.where(real, cols, -1).reshape(num_tiles, R, S)

    tile_min = cmin.min(axis=(1, 2))          # (T,)
    tile_max = cmax.max(axis=(1, 2))
    empty_tile = tile_max < 0
    tile_min = np.where(empty_tile, 0, tile_min)
    tile_max = np.where(empty_tile, 0, tile_max)

    wbase128 = (tile_min >> 7).astype(np.int64)
    K128 = int(np.max((tile_max >> 7) - wbase128 + 1))
    K128 = _round_up(max(K128, 1), 8)
    if K128 > max_k128 or K128 > nx128:
        K128 = min(K128, nx128)
        if K128 > max_k128:
            return None
    # Clamp windows so they fit inside x.
    wbase128 = np.minimum(wbase128, max(nx128 - K128, 0))

    slot_min = cmin.min(axis=1)               # (T, S)
    slot_max = cmax.max(axis=1)
    slot_empty = slot_max < 0
    slot_min = np.where(slot_empty, wbase128[:, None] << 7, slot_min)
    slot_max = np.where(slot_empty, wbase128[:, None] << 7, slot_max)

    qb = (slot_min >> 7) - wbase128[:, None]
    KS = int(np.max((slot_max >> 7) - (wbase128[:, None] + qb) + 1))
    KS = max(KS, 1)
    if KS > max_ks:
        return None
    # Slot sub-windows must stay inside the tile window.
    qb = np.minimum(qb, np.maximum(K128 - KS, 0)).astype(np.int64)

    base = (wbase128[:, None] + qb) << 7      # (T, S) absolute sub-window
    lcol = cols.reshape(num_tiles, R, S) - base[:, None, :]
    lcol = np.where(real.reshape(num_tiles, R, S), lcol, 0)
    if lcol.min() < 0 or lcol.max() >= KS * 128:
        # Shouldn't happen; fall back rather than gather out of window.
        return None

    # Slot-major relayout: (T, R, S) -> (T, S*G, 128) per-tile blocks
    def relayout(a, dt):
        return np.ascontiguousarray(
            a.reshape(num_tiles, G, 128, S).transpose(0, 3, 1, 2)
        ).reshape(num_tiles, S * G, 128).astype(dt)

    return EllPlan(
        rowsize=S, num_tiles=num_tiles, G=G, KS=KS, K128=K128,
        n_pad=n_pad, nx128=nx128,
        wbase128=wbase128.astype(np.int32),
        qb=qb.astype(np.int32),
        lcol=relayout(lcol, np.int32),
        vals=relayout(vals, value_dtype),
    )
