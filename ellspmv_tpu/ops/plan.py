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
import os

import numpy as np

# Budgets. KS is the number of gather+select steps per slot; K128 the x
# window height in 128-element rows (VMEM scratch = K128*512 bytes per
# buffer for f32). Moving windows are double-buffered (DMA'd per tile);
# static windows hold the WHOLE padded x image in VMEM once (single
# buffer, one DMA) — the resident-x scan path for random-column matrices
# (power-law rest parts), where each slot select-scans its column bucket
# instead of a narrow quasi-diagonal. KS is only a loop bound (the
# per-slot counts in qb[:,1] bound the actual work), so the budget is
# generous; VMEM feasibility is what actually gates plans.
DEFAULT_MAX_KS = 4096
DEFAULT_MAX_K128 = 2048      # 1 MiB f32 window per moving buffer
DEFAULT_ROW_TILE = 1024
# Slot-space cap. The kernel unrolls slots only up to its
# _SLOT_UNROLL_MAX (16) and runs a dynamic slot loop beyond, so wide slot
# spaces no longer blow up compile size; the cap bounds the lcol/vals
# VMEM tiles and the padding blowup of widened column-bucket plans.
MAX_ROWSIZE = 512

# Cost-model constants for plan selection come from the per-device
# calibration (bench/calibrate.py; measured v5e values as fallback):
# HBM bytes per core cycle, VPU (8,128)-op issue per cycle, and the fixed
# per-grid-step cost (grid bookkeeping + DMA issue — punishes tiny tiles).
# Scoped VMEM budget for a kernel instance (v5e exposes ~16 MiB; leave
# headroom for Mosaic's own staging).
VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _vmem_bytes(S, G, KS, K128, dd, lcol16=True, static=False):
    # Estimated per-kernel VMEM: double-buffered lcol/vals tiles (the
    # Pallas pipeline), the x window scratch (double-buffered when moving,
    # single when static/resident), and y tiles.
    tile = S * G * 128
    lcol = tile * (2 if lcol16 else 4) * 2
    vals = tile * 4 * 2 * (2 if dd else 1)
    xw = (1 if static else 2) * K128 * 128 * 4 * (2 if dd else 1)
    y = G * 128 * 4 * 2 * (2 if dd else 1)
    return lcol + vals + xw + y

_I32_BIG = np.int32(np.iinfo(np.int32).max)    # empty-min sentinel
_I32_SMALL = np.int32(np.iinfo(np.int32).min)  # empty-max sentinel
# slope-1 rebased columns can be legitimately negative (as low as
# -(G-1)*128), so emptiness needs sentinels far outside any real value
_EMPTY_MIN = np.int64(1) << 60
_EMPTY_MAX = -(np.int64(1) << 60)


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
    nx128: int             # padded x image length in 128-blocks
    lead: int              # leading zero 128-rows in the x image
    slope: int             # 0: raw columns; 1: per-group rebased (diagonal)
    static_window: int     # 1: window = whole x image, DMA'd once (resident)
    wbase128: np.ndarray   # (num_tiles,) int32: x window start / 128
    qb: np.ndarray         # (T, 2, rowsize) int32: [qb; per-slot ks]
    lcol: np.ndarray       # (num_tiles, rowsize*G, 128) int32 local columns
    vals: np.ndarray       # same shape, kernel dtype (f32, or f64 for dd)

    @property
    def vmem_window_bytes(self) -> int:
        return self.K128 * 128 * self.vals.dtype.itemsize


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gather_penalty(G: int) -> float:
    """Measured v5e: the dynamic lane gather stays cheap on (<=8, 128)
    operands and ~1.75x per step beyond that (joint fit over the
    2026-08-19 end-to-end sweeps: banded block/32 at G=8/16/32/64 =
    1.312/1.577/1.645/1.829 ms, raw S=16 ks=7.5 at G=8 = 1.388 ms,
    poisson at G=8..64 = 0.175/0.127/0.095/0.0945 ms — solved together
    with the effective VPU rate, since rate and penalty are degenerate
    at any single point). Only decisive when the VPU term is actually
    exposed (vpu > hbm in _cost's max): stencil-class plans stay
    HBM-bound at any G, so big row tiles win there."""
    return 1.0 if G <= 8 else 1.75


def _sub_estimate(S, G, KS, K128, dd, static) -> int:
    """Supertile factor DevicePlan will likely pick (VMEM-feasible); the
    exact choice re-checks against the joint window at build time."""
    if static:
        return 1
    for cand in (8, 4, 2):
        if _vmem_bytes(S * cand, G, KS, K128, dd) <= VMEM_BUDGET_BYTES:
            return cand
    return 1


def _lcol_bytes(KS: int) -> int:
    """Bytes per stored local column at this window span (mirrors
    build_plan's int8/int16 narrowing, including the env disables)."""
    if KS * 128 <= 256 and os.environ.get("ELLSPMV_TPU_LCOL8", "1") != "0":
        return 1
    if (KS * 128 <= np.iinfo(np.int16).max
            and os.environ.get("ELLSPMV_TPU_LCOL16", "1") != "0"):
        return 2
    return 4


def _cost(T, S, G, KS, K128, value_bytes, dd, static=False,
          ks_lcol=None) -> float:
    """Rough per-SpMV device cycles: max of the HBM stream time and the VPU
    gather/select/FMA time, plus per-grid-step fixed overhead (amortized
    by the supertile factor DevicePlan applies, which still pays a smaller
    per-SUBTILE cost — window re-slicing + the shared-body fori step).
    Ranks candidate tile sizes only."""
    from ellspmv_tpu.bench import calibrate
    nnz_slots = T * S * G * 128
    hbm = (nnz_slots * (value_bytes
                        + _lcol_bytes(int(ks_lcol if ks_lcol is not None
                                          else np.ceil(max(KS, 1)))))
           # x window: DMA'd per tile when moving, once when resident
           + (1 if static else T) * K128 * 128 * value_bytes
           + T * G * 128 * value_bytes)          # y
    # per scan step: one dynamic lane gather per payload + selects; dd
    # pays it for hi and lo; operands taller than 8 sublanes lower to a
    # slower gather form (_gather_penalty)
    gather_ops = ((20 if dd else 10) * KS * _gather_penalty(G)
                  + (20 if dd else 2))
    # a (G,128) op with G<8 still occupies a full (8,128) native vreg op —
    # short tiles waste sublanes, so G is floored at 8 here
    vpu = (T * S * max(G, 8) * gather_ops
           / calibrate.get("vpu_sublane_rows_per_cycle") * 8)
    sub = _sub_estimate(S, G, KS, K128, dd, static)
    steps = -(-T // sub)
    return (max(hbm / calibrate.get("hbm_bytes_per_cycle"), vpu)
            + steps * calibrate.get("tile_overhead_cycles")
            + (T - steps) * calibrate.get("subtile_overhead_cycles"))


def estimate_cycles(plan: "EllPlan", value_bytes: int, dd: bool) -> float:
    # use the EXECUTED per-slot gather count (the kernel's static unroll
    # runs ks_slot = max span over tiles, per slot position — build_plan's
    # slot-span sort already minimized that sum)
    ks_exec = (float(plan.qb[:, 1, :].max(axis=0).mean())
               if plan.qb.size else plan.KS)
    return _cost(plan.num_tiles, plan.rowsize, plan.G, ks_exec, plan.K128,
                 value_bytes, dd, static=bool(plan.static_window))


class _Stats:
    """Per-slot rebased-column extrema at 128-row granularity, foldable to
    any tile size that is a multiple of 128.

    Two rebasings, chosen per matrix by the cost model:

    - slope 0: D = col. Slot windows span the tile's raw column range —
      right when columns do not track rows (small m, random-in-block).
    - slope 1: D = col - 128*(row//128). For quasi-diagonal slots (sorted
      banded/stencil matrices) this removes the tile-height term from the
      window span, so huge row tiles (which amortize per-tile overhead)
      keep tiny gather windows. The kernel then gathers from a (G, 128)
      diagonal slice of the x window instead of a broadcast row.
    """

    def __init__(self, ell):
        S = ell.rowsize
        n_pad_in = ell.padded_rows
        n128 = _round_up(n_pad_in, 128)
        cols = np.zeros((n128, S), np.int32)
        cols[:n_pad_in] = np.asarray(ell.colidx, np.int32)
        real = np.zeros((n128, S), bool)
        real[:n_pad_in] = np.asarray(ell.values) != 0
        t128 = n128 // 128
        self.smin = {}
        self.smax = {}
        for slope in (0, 1):
            d = cols if slope == 0 else (
                cols - (np.arange(n128, dtype=np.int32) // 128 * 128)[:, None])
            self.smin[slope] = np.where(real, d, _I32_BIG).reshape(
                t128, 128, S).min(axis=1)                # (t128, S)
            self.smax[slope] = np.where(real, d, _I32_SMALL).reshape(
                t128, 128, S).max(axis=1)
        self.t128 = t128
        self.S = S

    def fold(self, G: int, slope: int):
        """Per-tile slot extrema of the rebased column for tiles of G*128
        rows, as ABSOLUTE 128-row positions (slope-1 values get the tile's
        base group index added back): (T, S) int64 arrays."""
        t = _round_up(self.t128, G) // G
        smin = np.full((t * G, self.S), _I32_BIG, np.int32)
        smax = np.full((t * G, self.S), _I32_SMALL, np.int32)
        smin[:self.t128] = self.smin[slope]
        smax[:self.t128] = self.smax[slope]
        fmin = smin.reshape(t, G, self.S).astype(np.int64)
        fmax = smax.reshape(t, G, self.S).astype(np.int64)
        empty_min = fmin == _I32_BIG
        empty_max = fmax == _I32_SMALL
        if slope == 1:
            base = (np.arange(t, dtype=np.int64) * G * 128)[:, None, None]
            fmin = fmin + base
            fmax = fmax + base
        fmin = np.where(empty_min, _EMPTY_MIN, fmin)
        fmax = np.where(empty_max, _EMPTY_MAX, fmax)
        return fmin.min(axis=1), fmax.max(axis=1)


def _windows(smin, smax, nx128, max_ks, max_k128, extra_rows=0,
             static=False):
    """Derive (wbase128, K128, qb, KS) from per-tile slot extrema of the
    (rebased) columns, or None when over budget. `extra_rows` = G-1 for
    slope-1 plans: the diagonal (G,128) gather slice reads that many rows
    past the sub-window base. `static=True` forces the window to the whole
    x image (resident-x scan; max_k128 does not apply — VMEM feasibility
    is checked by the caller)."""
    tile_min = smin.min(axis=1)
    tile_max = smax.max(axis=1)
    empty = tile_max <= _EMPTY_MAX // 2
    tile_min = np.where(empty, 0, tile_min)
    tile_max = np.where(empty, 0, tile_max)

    if static:
        wbase128 = np.zeros_like(tile_min)
        K128 = nx128
    else:
        wbase128 = np.maximum(tile_min >> 7, 0)
        if empty.any() and not empty.all():
            # all-pad tiles would get window base 0 — harmless alone, but
            # a base-0 tile next to a high-column tile poisons the JOINT
            # supertile window (_super_k128 saw a full-image span on the
            # stream product plan's tail tiles); inherit the previous real
            # tile's base instead (backward-fill the leading ones)
            idx = np.where(~empty, np.arange(len(wbase128)), -1)
            last = np.maximum.accumulate(idx)
            first_real = int(np.argmax(~empty))
            src = np.where(last >= 0, last, first_real)
            wbase128 = np.where(empty, wbase128[src], wbase128)
            tile_max = np.where(empty, wbase128 << 7, tile_max)
        K128 = int(np.max((tile_max >> 7) - wbase128 + 1)) + extra_rows
        K128 = _round_up(max(K128, 1), 8)
        if K128 > nx128:
            # nx128 is the full padded image height, a multiple of 8 already
            K128 = nx128
        if K128 > max_k128:
            return None
    # Clamp so window DMAs stay inside the padded x image (an overrun is a
    # hardware fault, not an error).
    wbase128 = np.minimum(wbase128, max(nx128 - K128, 0))

    slot_empty = smax <= _EMPTY_MAX // 2
    smin64 = np.where(slot_empty, wbase128[:, None] << 7, smin)
    smax64 = np.where(slot_empty, wbase128[:, None] << 7, smax)
    qb = np.maximum((smin64 >> 7) - wbase128[:, None], 0)
    KS = int(np.max((smax64 >> 7) - (wbase128[:, None] + qb) + 1))
    KS = max(KS, 1)
    if KS > max_ks:
        return None
    qb = np.minimum(qb, np.maximum(K128 - KS - extra_rows, 0))
    # per-(tile, slot) gather step count (<= KS): lets the kernel skip
    # steps on slots narrower than the global max
    ks = np.maximum((smax64 >> 7) - (wbase128[:, None] + qb) + 1, 1)
    ks = np.minimum(ks, KS)
    return wbase128, K128, qb, KS, ks


def build_plan(ell, row_tile: int = DEFAULT_ROW_TILE,
               max_ks: int = DEFAULT_MAX_KS,
               max_k128: int = DEFAULT_MAX_K128,
               value_dtype=np.float32, slope: int = 0,
               static: bool = False, _stats=None) -> EllPlan | None:
    """Build a kernel plan at one tile size and rebasing slope, or None if
    over budget. `static=True` builds a resident-x plan (slope must be 0):
    the whole padded x image is the window, DMA'd to VMEM once."""
    S = ell.rowsize
    if S == 0 or S > MAX_ROWSIZE:
        # beyond the cap the lcol/vals tiles and padding dominate — XLA
        # row-sum handles such buckets (and the SELL row splitter keeps
        # real sub-rows at <= 128 entries anyway)
        return None
    if ell.num_columns > np.iinfo(np.int32).max:
        return None   # stats/lcol use int32 column arithmetic
    n_pad_in = ell.padded_rows
    m = ell.num_columns
    R = min(row_tile, max(128, _round_up(n_pad_in, 128)))
    G = R // 128
    n_pad = _round_up(n_pad_in, R)
    num_tiles = n_pad // R
    extra = (G - 1) if slope else 0
    lead = extra
    # x window rows and the padded x image must be sublane-aligned (8):
    # odd-height DMAs into VMEM scratch fault the TPU. Slope-1 plans read
    # up to G-1 rows past a sub-window base (trailing pad) and rebased
    # columns can reach G-1 rows before x[0] (leading pad).
    nx128 = _round_up(lead + max(_round_up(m, 128) // 128, 1) + extra, 8)

    if static and slope:
        return None    # resident-x scan uses raw columns only

    stats = _stats if _stats is not None else _Stats(ell)
    fmin, fmax = stats.fold(G, slope)
    fmin = np.where(fmin >= _EMPTY_MIN // 2, fmin, fmin + 128 * lead)
    fmax = np.where(fmax <= _EMPTY_MAX // 2, fmax, fmax + 128 * lead)
    win = _windows(fmin, fmax, nx128, max_ks, max_k128, extra,
                   static=static)
    if win is None:
        return None
    wbase128, K128, qb, KS, ks = win
    if _vmem_bytes(S, G, KS, K128, np.dtype(value_dtype) == np.float64,
                   static=static) > VMEM_BUDGET_BYTES:
        return None

    cols = np.zeros((n_pad, S), np.int64)
    cols[:n_pad_in] = np.asarray(ell.colidx)
    real = np.zeros((n_pad, S), bool)
    real[:n_pad_in] = np.asarray(ell.values) != 0

    # Padding/zero entries contribute 0 regardless of the gathered x value;
    # give them local column 0 (they never widen a window).
    base = ((wbase128[:, None] + qb) << 7).astype(np.int64)  # (T, S)
    eff = cols.reshape(num_tiles, R, S) + 128 * lead
    if slope:
        eff = eff - (np.arange(R, dtype=np.int64) // 128 * 128)[None, :,
                                                                None]
    lcol = eff - base[:, None, :]
    lcol = np.where(real.reshape(num_tiles, R, S), lcol, 0)
    if lcol.min() < 0 or lcol.max() >= KS * 128:
        # Shouldn't happen; fall back rather than gather out of window.
        return None

    vals = np.zeros((n_pad, S), np.dtype(value_dtype))
    vals[:n_pad_in] = np.asarray(ell.values)

    # Per-tile slot-span sort: the kernel's scan trips are STATIC per slot
    # (ks_slot = max span over tiles), so aligning each tile's widest
    # slots to the same slot indices minimizes sum_s max_t span(t, s)
    # (rearrangement inequality; slot order is free — slots accumulate
    # independently). Banded-random 2M: executed steps 101 -> 89.
    if S > 1 and qb.size and os.environ.get(
            "ELLSPMV_TPU_SLOTSORT", "1") != "0":
        order = np.argsort(-ks, axis=1, kind="stable")       # (T, S)
        if int(np.minimum(ks, max_ks).max(axis=0).sum()) > int(
                np.take_along_axis(ks, order, 1).max(axis=0).sum()):
            qb = np.take_along_axis(qb, order, 1)
            ks = np.take_along_axis(ks, order, 1)
            lcol = np.take_along_axis(lcol, order[:, None, :], 2)
            vals = np.take_along_axis(
                vals.reshape(num_tiles, R, S), order[:, None, :], 2
            ).reshape(n_pad, S)

    # Slot-major relayout: (T, R, S) -> (T, S*G, 128) per-tile blocks
    def relayout(a, dt):
        return np.ascontiguousarray(
            a.reshape(num_tiles, G, 128, S).transpose(0, 3, 1, 2)
        ).reshape(num_tiles, S * G, 128).astype(dt, copy=False)

    # narrow local columns when they fit: int16 saves 25% of the f32
    # index traffic (validated on hardware; ELLSPMV_TPU_LCOL16=0
    # disables); int8 (stored biased by -128, so KS*128 <= 256 fits
    # exactly — the KS=2 mesh/stencil case) halves it again
    # (ELLSPMV_TPU_LCOL8=0 disables).
    lcol_dt = np.int32
    if (KS * 128 <= np.iinfo(np.int16).max
            and os.environ.get("ELLSPMV_TPU_LCOL16", "1") != "0"):
        lcol_dt = np.int16
    if (KS * 128 <= 256
            and os.environ.get("ELLSPMV_TPU_LCOL8", "1") != "0"):
        lcol_dt = np.int8
    if lcol_dt == np.int8:
        lcol = lcol - 128

    return EllPlan(
        rowsize=S, num_tiles=num_tiles, G=G, KS=KS, K128=K128,
        n_pad=n_pad, nx128=nx128, lead=lead, slope=slope,
        static_window=int(static),
        wbase128=wbase128.astype(np.int32),
        qb=np.stack([qb, ks], axis=1).astype(np.int32),  # (T, 2, S)
        lcol=relayout(lcol, lcol_dt),
        vals=relayout(vals, np.dtype(value_dtype)),
    )


def best_plan(ell, row_tiles=(8192, 4096, 2048, 1024, 512, 256, 128),
              max_ks: int = DEFAULT_MAX_KS,
              max_k128: int = DEFAULT_MAX_K128,
              value_dtype=np.float32) -> EllPlan | None:
    """Pick the cheapest (tile size, rebasing slope) by the cost model over
    shared stats, materializing only the winner. Slope-1 rebasing keeps
    quasi-diagonal windows narrow at huge tile sizes (which amortize the
    per-tile overhead); slope-0 wins when columns don't track rows."""
    S = ell.rowsize
    if S == 0 or ell.num_columns > np.iinfo(np.int32).max:
        return None
    dd = np.dtype(value_dtype) == np.float64
    vb = 8 if dd else 4
    m = ell.num_columns
    stats = _Stats(ell)
    best_cfg, best_cost = None, float("inf")
    for static in (False, True):
        for slope in ((0, 1) if not static else (0,)):
            for rt in row_tiles:
                R = min(rt, max(128, _round_up(ell.padded_rows, 128)))
                G = R // 128
                extra = (G - 1) if slope else 0
                nx128 = _round_up(
                    extra + max(_round_up(m, 128) // 128, 1) + extra, 8)
                fmin, fmax = stats.fold(G, slope)
                fmin = np.where(fmin >= _EMPTY_MIN // 2, fmin,
                                fmin + 128 * extra)
                fmax = np.where(fmax <= _EMPTY_MAX // 2, fmax,
                                fmax + 128 * extra)
                win = _windows(fmin, fmax, nx128, max_ks, max_k128, extra,
                               static=static)
                if win is None:
                    continue
                _, K128, _, KS, ks_arr = win
                if KS > max_ks:
                    continue
                if _vmem_bytes(S, G, KS, K128, dd,
                               static=static) > VMEM_BUDGET_BYTES:
                    continue
                # cost with the EXECUTED per-slot step count: the kernel
                # unrolls to ks_slot = max span over tiles, after the
                # per-tile slot-span sort build_plan applies
                ks_sorted = -np.sort(-np.minimum(ks_arr, max_ks), axis=1)
                KS = max(float(ks_sorted.max(axis=0).mean()), 1.0)
                T = _round_up(ell.padded_rows, R) // R
                c = _cost(T, S, G, KS, K128, vb, dd, static=static)
                if os.environ.get("ELLSPMV_TPU_PLAN_DEBUG"):
                    import sys
                    print(f"plan-cand rt={rt} slope={slope} "
                          f"static={int(static)} G={G} KS_exec={KS:.2f} "
                          f"K128={K128} T={T} cost_us="
                          f"{c / 940:.1f}", file=sys.stderr)
                if c < best_cost:
                    best_cfg, best_cost = (rt, slope, static), c
    if best_cfg is None:
        return None
    rt, slope, static = best_cfg
    return build_plan(ell, row_tile=rt, max_ks=max_ks, max_k128=max_k128,
                      value_dtype=value_dtype, slope=slope, static=static,
                      _stats=stats)


def rebucket_slots(ell, key: str = "offset", widen_to: int | None = None,
                   quantile: float | None = None):
    """Reassign each row's entries to ELL slots by bucketed sort key.

    With rank-ordered slots (--sort-rows), a slot mixes different diagonals
    whenever a row is missing earlier entries (e.g. stencil boundary rows),
    inflating the slot's window span across a tile. Bucketing by quantiles
    of a per-entry key re-aligns entries across rows: each real entry moves
    to the slot whose key bucket it belongs to (kept strictly increasing
    per row; padding fills the leftover slots). Returns a re-slotted
    EllMatrix copy, or the input if nothing moves.

    key='offset': bucket by col - row (quasi-diagonal matrices — stencil
    boundaries, FEM surfaces; re-aligns partial rows to the diagonals).
    key='column': bucket by col alone (random/power-law matrices — slot s
    then only scans its own column band, so a resident-x scan plan costs
    ~K128 total steps per tile instead of S*K128).
    key='block': bucket by the 128-block of the slope-1 REBASED column
    (col - 128*(row//128)) with slot capacities proportional to block
    mass. This aligns bucket boundaries with the kernel's gather
    granularity: a slot's window is one 128-block (two when a row
    overflows its block's capacity and spills into the right
    neighbour's slots), so ks_mean approaches 1 — the right shape for
    banded-RANDOM matrices, where offset quantile buckets still span
    several blocks (ks ~4) because entries have no diagonal structure.

    key='pair': slot ranges DECLARED to span adjacent rebased-block pairs
    {i, i+1} (ks <= 2 by construction at ANY tile size, since the span is
    a global property of the range, not a tile max). Range capacities come
    from an exact interval-covering solve (Hall's condition: for every
    block interval the intersecting capacities cover the max per-row
    count, so the per-row greedy fill never overflows). This removes the
    tile-max wall that flattens 'block' buckets on banded-random matrices:
    there, ks is the span max over a tile's rows, so one spill anywhere
    poisons the slot. `widen_to`/`quantile` are ignored (the solve sizes
    the slot space itself).

    `widen_to` pads the slot space to S_out > S: full rows have no slack
    for bucketing (every slot is taken, so slots stay rank-ordered and
    each spans the whole column range); extra slots give entries room to
    sit at their bucket, trading ~S_out/S storage for an S-fold scan
    reduction — the right trade when the scan dominates (random columns).

    `quantile` (key='block' only) sizes each block's slot range from the
    per-ROW entry-count distribution instead of total mass: cap_b =
    ceil(quantile_q over rows of count_b(row)). Mass-proportional ranges
    under-size blocks whose per-row counts have heavy tails (banded-RANDOM
    boundary blocks), making ~a third of rows spill into the neighbour
    range (span-2 slots); a high quantile buys ks→1 with the slot space it
    actually needs. S_out = sum(cap) when `widen_to` is None, else
    capacities are rescaled into the given width.
    """
    from ellspmv_tpu.formats.ell import EllMatrix

    S = ell.rowsize
    S_out = S if widen_to is None else max(int(widen_to), S)
    if S < 1 or (key in ("offset", "block", "pair")
                 and ell.num_rows != ell.num_columns):
        return ell
    if key == "pair":
        return _rebucket_pair(ell)
    if S_out == S and S <= 1:
        return ell
    cols = np.asarray(ell.colidx)
    vals = np.asarray(ell.values)
    n_pad = cols.shape[0]
    real = vals != 0
    cnt = real.sum(axis=1)
    if S_out == S and (cnt >= S).all():
        return ell        # all rows full: any in-place map is the identity
    rows = np.arange(n_pad, dtype=np.int64)[:, None]
    if key == "block":
        # 128-block index of the slope-1 rebased column (arithmetic shift
        # = floor division, so negative rebased columns bucket correctly)
        offs = (cols.astype(np.int64) - ((rows >> 7) << 7)) >> 7
    else:
        offs = cols.astype(np.int64) - (rows if key == "offset" else 0)
    sample = offs[real]
    if sample.size == 0:
        return ell
    if sample.size > 4_000_000:
        sample = sample[:: sample.size // 4_000_000]
    uniq, counts = np.unique(sample, return_counts=True)
    if key == "block":
        if len(uniq) > S_out:
            return ell    # band wider than the slot space can split
        if quantile is not None and len(uniq) <= 64:
            # per-ROW count quantiles: cap_b covers quantile-q of the rows'
            # block-b entry counts, so spills (span-2 slots) are confined
            # to the (1-q) tail instead of a third of the rows
            idx_all = np.clip(np.searchsorted(uniq, offs), 0, len(uniq) - 1)
            cap = np.empty(len(uniq), np.int64)
            for b in range(len(uniq)):
                cb = ((idx_all == b) & real).sum(axis=1)
                cap[b] = max(1, int(np.ceil(np.quantile(cb, quantile))))
            if widen_to is None:
                S_out = max(S, int(cap.sum()))
            else:              # rescale into the requested width
                cap = np.maximum(1, np.round(
                    cap * (S_out / cap.sum())).astype(np.int64))
            quota = cap.astype(np.float64)
        else:
            # capacity-proportional slot ranges per block (each >= 1); a
            # block with capacity C_b gets slots [base_b, base_b + C_b) and
            # per-row overflow spills into the next block's range (ks 2)
            quota = counts * (S_out / counts.sum())
            cap = np.maximum(1, np.floor(quota).astype(np.int64))
        spare = S_out - int(cap.sum())
        order = np.argsort(-(quota - np.floor(quota)))
        i = 0
        while spare > 0:          # hand leftovers to largest remainders
            cap[order[i % len(cap)]] += 1
            spare -= 1
            i += 1
        i = len(order) - 1
        while spare < 0:          # floors of 1 can overshoot S_out
            j = order[i % len(order)]
            if cap[j] > 1:
                cap[j] -= 1
                spare += 1
            i -= 1
        base = np.concatenate([[0], np.cumsum(cap)[:-1]])
        idx = np.clip(np.searchsorted(uniq, offs), 0, len(uniq) - 1)
        ideal = base[idx]
    elif len(uniq) <= S_out:
        # few distinct diagonals (stencils): one slot per diagonal, exact
        ideal = np.searchsorted(uniq, offs).astype(np.int64)
        ideal = np.minimum(ideal, S_out - 1)
    else:
        # mass-balanced cuts on the discrete offset distribution
        # (np.quantile interpolation misplaces boundaries when a few
        # offsets carry most of the mass)
        cum = np.cumsum(counts)
        cuts = np.searchsorted(cum, cum[-1] * np.arange(1, S_out) // S_out,
                               side="left")
        bounds = uniq[np.minimum(cuts + 1, len(uniq) - 1)]
        ideal = np.searchsorted(bounds, offs, side="left").astype(np.int64)
    # real entries are column-sorted per row -> ideal is non-decreasing on
    # them; make strictly increasing, clamp into [rank, rank + S_out - cnt]
    pos = np.arange(S, dtype=np.int64)[None, :]
    ideal = np.where(real, ideal, S_out - 1)
    slot = np.maximum.accumulate(ideal - pos, axis=1) + pos
    # rank of the entry among the row's REAL entries
    rank = np.cumsum(real, axis=1) - 1
    slot = np.minimum(slot, rank + (S_out - cnt[:, None]))  # room right
    slot = np.maximum(slot, rank)                           # and left
    slot = np.where(real, slot, -1)
    if S_out == S and (slot[real] == pos.repeat(n_pad, 0)[real]).all():
        return ell

    # padding defaults everywhere, then scatter the real entries
    pad_col = np.minimum(np.arange(n_pad), max(ell.num_columns - 1, 0))
    new_cols = np.broadcast_to(pad_col[:, None], (n_pad, S_out)).astype(
        cols.dtype).copy()
    new_vals = np.zeros((n_pad, S_out), vals.dtype)
    rr = np.nonzero(real)
    new_cols[rr[0], slot[rr]] = cols[rr]
    new_vals[rr[0], slot[rr]] = vals[rr]
    return EllMatrix(colidx=new_cols, values=new_vals, diag=ell.diag,
                     num_rows=ell.num_rows, num_columns=ell.num_columns,
                     num_nonzeros=ell.num_nonzeros)



def _pair_caps(cnt: np.ndarray) -> np.ndarray:
    """Exact minimal total capacity for slot ranges i={i, i+1},
    i=0..nb-2, via the rightmost-greedy interval cover (the integral
    optimum for interval covering with unit costs): after the pass, for
    every block interval [a, b] the intersecting capacities sum to at
    least max over rows of the interval's entry count (Hall's condition),
    so the per-row greedy fill in `_rebucket_pair` cannot overflow."""
    n_pad, nb = cnt.shape
    P = np.zeros((n_pad, nb + 1), np.int64)
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


def _rebucket_pair(ell):
    """Pair-window slot assignment (rebucket_slots key='pair'): each slot
    range i only holds entries of slope-1 rebased blocks {i, i+1}, so the
    planner's per-slot span is <= 2 gather blocks at any tile size."""
    from ellspmv_tpu.formats.ell import EllMatrix

    cols = np.asarray(ell.colidx)
    vals = np.asarray(ell.values)
    n_pad, S = cols.shape
    real = vals != 0
    if not real.any():
        return ell
    rows = np.arange(n_pad, dtype=np.int64)[:, None]
    blk = (cols.astype(np.int64) - ((rows >> 7) << 7)) >> 7   # slope-1
    bmin = int(blk[real].min())
    blk = np.where(real, blk - bmin, 0)
    nb = int(blk[real].max()) + 1
    if nb < 2 or nb > 64:
        return ell            # no pairing to do / O(nb^2) solve too wide
    cnt = np.zeros((n_pad, nb), np.int32)
    for b in range(nb):
        cnt[:, b] = ((blk == b) & real).sum(axis=1)
    caps = _pair_caps(cnt)
    S_out = int(caps.sum())
    if S_out > MAX_ROWSIZE or S_out < S:
        return ell
    base = np.concatenate([[0], np.cumsum(caps)])
    # greedy per row, blocks left to right: block b fills range b-1's
    # leftover first (that range expires after b), then range b
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
    if ((l.sum(axis=1) + r.sum(axis=1)) != cnt.sum(axis=1)).any():
        return ell            # Hall violated — solver bug guard
    # slot index per entry: within range i, block i's right entries come
    # first (columns ascending), then block i+1's left entries
    idx_in_blk = np.zeros((n_pad, S), np.int32)
    for b in range(nb):
        m = (blk == b) & real
        idx_in_blk[m] = (np.cumsum(m, axis=1) - 1)[m]
    lb = l[np.arange(n_pad)[:, None], blk]
    prev_r = r[np.arange(n_pad)[:, None], np.maximum(blk - 1, 0)]
    is_left = idx_in_blk < lb
    slot = np.where(
        is_left,
        base[np.maximum(blk - 1, 0)] + prev_r + idx_in_blk,
        base[np.minimum(blk, len(caps) - 1)] + (idx_in_blk - lb))
    slot = np.where(real, slot, -1)

    pad_col = np.minimum(np.arange(n_pad), max(ell.num_columns - 1, 0))
    new_cols = np.broadcast_to(pad_col[:, None], (n_pad, S_out)).astype(
        cols.dtype).copy()
    new_vals = np.zeros((n_pad, S_out), vals.dtype)
    rr = np.nonzero(real)
    new_cols[rr[0], slot[rr]] = cols[rr]
    new_vals[rr[0], slot[rr]] = vals[rr]
    return EllMatrix(colidx=new_cols, values=new_vals, diag=ell.diag,
                     num_rows=ell.num_rows, num_columns=ell.num_columns,
                     num_nonzeros=ell.num_nonzeros)
