"""Static stream permutation: sort-free reordering when every element's
destination is known at plan time.

The stream SpMV path (formats/stream.py) needs its product stream
reordered from column order into row-tile order. Round 1 did this with a
runtime `lax.sort` over precomputed keys — O(n log^2 n) bitonic work for a
permutation fully known at build time (the reference's analogous
random-access inner loop is csrspmv.c:1590-1592, which a CPU just eats).
This module routes the stream with dense passes built ONLY from
Mosaic-supported primitives (lane gathers at any operand height and
(128,128) transposes — there is no sublane gather on TPU):

1. **W1 kernel** — per (128,128) input block: one lane gather assigns
   every element its *color* lane, then a transpose + per-half lane
   gathers + transposes regroup the block's elements into rows that are
   pure per destination block (row content chosen at build; an input
   block's elements spill into up to `HA` half-blocks, absorbing the
   ceil-rounding without any padding of the stream itself).
2. **take** — one XLA row gather (`jnp.take` on the (rows,128) view)
   moves the pure rows to their destination block; row-granular static
   gathers run near HBM speed on v5e (BENCH_NOTES).
3. **W2 kernel** — per destination block: lane-recolor the `HB` arriving
   half-blocks, transpose, select-gather across halves (the sublane
   stage), transpose back, and a final lane gather lands every element on
   its exact output position.

The color lanes come from two Koenig/Euler-split bipartite edge colorings
computed on the host at build time (degrees are <=128, so 128 colors = the
lane width always suffice): coloring 1 over (input row, mid row), coloring
2 over (mid slot row, output row). Constraint on the caller: each input
block may touch at most `128*(HA-1)` distinct destination blocks and each
destination block may receive from at most `128*(HB-1)` input blocks —
the stream builder guarantees this by ordering entries by
(destination megablock, column), which costs nothing (no padding) and
keeps the product kernel's column locality.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops.ell_pallas import _i0, _lane_gather

__all__ = ["PermutePlan", "build_permute", "apply_permute", "BLOCK"]

BLOCK = 128 * 128              # elements per routed block
MAX_HALVES = 4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Host: bipartite edge coloring (Koenig via Euler splits)
# --------------------------------------------------------------------------

def _bipartition_components(pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """2-color the path/even-cycle graph whose vertices are edge ids and
    whose adjacency is the two partner arrays (-1 = none). Exact
    sequential walk (paths are rewound to an endpoint first; cycles
    alternate sides so they are even). The native C++ walker
    (native/color.cc) is the fast path for large inputs; this fallback is
    O(E) python."""
    E = len(pa)
    par = np.zeros(E, dtype=np.int8)
    seen = np.zeros(E, dtype=bool)
    for s in range(E):
        if seen[s]:
            continue
        # rewind to an endpoint, alternating sides (or stop on cycle)
        e, via_a = s, True
        while True:
            p = pa[e] if via_a else pb[e]
            if p < 0 or p == s:
                break
            e, via_a = p, not via_a
        # forward walk from the endpoint through the other side
        fwd_a = not via_a
        cur, parity = e, 0
        while True:
            seen[cur] = True
            par[cur] = parity
            parity ^= 1
            nxt = pa[cur] if fwd_a else pb[cur]
            fwd_a = not fwd_a
            if nxt < 0 or seen[nxt]:
                break
            cur = nxt
    return par


def _pair_within(groups: np.ndarray) -> np.ndarray:
    """Pair consecutive edges within each group (sorted by `groups`);
    returns partner edge id or -1. `groups` may be any integer key."""
    E = len(groups)
    order = np.argsort(groups, kind="stable")
    g = groups[order]
    start = np.concatenate([[True], g[1:] != g[:-1]])
    idx = np.arange(E)
    grp_start = np.maximum.accumulate(np.where(start, idx, 0))
    rank = idx - grp_start
    partner_sorted = np.full(E, -1, np.int64)
    even = (rank % 2 == 0)
    has_next = np.zeros(E, bool)
    has_next[:-1] = even[:-1] & (g[1:] == g[:-1])
    partner_sorted[np.flatnonzero(has_next)] = \
        order[np.flatnonzero(has_next) + 1]
    partner_sorted[np.flatnonzero(has_next) + 1] = \
        order[np.flatnonzero(has_next)]
    partner = np.full(E, -1, np.int64)
    partner[order] = partner_sorted
    return partner


def _edge_color_numpy(src: np.ndarray, dst: np.ndarray,
                      max_colors: int = 128) -> np.ndarray:
    """Proper edge coloring of the bipartite multigraph (src[i], dst[i])
    with <= max_colors colors (max degree must be <= max_colors, a power
    of two). Recursive Euler splitting: each level pairs edges at every
    node and bipartitions the resulting paths/even cycles, halving all
    degrees. Vectorized numpy (the native C++ walker is the fast path for
    large inputs)."""
    E = len(src)
    if E == 0:
        return np.zeros(0, np.int64)
    levels = int(np.ceil(np.log2(max(max_colors, 2))))
    cls = np.zeros(E, np.int64)
    smax = src.max() + 1
    dmax = dst.max() + 1
    for _ in range(levels):
        pa = _pair_within(cls * smax + src)
        pb = _pair_within(cls * dmax + dst)
        half = _bipartition_components(pa, pb)
        cls = cls * 2 + half
    return cls


def _edge_color(src: np.ndarray, dst: np.ndarray,
                max_colors: int = 128) -> np.ndarray:
    from ellspmv_tpu.io import native
    if len(src) >= 20_000 and native.available():
        try:
            return native.edge_color(src, dst, max_colors)
        except Exception:
            pass
    return _edge_color_numpy(src, dst, max_colors)


def _edge_color_by_block(block: np.ndarray, src: np.ndarray,
                         dst: np.ndarray, max_colors: int = 128,
                         sorted_blocks: bool = False) -> np.ndarray:
    """Per-block coloring: both planner colorings decompose into
    INDEPENDENT subgraphs per 128x128 stream block (a block's edges only
    touch that block's rows on both sides), and the <=16K-edge subgraphs
    are cache-resident where one global 6.5M-edge walk thrashes DRAM.
    `sorted_blocks=True` skips the grouping sort when edges already
    arrive block-contiguous."""
    from ellspmv_tpu.io import native
    E = len(src)
    if E < 200_000 or not native.available():
        return _edge_color(src, dst, max_colors)
    try:
        if sorted_blocks:
            b = np.asarray(block)
            starts = np.concatenate(
                [[0], np.flatnonzero(b[1:] != b[:-1]) + 1, [E]])
            return native.edge_color_grouped(src, dst, starts, max_colors)
        order = native.argsort(block)
        bs = block[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(bs[1:] != bs[:-1]) + 1, [E]])
        col_s = native.edge_color_grouped(src[order], dst[order], starts,
                                          max_colors)
        col = np.empty(E, np.int32)
        col[order] = col_s
        return col
    except Exception:
        return _edge_color(src, dst, max_colors)


# --------------------------------------------------------------------------
# Plan container + builder
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PermutePlan:
    """Static routing of an input stream onto output positions."""
    l1: jax.Array | np.ndarray    # (NBi, 128, 128) i8 W1 color lane map
    q1: jax.Array | np.ndarray    # (NBi, HA, 128, 128) i8 W1 row map (T)
    gsrc: jax.Array | np.ndarray  # (NBo*HB*128,) i32 source mid row
    l1b: jax.Array | np.ndarray   # (NBo, HB, 128, 128) i8 W2 recolor map
    q2: jax.Array | np.ndarray    # (NBo, 128, 128) i16 W2 slot map (T)
    l3: jax.Array | np.ndarray    # (NBo, 128, 128) i8 W2 final lane map
    NBi: int = dataclasses.field(metadata=dict(static=True))
    NBo: int = dataclasses.field(metadata=dict(static=True))
    HA: int = dataclasses.field(metadata=dict(static=True))
    HB: int = dataclasses.field(metadata=dict(static=True))
    n_in: int = dataclasses.field(metadata=dict(static=True))   # padded
    n_out: int = dataclasses.field(metadata=dict(static=True))  # padded
    # uniform-cell mode (bpg > 0): NBi == NBo, group g = blocks
    # [bpg*g, bpg*(g+1)) on BOTH sides, every (input block, dest block)
    # pair within a group owns a fixed cell_rows-row cell of the mid
    # space, and W1 writes the mid d-major DIRECTLY via a strided
    # BlockSpec — the take stage (an HBM row gather that measured a flat
    # 84 GB/s = ~8x sublane read amplification once the mid exceeds VMEM,
    # benchmarks/microbench_take.py) disappears entirely.
    bpg: int = dataclasses.field(default=0, metadata=dict(static=True))
    cell_rows: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))

    def device_put(self) -> "PermutePlan":
        return jax.tree_util.tree_map(jnp.asarray, self)


def _cell_rows_for(bpg: int) -> int:
    """Mid rows per cell: power of two (so cells tile the 128-row
    halves), >= 2x the mean per-cell load BLOCK/bpg (overflow margin),
    floor 8 (the sublane tile)."""
    need = max(8, 2 * BLOCK // (bpg * 128))
    return min(1 << max(need - 1, 0).bit_length()
               if need & (need - 1) else need, 128)


def build_permute(target: np.ndarray, n_out: int,
                  validate: bool = True) -> PermutePlan:
    """Plan the permutation `out[target[k]] = in[k]` (target -1 = dropped).

    Real targets must be distinct positions in [0, n_out) — checked
    unless `validate=False` (internal callers whose targets are distinct
    by construction skip the ~0.5 s scatter check at 6.5M entries).
    Output positions not covered by any input hold unspecified values —
    consumers must mask, as the stream-sum kernels do via run counts.

    Raises ValueError when an input block touches too many destination
    blocks (or vice versa) for the half-block budget; callers avoid this
    by pre-ordering the input by destination megablock (a pure reorder —
    see formats/stream.py)."""
    target = np.asarray(target, np.int64)
    # block counts padded to the kernel grid batch (pad blocks carry zero
    # maps; the positions they produce are never read — outputs not
    # covered by real targets are unspecified by contract)
    NBi = _round_up(_round_up(max(len(target), 1), BLOCK) // BLOCK,
                    GRID_BATCH)
    n_in = NBi * BLOCK
    NBo = _round_up(_round_up(max(n_out, 1), BLOCK) // BLOCK, GRID_BATCH)
    n_out_pad = NBo * BLOCK

    k = np.flatnonzero(target >= 0)
    tr = target[k]
    if len(tr):
        if tr.max() >= n_out:
            raise ValueError(
                "targets must be distinct positions in [0, n_out)")
        if validate:
            # distinctness via scatter marks (a full sort just to validate
            # cost ~0.5 s at 6.5M)
            seen = np.zeros(n_out, bool)
            seen[tr] = True
            if int(seen.sum()) != len(tr):
                raise ValueError(
                    "targets must be distinct positions in [0, n_out)")
    if len(tr) == 0:
        return PermutePlan(
            l1=np.zeros((NBi, 128, 128), np.int8),
            q1=np.zeros((NBi, 1, 128, 128), np.int8),
            gsrc=np.zeros(NBo * 128, np.int32),
            l1b=np.zeros((NBo, 1, 128, 128), np.int8),
            q2=np.zeros((NBo, 128, 128), np.int16),
            l3=np.zeros((NBo, 128, 128), np.int8),
            NBi=NBi, NBo=NBo, HA=1, HB=1, n_in=n_in, n_out=n_out_pad)

    # int32 coordinate math throughout (n_in/n_out both fit; int64 divmods
    # were ~2x the cost at 6.5M elements)
    k32 = k.astype(np.int32)
    tr32 = tr.astype(np.int32)

    # native fused assembly: radix order + grouping + both colorings +
    # map scatters in one C++ pass (native/color.cc mtxio_build_permute;
    # ValueError on budget overflow propagates, same as the numpy path)
    from ellspmv_tpu.io import native as _native
    if len(k32) >= 200_000 and _native.available():
        try:
            (l1n, q1n, gsrcn, l1bn, q2n, l3n, HA, HB) = \
                _native.build_permute_maps(k32, tr32, NBi, NBo, MAX_HALVES)
        except _native.NativeUnsupported:
            pass
        else:
            return PermutePlan(l1=l1n, q1=q1n, gsrc=gsrcn, l1b=l1bn,
                               q2=q2n, l3=l3n, NBi=NBi, NBo=NBo,
                               HA=HA, HB=HB, n_in=n_in, n_out=n_out_pad)
    b = k32 // BLOCK                            # input block
    r1 = (k32 % BLOCK) // 128                   # input row within block
    l1v = k32 % 128                             # input lane
    d = tr32 // BLOCK                           # destination block
    r2 = (tr32 % BLOCK) // 128                  # dest row within block
    l2 = tr32 % 128                             # dest lane

    # --- mid rows: group elements by (input block, dest block); each
    # group takes ceil(n/128) whole mid rows inside its input block's
    # half-block span. Any element order WITHIN a (b, d) group is valid
    # (each element carries its own target), so one radix pass on the
    # combined block key replaces the old 3-key lexsort.
    order = _native.argsort(b.astype(np.uint64) * np.uint64(NBo)
                            + d.astype(np.uint64))
    ob, od = b[order], d[order]
    new_grp = np.concatenate([[True], (ob[1:] != ob[:-1])
                              | (od[1:] != od[:-1])])
    grp_id = np.cumsum(new_grp, dtype=np.int32) - 1
    grp_sizes = np.bincount(grp_id)
    n_grp = len(grp_sizes)
    grp_b = ob[new_grp]
    grp_d = od[new_grp]
    grp_rows = -(-grp_sizes // 128)
    # row offset of each group within its input block
    rows_per_b = np.bincount(grp_b, weights=grp_rows,
                             minlength=NBi).astype(np.int64)
    HA = int(-(-max(rows_per_b.max(), 1) // 128))
    if HA > MAX_HALVES:
        raise ValueError(
            f"input blocks touch too many destination blocks "
            f"(need {HA} half-blocks; pre-order the input by destination "
            "megablock)")
    grp_row_off = np.concatenate([[0], np.cumsum(grp_rows)])[:-1]
    b_row_base = np.concatenate(
        [[0], np.cumsum(np.bincount(grp_b, weights=grp_rows,
                                    minlength=NBi))])[:-1].astype(np.int64)
    grp_row_off = grp_row_off - b_row_base[grp_b]   # within block

    within = np.arange(len(order), dtype=np.int32) - np.concatenate(
        [[0], np.cumsum(grp_sizes)])[:-1].astype(np.int32)[grp_id]
    # mid coordinates (in sorted order): row within the HA half-blocks
    mid_rloc = grp_row_off.astype(np.int32)[grp_id] + (within >> 7)
    mid_row = grp_b[grp_id] * np.int32(HA * 128) + mid_rloc

    # --- coloring 1: distinct colors within each input row and mid row
    r1o = r1[order]
    src1 = ob * np.int32(128) + r1o
    col1 = _edge_color_by_block(ob, src1, mid_row, 128,
                                sorted_blocks=True).astype(np.int32,
                                                           copy=False)

    # flat int32 scatters (ob is sorted, so writes stay block-local)
    l1 = np.zeros(NBi * 128 * 128, np.int8)
    q1 = np.zeros(NBi * HA * 128 * 128, np.int8)
    l1[ob * (128 * 128) + r1o * 128 + col1] = l1v[order].astype(np.int8)
    mid_rloc32 = mid_rloc.astype(np.int32)
    q1[(ob * HA + (mid_rloc32 >> 7)) * (128 * 128) + col1 * 128
       + (mid_rloc32 & 127)] = r1o.astype(np.int8)
    l1 = l1.reshape(NBi, 128, 128)
    q1 = q1.reshape(NBi, HA, 128, 128)

    # --- take: destination block d's input = its groups' mid rows,
    # ordered by input block
    dorder = np.lexsort((grp_b, grp_d))
    gd = grp_d[dorder]
    rows_per_d = np.bincount(gd, weights=grp_rows[dorder],
                             minlength=NBo).astype(np.int64)
    HB = int(-(-max(rows_per_d.max(), 1) // 128))
    if HB > MAX_HALVES:
        raise ValueError(
            f"destination blocks receive from too many input blocks "
            f"(need {HB} half-blocks)")
    d_row_base = np.concatenate(
        [[0], np.cumsum(rows_per_d)])[:-1].astype(np.int64)
    slot_off = np.concatenate(
        [[0], np.cumsum(grp_rows[dorder])])[:-1] - d_row_base[gd]
    grp_slot = np.empty(n_grp, np.int64)          # group -> first slot
    grp_slot[dorder] = slot_off

    gsrc = np.zeros((NBo, HB * 128), np.int64)
    # per-group rows: slot j of group g (j < grp_rows[g]) maps mid row j
    g_rows = np.repeat(np.arange(n_grp), grp_rows)
    j_in_g = np.arange(len(g_rows)) - np.repeat(
        np.concatenate([[0], np.cumsum(grp_rows)])[:-1], grp_rows)
    gsrc[grp_d[g_rows], grp_slot[g_rows] + j_in_g] = (
        grp_b[g_rows] * (HA * 128) + grp_row_off[g_rows] + j_in_g)
    gsrc = gsrc.reshape(-1)

    # element slot row in the W2 input
    slot = grp_slot.astype(np.int32)[grp_id] + (within >> 7)

    # --- coloring 2: distinct colors within each slot row and output row
    r2o = r2[order]
    slot32 = slot.astype(np.int32, copy=False)
    src2 = od * np.int32(HB * 128) + slot32
    dst2 = od * np.int32(128) + r2o
    col2 = _edge_color_by_block(od, src2, dst2,
                                128).astype(np.int32, copy=False)

    l1b = np.zeros(NBo * HB * 128 * 128, np.int8)
    q2 = np.zeros(NBo * 128 * 128, np.int16)
    l3 = np.zeros(NBo * 128 * 128, np.int8)
    l1b[(od * HB + (slot32 >> 7)) * (128 * 128) + (slot32 & 127) * 128
        + col2] = col1.astype(np.int8)
    q2[od * (128 * 128) + col2 * 128 + r2o] = slot32.astype(np.int16)
    l3[od * (128 * 128) + r2o * 128 + l2[order]] = col2.astype(np.int8)
    l1b = l1b.reshape(NBo, HB, 128, 128)
    q2 = q2.reshape(NBo, 128, 128)
    l3 = l3.reshape(NBo, 128, 128)

    return PermutePlan(
        l1=l1, q1=q1, gsrc=gsrc.astype(np.int32), l1b=l1b, q2=q2, l3=l3,
        NBi=NBi, NBo=NBo, HA=HA, HB=HB, n_in=n_in, n_out=n_out_pad)


def cells_bpg() -> int:
    """Dest/input blocks per uniform-cell group (env-overridable so CPU
    tests can exercise the cells route at tiny scale)."""
    return int(os.environ.get("ELLSPMV_TPU_STREAM_BPG", "16"))


def build_permute_cells(target: np.ndarray,
                        bpg: int | None = None) -> PermutePlan:
    """Uniform-cell routing plan: `out[target[k]] = in[k]` where input
    and output spaces are the SAME length (a whole number of
    `bpg*BLOCK`-element groups) and every real element's input block and
    dest block fall in the same group (the stream builder's fixed-width
    mega grouping + full-group padding guarantee both).

    Each (input block, dest block) pair inside a group owns a fixed
    CELL_ROWS-row cell of the mid space, so W1 can write the mid
    d-major DIRECTLY through a strided BlockSpec and the take stage — an
    HBM row gather measured at a flat ~84 GB/s (8x sublane read
    amplification) once the mid exceeds VMEM (microbench_take.py) —
    disappears. Raises ValueError on cell overflow (> CELL_ROWS*128
    elements for one (input block, dest block) pair) or a group-crossing
    element; callers fall back to the general router."""
    if bpg is None:
        bpg = cells_bpg()
    cell_rows = _cell_rows_for(bpg)
    target = np.asarray(target, np.int64)
    n = len(target)
    if n == 0 or n % (bpg * BLOCK):
        raise ValueError("cells input must be a whole number of groups")
    NB = n // BLOCK
    rows_per_b = bpg * cell_rows
    HA = -(-rows_per_b // 128)
    if HA > MAX_HALVES:
        raise ValueError("cells: bpg needs too many half-blocks")

    k = np.flatnonzero(target >= 0)
    if len(k) == 0:
        raise ValueError("cells route needs at least one element")
    k32 = k.astype(np.int32)
    tr32 = target[k].astype(np.int32)
    b = k32 // BLOCK
    r1 = (k32 % BLOCK) // 128
    l1v = k32 % 128
    d = tr32 // BLOCK
    r2 = (tr32 % BLOCK) // 128
    l2 = tr32 % 128
    if int(tr32.max()) >= n or np.any(b // bpg != d // bpg):
        raise ValueError("cells: element crosses its group")

    from ellspmv_tpu.io import native as _nat
    order = _nat.argsort(b.astype(np.uint64) * np.uint64(NB)
                         + d.astype(np.uint64))
    ob, od = b[order], d[order]
    new_grp = np.concatenate([[True], (ob[1:] != ob[:-1])
                              | (od[1:] != od[:-1])])
    grp_id = np.cumsum(new_grp, dtype=np.int32) - 1
    grp_sizes = np.bincount(grp_id)
    if int(grp_sizes.max()) > cell_rows * 128:
        raise ValueError("cells: cell overflow")
    within = np.arange(len(order), dtype=np.int32) - np.concatenate(
        [[0], np.cumsum(grp_sizes)])[:-1].astype(np.int32)[grp_id]

    d_loc = (od % np.int32(bpg)).astype(np.int32)
    ib_loc = (ob % np.int32(bpg)).astype(np.int32)
    mid_rloc = d_loc * np.int32(cell_rows) + (within >> 7)
    slot32 = ib_loc * np.int32(cell_rows) + (within >> 7)

    # coloring 1: distinct colors within each input row and mid row
    r1o = r1[order]
    src1 = ob * np.int32(128) + r1o
    mid_row = ob * np.int32(HA * 128) + mid_rloc
    col1 = _edge_color_by_block(ob, src1, mid_row, 128,
                                sorted_blocks=True).astype(np.int32,
                                                           copy=False)
    l1 = np.zeros(NB * 128 * 128, np.int8)
    q1 = np.zeros(NB * HA * 128 * 128, np.int8)
    l1[ob * (128 * 128) + r1o * 128 + col1] = l1v[order].astype(np.int8)
    q1[(ob * HA + (mid_rloc >> 7)) * (128 * 128) + col1 * 128
       + (mid_rloc & 127)] = r1o.astype(np.int8)

    # coloring 2: distinct colors within each slot row and output row
    r2o = r2[order]
    src2 = od * np.int32(HA * 128) + slot32
    dst2 = od * np.int32(128) + r2o
    col2 = _edge_color_by_block(od, src2, dst2,
                                128).astype(np.int32, copy=False)
    l1b = np.zeros(NB * HA * 128 * 128, np.int8)
    q2 = np.zeros(NB * 128 * 128, np.int16)
    l3 = np.zeros(NB * 128 * 128, np.int8)
    l1b[(od * HA + (slot32 >> 7)) * (128 * 128) + (slot32 & 127) * 128
        + col2] = col1.astype(np.int8)
    q2[od * (128 * 128) + col2 * 128 + r2o] = slot32.astype(np.int16)
    l3[od * (128 * 128) + r2o * 128 + l2[order]] = col2.astype(np.int8)

    return PermutePlan(
        l1=l1.reshape(NB, 128, 128), q1=q1.reshape(NB, HA, 128, 128),
        gsrc=np.zeros(0, np.int32),
        l1b=l1b.reshape(NB, HA, 128, 128),
        q2=q2.reshape(NB, 128, 128), l3=l3.reshape(NB, 128, 128),
        NBi=NB, NBo=NB, HA=HA, HB=HA, n_in=n, n_out=n, bpg=bpg,
        cell_rows=cell_rows)


# --------------------------------------------------------------------------
# Device kernels
# --------------------------------------------------------------------------

# blocks folded into one grid step. MEASURED REGRESSION at 4 (config3
# 4.10 -> 4.39 ms, v5e round 3): the grid-step overhead the batching
# amortizes (~0.2 ms across W1+W2) is smaller than the pipeline-overlap
# loss from 4x coarser double-buffering granularity. Default 1; the env
# knob keeps the ablation reproducible.
GRID_BATCH = int(os.environ.get("ELLSPMV_TPU_ROUTE_BATCH", "1"))


def _make_w1_kernel(HA: int, n_payload: int, B: int):
    def kernel(*refs):
        l1_ref, q1_ref = refs[:2]
        ins = refs[2:2 + n_payload]
        outs = refs[2 + n_payload:]
        for b in range(B):
            l1 = l1_ref[b].astype(jnp.int32)
            for i in range(n_payload):
                w = _lane_gather(ins[i][b], l1)    # color lanes
                wt = w.T
                for h in range(HA):
                    q = q1_ref[b, h].astype(jnp.int32)
                    outs[i][b, h] = _lane_gather(wt, q).T
    return kernel


def _make_w2_kernel(HB: int, n_payload: int, B: int):
    def kernel(*refs):
        l1b_ref, q2_ref, l3_ref = refs[:3]
        ins = refs[3:3 + n_payload]
        outs = refs[3 + n_payload:]
        for b in range(B):
            q2 = q2_ref[b].astype(jnp.int32)
            l3 = l3_ref[b].astype(jnp.int32)
            qlo = jax.lax.bitwise_and(q2, jnp.int32(127))
            qhi = jax.lax.shift_right_logical(q2, jnp.int32(7))
            for i in range(n_payload):
                zt = None
                for h in range(HB):
                    lh = l1b_ref[b, h].astype(jnp.int32)
                    wt = _lane_gather(ins[i][b, h], lh).T
                    cand = _lane_gather(wt, qlo)
                    zt = cand if zt is None else jnp.where(
                        qhi == jnp.int32(h), cand, zt)
                outs[i][b] = _lane_gather(zt.T, l3)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("HA", "NBi", "n", "interpret"))
def _w1(l1, q1, *payloads, HA, NBi, n, interpret=False):
    B = GRID_BATCH if NBi % GRID_BATCH == 0 else 1

    def im2(i):
        return (i, _i0(), _i0())

    def im3(i):
        return (i, _i0(), _i0(), _i0())

    in_specs = ([pl.BlockSpec((B, 128, 128), im2, memory_space=pltpu.VMEM),
                 pl.BlockSpec((B, HA, 128, 128), im3,
                              memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((B, 128, 128), im2,
                                memory_space=pltpu.VMEM)] * n)
    out_specs = [pl.BlockSpec((B, HA, 128, 128), im3,
                              memory_space=pltpu.VMEM) for _ in range(n)]
    outs = pl.pallas_call(
        _make_w1_kernel(HA, n, B),
        grid=(NBi // B,),
        in_specs=in_specs,
        out_specs=out_specs if n > 1 else out_specs[0],
        out_shape=([jax.ShapeDtypeStruct((NBi, HA, 128, 128), jnp.float32)
                    for _ in range(n)] if n > 1 else
                   jax.ShapeDtypeStruct((NBi, HA, 128, 128), jnp.float32)),
        interpret=interpret,
    )(l1, q1, *payloads)
    return outs if n > 1 else [outs]


def _make_w1_cells_kernel(HA: int, n_payload: int, bpg: int,
                          cell_rows: int):
    rows_per_b = bpg * cell_rows

    def kernel(*refs):
        l1_ref, q1_ref = refs[:2]
        ins = refs[2:2 + n_payload]
        outs = refs[2 + n_payload:]
        l1 = l1_ref[0].astype(jnp.int32)
        for i in range(n_payload):
            w = _lane_gather(ins[i][0], l1)
            wt = w.T
            for h in range(HA):
                q = q1_ref[0, h].astype(jnp.int32)
                half = _lane_gather(wt, q).T      # (128,128) mid rows
                r0 = h * 128
                nrows = min(128, rows_per_b - r0)
                # mid rows are d-major by construction (cell row base =
                # d_local*CELL_ROWS): write them straight into the
                # dest-major strided output block — this IS the take
                outs[i][r0 // cell_rows:(r0 + nrows) // cell_rows] = \
                    half[:nrows].reshape(nrows // cell_rows,
                                         cell_rows, 128)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("HA", "NB", "bpg", "cell_rows", "n",
                                    "interpret"))
def _w1_cells(l1, q1, *payloads, HA, NB, bpg, cell_rows, n,
              interpret=False):
    def im2(i):
        return (i, _i0(), _i0())

    def im3(i):
        return (i, _i0(), _i0(), _i0())

    def omap(i):
        # jnp.int32 operands: arithmetic with bare Python ints traces
        # i64 under jax_enable_x64 and Mosaic's convert lowering then
        # recurses forever on the i32->i64 cast (CLAUDE.md hazard list)
        b = jnp.int32(bpg)
        return (i // b, jax.lax.rem(i, b), _i0())

    in_specs = ([pl.BlockSpec((1, 128, 128), im2,
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, HA, 128, 128), im3,
                              memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, 128, 128), im2,
                                memory_space=pltpu.VMEM)] * n)
    out_specs = [pl.BlockSpec((bpg, cell_rows, 128), omap,
                              memory_space=pltpu.VMEM) for _ in range(n)]
    outs = pl.pallas_call(
        _make_w1_cells_kernel(HA, n, bpg, cell_rows),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs if n > 1 else out_specs[0],
        out_shape=([jax.ShapeDtypeStruct((NB, HA * 128, 128), jnp.float32)
                    for _ in range(n)] if n > 1 else
                   jax.ShapeDtypeStruct((NB, HA * 128, 128), jnp.float32)),
        interpret=interpret,
    )(l1, q1, *payloads)
    return outs if n > 1 else [outs]


def _make_w2_cells_kernel(HB: int, n_payload: int):
    def kernel(*refs):
        l1b_ref, q2_ref, l3_ref = refs[:3]
        ins = refs[3:3 + n_payload]
        outs = refs[3 + n_payload:]
        q2 = q2_ref[0].astype(jnp.int32)
        l3 = l3_ref[0].astype(jnp.int32)
        qlo = jax.lax.bitwise_and(q2, jnp.int32(127))
        qhi = jax.lax.shift_right_logical(q2, jnp.int32(7))
        for i in range(n_payload):
            zt = None
            for h in range(HB):
                lh = l1b_ref[0, h].astype(jnp.int32)
                opnd = ins[i][0, 128 * h:128 * (h + 1)]
                wt = _lane_gather(opnd, lh).T
                cand = _lane_gather(wt, qlo)
                zt = cand if zt is None else jnp.where(
                    qhi == jnp.int32(h), cand, zt)
            outs[i][0] = _lane_gather(zt.T, l3)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("HB", "NB", "n", "interpret"))
def _w2_cells(l1b, q2, l3, *payloads, HB, NB, n, interpret=False):
    def im2(i):
        return (i, _i0(), _i0())

    def im3(i):
        return (i, _i0(), _i0(), _i0())

    in_specs = ([pl.BlockSpec((1, HB, 128, 128), im3,
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 128, 128), im2, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 128, 128), im2, memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, HB * 128, 128), im2,
                                memory_space=pltpu.VMEM)] * n)
    out_specs = [pl.BlockSpec((1, 128, 128), im2, memory_space=pltpu.VMEM)
                 for _ in range(n)]
    outs = pl.pallas_call(
        _make_w2_cells_kernel(HB, n),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs if n > 1 else out_specs[0],
        out_shape=([jax.ShapeDtypeStruct((NB, 128, 128), jnp.float32)
                    for _ in range(n)] if n > 1 else
                   jax.ShapeDtypeStruct((NB, 128, 128), jnp.float32)),
        interpret=interpret,
    )(l1b, q2, l3, *payloads)
    return outs if n > 1 else [outs]


@functools.partial(jax.jit,
                   static_argnames=("HB", "NBo", "n", "interpret"))
def _w2(l1b, q2, l3, *payloads, HB, NBo, n, interpret=False):
    B = GRID_BATCH if NBo % GRID_BATCH == 0 else 1

    def im2(i):
        return (i, _i0(), _i0())

    def im3(i):
        return (i, _i0(), _i0(), _i0())

    in_specs = ([pl.BlockSpec((B, HB, 128, 128), im3,
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((B, 128, 128), im2, memory_space=pltpu.VMEM),
                 pl.BlockSpec((B, 128, 128), im2, memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((B, HB, 128, 128), im3,
                                memory_space=pltpu.VMEM)] * n)
    out_specs = [pl.BlockSpec((B, 128, 128), im2, memory_space=pltpu.VMEM)
                 for _ in range(n)]
    outs = pl.pallas_call(
        _make_w2_kernel(HB, n, B),
        grid=(NBo // B,),
        in_specs=in_specs,
        out_specs=out_specs if n > 1 else out_specs[0],
        out_shape=([jax.ShapeDtypeStruct((NBo, 128, 128), jnp.float32)
                    for _ in range(n)] if n > 1 else
                   jax.ShapeDtypeStruct((NBo, 128, 128), jnp.float32)),
        interpret=interpret,
    )(l1b, q2, l3, *payloads)
    return outs if n > 1 else [outs]


def apply_permute(plan: PermutePlan, *payloads, interpret: bool = False):
    """Apply the planned permutation to equal-length f32 payload arrays
    (length <= plan.n_in). Returns arrays of length plan.n_out; positions
    no input mapped to are unspecified."""
    ins = []
    for p in payloads:
        p = jnp.asarray(p)
        p = jnp.pad(p, (0, plan.n_in - p.shape[0]))
        ins.append(p.reshape(plan.NBi, 128, 128))
    if plan.bpg:
        # uniform-cell route: W1 writes the mid dest-major directly (the
        # strided out BlockSpec IS the take); W2 reads its 256 slot rows
        # as one contiguous block
        mids = _w1_cells(jnp.asarray(plan.l1), jnp.asarray(plan.q1),
                         *ins, HA=plan.HA, NB=plan.NBi, bpg=plan.bpg,
                         cell_rows=plan.cell_rows,
                         n=len(ins), interpret=interpret)
        outs = _w2_cells(jnp.asarray(plan.l1b), jnp.asarray(plan.q2),
                         jnp.asarray(plan.l3), *mids,
                         HB=plan.HB, NB=plan.NBo, n=len(mids),
                         interpret=interpret)
        return [o.reshape(-1) for o in outs]
    mids = _w1(jnp.asarray(plan.l1), jnp.asarray(plan.q1), *ins,
               HA=plan.HA, NBi=plan.NBi, n=len(ins), interpret=interpret)
    gsrc = jnp.asarray(plan.gsrc)
    taken = [jnp.take(m.reshape(plan.NBi * plan.HA * 128, 128), gsrc,
                      axis=0).reshape(plan.NBo, plan.HB, 128, 128)
             for m in mids]
    if os.environ.get("ELLSPMV_TPU_SKIP_W2"):
        # measurement ablation (WRONG results): drop the W2 pass but keep
        # a same-shape copy, so the pipeline time delta vs the full run
        # bounds W2's traffic+compute for the exact-accounting validation
        # (bench/traffic.py, VERDICT r3 item 4)
        return [t[:, 0].reshape(-1) for t in taken]
    outs = _w2(jnp.asarray(plan.l1b), jnp.asarray(plan.q2),
               jnp.asarray(plan.l3), *taken,
               HB=plan.HB, NBo=plan.NBo, n=len(taken),
               interpret=interpret)
    return [o.reshape(-1) for o in outs]
