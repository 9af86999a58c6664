"""Static stream permutation: sort-free reordering when every element's
destination is known at plan time.

The stream SpMV path (formats/stream.py) needs its product stream reordered
from column order into row-tile order. Round 1 did this with a runtime
`lax.sort` over precomputed keys — paying O(n log^2 n) bitonic work for a
permutation that is fully known at build time (the reference's analogous
random-access inner loop is csrspmv.c:1590-1592, which a CPU just eats).
This module routes the stream instead with two dense passes:

1. **take** — the input is grouped at build time into 128-element granules
   that are *pure* per output supertile (a supertile = `sup_rows`x128
   elements routed together in VMEM). One XLA row-gather (`jnp.take` on a
   (rows,128) view) moves whole granules to their supertile; row-granular
   static gathers run at ~HBM speed on v5e (BENCH_NOTES).
2. **route** — a Pallas kernel permutes each supertile in VMEM with three
   chained gathers: lane-gather, sublane-gather, lane-gather (a 3-stage
   Clos network: rows are the switches, lanes the middle stage). The
   middle-stage "color" of every element comes from a Koenig/Euler-split
   bipartite edge coloring computed on the host at build time — degrees
   are <=128, so 128 colors (= lanes) always suffice.

Granule purity needs freedom to reorder the input within blocks (the
product kernel's row tiles: entries within a tile may be stored in any
order, SURVEY hot-loop 1). `build_permute(free_block=B)` therefore emits a
`pre` map the caller applies to its stored arrays at build time; pure-pad
slots inserted for granule rounding carry `pre == -1`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops.ell_pallas import _i0, _lane_gather

__all__ = ["PermutePlan", "build_permute", "apply_permute"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sub_gather(op, ridx):
    """out[r, l] = op[ridx[r, l], l] — the sublane dual of `_lane_gather`,
    emitted directly as lax.gather with int32 indices (Mosaic has no
    64-bit types)."""
    g = ridx[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


# --------------------------------------------------------------------------
# Host: bipartite edge coloring (Koenig via Euler splits)
# --------------------------------------------------------------------------

def _bipartition_components(pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """2-color the path/even-cycle graph whose vertices are edge ids and
    whose adjacency is the two partner arrays (-1 = none). Vectorized
    label propagation + pointer doubling; returns parity in {0,1}."""
    E = len(pa)
    lab = np.arange(E, dtype=np.int64)
    par = np.zeros(E, dtype=np.int8)
    if E == 0:
        return par
    # relax moves the component minimum one graph hop per round while
    # pointer doubling compresses adopted-label chains; the hybrid needs
    # up to ~O(log^2) rounds, so iterate to the true fixed point
    max_rounds = 4 * int(np.ceil(np.log2(max(E, 2)))) ** 2 + 64
    for _ in range(max_rounds):
        changed = False
        for nbr in (pa, pb):
            valid = nbr >= 0
            idx = np.where(valid, nbr, 0)
            nl = np.where(valid, lab[idx], E)
            np_ = np.where(valid, par[idx] ^ 1, 0).astype(np.int8)
            better = nl < lab
            if better.any():
                changed = True
                lab = np.where(better, nl, lab)
                par = np.where(better, np_, par).astype(np.int8)
        nl = lab[lab]
        np_ = (par ^ par[lab]).astype(np.int8)
        if not (nl == lab).all():
            changed = True
        lab, par = nl, np_
        if not changed:
            break
    else:
        raise RuntimeError("bipartition did not converge")
    return par


def _pair_within(groups: np.ndarray) -> np.ndarray:
    """Pair consecutive edges within each group (sorted by `groups`);
    returns partner edge id or -1. `groups` may be any integer key."""
    E = len(groups)
    order = np.argsort(groups, kind="stable")
    g = groups[order]
    # local rank within group
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
    colors = np.zeros(E, np.int64)
    if E == 0:
        return colors
    levels = int(np.ceil(np.log2(max(max_colors, 2))))
    cls = np.zeros(E, np.int64)
    for lev in range(levels):
        # pair within (class, node) on both sides; class keys keep the
        # recursion's subsets independent in one vectorized pass
        pa = _pair_within(cls * (src.max() + 1) + src)
        pb = _pair_within(cls * (dst.max() + 1) + dst)
        half = _bipartition_components(pa, pb)
        cls = cls * 2 + half
    return cls


def _edge_color(src: np.ndarray, dst: np.ndarray,
                max_colors: int = 128) -> np.ndarray:
    from ellspmv_tpu.io import native
    if len(src) >= 200_000 and native.available():
        try:
            return native.edge_color(src, dst, max_colors)
        except Exception:
            pass
    return _edge_color_numpy(src, dst, max_colors)


# --------------------------------------------------------------------------
# Plan container + builder
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PermutePlan:
    """Static routing of an input stream onto output positions.

    Apply order: `take` (XLA row gather by `gsrc`) then `route` (Pallas
    3-gather Clos pass per supertile)."""
    gsrc: jax.Array | np.ndarray    # (T*H_in,) i32 source row per granule
    l1: jax.Array | np.ndarray      # (T*H_in, 128) i8 stage-1 lane map
    r2: jax.Array | np.ndarray      # (T*H, 128) i16/i32 stage-2 row map
    l3: jax.Array | np.ndarray      # (T*H, 128) i8 stage-3 lane map
    H_in: int = dataclasses.field(metadata=dict(static=True))
    H: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))
    n_in: int = dataclasses.field(metadata=dict(static=True))   # padded
    n_out: int = dataclasses.field(metadata=dict(static=True))  # padded

    def device_put(self) -> "PermutePlan":
        return jax.tree_util.tree_map(jnp.asarray, self)


@dataclasses.dataclass
class PermuteBuild:
    plan: PermutePlan
    pre: np.ndarray                 # (n_in,) original index or -1 (pad)


def build_permute(target: np.ndarray, n_out: int, free_block: int,
                  sup_rows: int = 2048) -> PermuteBuild:
    """Plan the permutation `out[target[k]] = in[k]` (target -1 = dropped).

    Real targets must be distinct positions in [0, n_out). `free_block`
    declares that the caller can reorder its stored input within blocks of
    that many elements (and absorb inserted pad slots); the returned `pre`
    maps new input positions to original indices (-1 = pad). Output
    positions not covered by any input hold unspecified values — consumers
    must mask, as the stream-sum kernels already do via run counts."""
    target = np.asarray(target, np.int64)
    if free_block % 128:
        raise ValueError("free_block must be a multiple of 128")
    if sup_rows % 32:
        raise ValueError("sup_rows must be a multiple of 32")
    C = sup_rows * 128
    H = sup_rows
    T = max(_round_up(n_out, C) // C, 1)
    n_out_pad = T * C

    real = np.flatnonzero(target >= 0)
    tr = target[real]
    if len(tr) and (tr.max() >= n_out or len(np.unique(tr)) != len(tr)):
        raise ValueError("targets must be distinct positions in [0, n_out)")
    u = tr // C                                   # supertile per element

    # --- pre-order: group by supertile within each free block, pad each
    # (block, supertile) run to whole 128-granules
    blk = real // free_block
    order = np.lexsort((tr, u, blk))              # by block, then supertile
    rb, ru = blk[order], u[order]
    # run starts of (block, supertile) groups
    new_grp = np.concatenate([[True], (rb[1:] != rb[:-1])
                              | (ru[1:] != ru[:-1])])
    grp_id = np.cumsum(new_grp) - 1
    grp_sizes = np.bincount(grp_id)
    grp_u = ru[new_grp]
    grp_gran = -(-grp_sizes // 128)               # granules per group
    gran_of_grp = np.concatenate([[0], np.cumsum(grp_gran)])
    NG = int(gran_of_grp[-1])
    n_in_pad = NG * 128

    # position of each (ordered) element in the padded input stream
    within = np.arange(len(order)) - np.concatenate(
        [[0], np.cumsum(grp_sizes)])[:-1][grp_id]
    pos = gran_of_grp[grp_id] * 128 + within
    pre = np.full(n_in_pad, -1, np.int64)
    pre[pos] = real[order]

    # granule -> supertile
    gran_u = np.repeat(grp_u, grp_gran)

    # --- take stage: each supertile's granules, padded to a common H_in
    g_per_u = np.bincount(gran_u, minlength=T)
    H_in = max(int(_round_up(max(g_per_u.max(), 1), 32)), 32)
    gsrc = np.zeros((T, H_in), np.int64)          # pad rows read row 0
    gran_slot = np.zeros(NG, np.int64)            # row within supertile
    gorder = np.argsort(gran_u, kind="stable")
    slot_in_u = np.arange(NG) - np.concatenate(
        [[0], np.cumsum(g_per_u)])[:-1][gran_u[gorder]]
    gran_slot[gorder] = slot_in_u
    gsrc[gran_u[gorder], slot_in_u] = gorder
    gsrc = gsrc.reshape(-1)

    # --- route stage: per-element coordinates after take
    e_u = ru                                      # sorted-order view
    e_rs = gran_slot[gran_of_grp[grp_id] + within // 128]
    e_ls = within % 128
    t_local = tr[order] - e_u * C
    e_rd = t_local // 128
    e_ld = t_local % 128

    # Koenig coloring: distinct colors within each source row (granule)
    # and each dest row; node ids offset per supertile so one call colors
    # every supertile's independent graph
    col = _edge_color(e_u * H_in + e_rs, e_u * H + e_rd, 128)

    l1 = np.zeros((T * H_in, 128), np.int8)
    r2 = np.zeros((T * H, 128), np.int32)
    l3 = np.zeros((T * H, 128), np.int8)
    l1[e_u * H_in + e_rs, col] = e_ls
    r2[e_u * H + e_rd, col] = e_rs
    l3[e_u * H + e_rd, e_ld] = col
    r2_dt = np.int16 if H_in <= np.iinfo(np.int16).max else np.int32
    plan = PermutePlan(gsrc=gsrc.astype(np.int32), l1=l1,
                       r2=r2.astype(r2_dt), l3=l3,
                       H_in=H_in, H=H, T=T,
                       n_in=n_in_pad, n_out=n_out_pad)
    return PermuteBuild(plan=plan, pre=pre)


# --------------------------------------------------------------------------
# Device: take + route
# --------------------------------------------------------------------------

def _make_route_kernel(n_payload: int):
    def kernel(*refs):
        l1_ref, r2_ref, l3_ref = refs[:3]
        ins = refs[3:3 + n_payload]
        outs = refs[3 + n_payload:]
        l1 = l1_ref[0].astype(jnp.int32)
        r2 = r2_ref[0].astype(jnp.int32)
        l3 = l3_ref[0].astype(jnp.int32)
        for i in range(n_payload):
            v = _lane_gather(ins[i][0], l1)
            v = _sub_gather(v, r2)
            outs[i][0] = _lane_gather(v, l3)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("H_in", "H", "T", "interpret"))
def _route(l1, r2, l3, *payloads, H_in, H, T, interpret=False):
    n = len(payloads)

    def im(i):
        return (i, _i0(), _i0())

    in_specs = ([pl.BlockSpec((1, H_in, 128), im, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, H, 128), im, memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, H, 128), im, memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, H_in, 128), im,
                                memory_space=pltpu.VMEM)] * n)
    out_specs = [pl.BlockSpec((1, H, 128), im, memory_space=pltpu.VMEM)
                 for _ in range(n)]
    outs = pl.pallas_call(
        _make_route_kernel(n),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs if n > 1 else out_specs[0],
        out_shape=([jax.ShapeDtypeStruct((T, H, 128), jnp.float32)
                    for _ in range(n)] if n > 1 else
                   jax.ShapeDtypeStruct((T, H, 128), jnp.float32)),
        interpret=interpret,
    )(l1.reshape(T, H_in, 128), r2.reshape(T, H, 128),
      l3.reshape(T, H, 128), *[p.reshape(T, H_in, 128) for p in payloads])
    return outs if n > 1 else [outs]


def apply_permute(plan: PermutePlan, *payloads, interpret: bool = False):
    """Apply the planned permutation to equal-length f32 payload arrays
    (already in `pre` order, length plan.n_in). Returns arrays of length
    plan.n_out; positions no input mapped to are unspecified."""
    gsrc = jnp.asarray(plan.gsrc)
    taken = [jnp.take(jnp.asarray(p).reshape(plan.n_in // 128, 128),
                      gsrc, axis=0)
             for p in payloads]
    outs = _route(jnp.asarray(plan.l1), jnp.asarray(plan.r2),
                  jnp.asarray(plan.l3), *taken,
                  H_in=plan.H_in, H=plan.H, T=plan.T, interpret=interpret)
    return [o.reshape(-1) for o in outs]
