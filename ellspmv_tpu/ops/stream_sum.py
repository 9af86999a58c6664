"""Stream-sum: per-row sums of a value stream with a STATIC entry→row map.

This is the reassembly half of the sort-based SpMV path for matrices with
no column locality (power-law / webbase-class, BASELINE configs[3]).  The
reference has no analogue — its CPU gathers tolerate random access
(csrspmv.c:1590-1592); on TPU a random XLA element gather runs at ~80M
elements/s while `lax.sort` moves >700M/s — so the TPU-native design turns
the random access into one sort plus dense passes:

- every entry's destination row is known at *plan* time, so each entry gets
  a static sort key = its virtual position in a row-tiled, slot-major
  layout (rows sigma-sorted by descending count, tiles of R=1024 rows
  bucketed by pow2 slot count — the SELL-sigma idea applied to a sum
  schedule instead of a storage format);
- ONE runtime `lax.sort` by those keys (or the statically planned router,
  ops/permute.py) delivers every (tile, slot) group as a contiguous run of
  the value stream, ordered by lane — run starts are ALIGNED to 128-lane
  boundaries at plan time (interior pad measured +0.2% of stream length on
  the power-law config), so the run already sits on the lane grid;
- a Pallas kernel walks the runs: per slot it slices the run's G sublane
  rows straight out of the window (rows within a tile are sorted by
  descending count, so slot s occupies lanes [0, c_ts): a pure prefix —
  the count mask alone separates it from the next run) and accumulates in
  double-double; `sub` consecutive tiles of small-S buckets fold into one
  grid step sharing a window DMA (the ~230 ns/grid-step overhead would
  otherwise dominate buckets with hundreds of single-slot tiles);
- rows longer than `cap` entries are split into sub-rows and the sub-sums
  feed a recursively built next level; the final level's output is put in
  natural row order by one more (n-sized) key sort.

Cost: sort(nnz) + ~Sigma_tiles(S_t) VPU slot steps — for 1M random-column
entries ~1 ms total where the windowed-scan kernel needs >20 ms.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops.ell_pallas import _dd_add, _i0, _lane_gather

_I32_SENTINEL = np.int32(np.iinfo(np.int32).max)   # pads sort to the end
G = 8                # 128-row groups per tile (R = G*128 = 1024)
R = G * 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow2ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


# --------------------------------------------------------------------------
# Pallas kernel: one bucket (uniform slot count S) of tiles.
# --------------------------------------------------------------------------

def _make_sum_kernel(S: int, K: int, T: int, dd: bool, nacc: int = None,
                     sub: int = 1):
    """Per grid step: DMA the window of the sorted value stream covering
    `sub` consecutive tiles' runs (double-buffered), then for each
    (subtile j, slot s) slice run [o, o + ceil(c/128)*128) — run starts
    are 128-aligned by the plan, so the run's elements already sit on the
    (G, 128) lane grid at window rows [o>>7, o>>7 + G) — mask by the run
    count (lanes >= c belong to the next run / alignment pad) and add."""

    if nacc is None:
        # with the aligned-run slice-only steps the per-slot dd-add chain
        # is the critical path; independent accumulators pipeline it
        # (env read at call time like every other ELLSPMV_TPU_* knob, so
        # sweep harnesses / monkeypatches set after import still apply)
        import os
        nacc = int(os.environ.get("ELLSPMV_TPU_SUM_NACC", "2"))
    unroll = S <= 16

    def kernel(es_ref, oc_ref, *rest):
        if dd:
            sh_ref, sl_ref, yh_ref, yl_ref, win_h, win_l, sem_h, sem_l = rest
        else:
            sv_ref, y_ref, win, sem = rest
        i = pl.program_id(0)
        buf = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        sbase = buf * jnp.int32(K)

        def dmas(b, tile):
            dst = pl.ds(b * jnp.int32(K), K)
            src = pl.ds(es_ref[tile], K)
            if dd:
                return (pltpu.make_async_copy(sh_ref.at[src], win_h.at[dst],
                                              sem_h.at[b]),
                        pltpu.make_async_copy(sl_ref.at[src], win_l.at[dst],
                                              sem_l.at[b]))
            return (pltpu.make_async_copy(sv_ref.at[src], win.at[dst],
                                          sem.at[b]),)

        @pl.when(i == 0)
        def _():
            for c in dmas(buf, i):
                c.start()

        @pl.when(i + 1 < T)
        def _():
            for c in dmas(nxt, i + jnp.int32(1)):
                c.start()

        for c in dmas(buf, i):
            c.wait()

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        flat_i = (jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0)
                  * jnp.int32(128) + lane_i)

        def slot_step(s, acc, acc_l):
            o = oc_ref[0, 0, s]
            c = oc_ref[0, 1, s]
            osub = jax.lax.shift_right_logical(o, jnp.int32(7))
            mask = flat_i < c

            def take(w):
                # aligned run: element o + g*128 + l IS window row
                # (o>>7) + g, lane l — a pure sublane slice, no gathers
                return jnp.where(mask, w[pl.ds(sbase + osub, G)],
                                 jnp.float32(0))

            if dd:
                return _dd_add(acc, acc_l, take(win_h), take(win_l))
            return acc + take(win), acc_l

        zero = lambda: jnp.zeros((G, 128), jnp.float32)

        def subtile(jS):
            if unroll:
                na = max(1, min(nacc, S))
                accs = [(zero(), zero() if dd else jnp.float32(0))
                        for _ in range(na)]
                for s in range(S):
                    accs[s % na] = slot_step(jS + s, *accs[s % na])
                acc, acc_l = accs[0]
                for a2, a2l in accs[1:]:
                    if dd:
                        acc, acc_l = _dd_add(acc, acc_l, a2, a2l)
                    else:
                        acc = acc + a2
            else:
                # wide slot spaces: fori over rounds of `na` slots so the
                # independent accumulators still break the serial dd-add
                # chain (a plain per-slot fori would serialize everything)
                na = max(1, min(nacc, S))
                while S % na:
                    na -= 1

                def round_body(r_, carry):
                    accs = list(carry)
                    base = jnp.int32(jS) + r_ * jnp.int32(na)
                    for k2 in range(na):
                        accs[k2] = slot_step(base + jnp.int32(k2),
                                             *accs[k2])
                    return tuple(accs)

                carry0 = tuple((zero(), zero() if dd else jnp.float32(0))
                               for _ in range(na))
                accs = jax.lax.fori_loop(jnp.int32(0),
                                         jnp.int32(S // na),
                                         round_body, carry0)
                acc, acc_l = accs[0]
                for a2, a2l in accs[1:]:
                    if dd:
                        acc, acc_l = _dd_add(acc, acc_l, a2, a2l)
                    else:
                        acc = acc + a2
            return acc, acc_l

        for j in range(sub):
            acc, acc_l = subtile(j * S)
            r = slice(j * G, (j + 1) * G)
            if dd:
                yh_ref[0, r, :] = acc
                yl_ref[0, r, :] = acc_l
            else:
                y_ref[0, r, :] = acc

    return kernel


def _sum_specs(S, n_stream, n_out, sub=1):
    def im3(i, *_):
        return (i, _i0(), _i0())

    in_specs = ([pl.BlockSpec((1, 2, sub * S), im3,
                              memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * n_stream)
    outs = [pl.BlockSpec((1, sub * G, 128), im3, memory_space=pltpu.VMEM)
            for _ in range(n_out)]
    return in_specs, (outs if n_out > 1 else outs[0])


@functools.partial(jax.jit,
                   static_argnames=("S", "K", "T", "sub", "interpret"))
def _runsum_dd(estart, oc, sh, sl, S, K, T, sub=1, interpret=False):
    in_specs, out_specs = _sum_specs(S, 2, 2, sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * K + 16, 128), jnp.float32),
            pltpu.VMEM((2 * K + 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_sum_kernel(S, K, T, dd=True, sub=sub),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32)],
        interpret=interpret,
    )(estart, oc, sh, sl)


@functools.partial(jax.jit,
                   static_argnames=("S", "K", "T", "sub", "interpret"))
def _runsum_f32(estart, oc, sv, S, K, T, sub=1, interpret=False):
    in_specs, out_specs = _sum_specs(S, 1, 1, sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * K + 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_sum_kernel(S, K, T, dd=False, sub=sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32),
        interpret=interpret,
    )(estart, oc, sv)


# --------------------------------------------------------------------------
# Host-side plan
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SumBucket:
    estart: jax.Array | np.ndarray     # (T,) i32 window base row per step
    oc: jax.Array | np.ndarray         # (T, 2, sub*S) i32 [run start; count]
    S: int = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))
    # tiles folded per grid step (_fold_buckets); oc row j*S+s = subtile
    # j's slot s, outputs stacked (sub*G, 128) per step
    sub: int = dataclasses.field(default=1, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SumLevel:
    keys: jax.Array | np.ndarray       # (in_len,) i32 sort keys
    tkeys: jax.Array | np.ndarray      # (out_len - multi_len,) i32 final
                                       # row per terminal output position
    buckets: list                      # list[SumBucket]
    in_rows: int = dataclasses.field(metadata=dict(static=True))
    out_len: int = dataclasses.field(metadata=dict(static=True))
    # split rows' tiles form the [0, multi_len) PREFIX of the output: the
    # next level consumes exactly that slice (a free static slice — no
    # n-sized sort for rows already completed at this level)
    multi_len: int = dataclasses.field(metadata=dict(static=True))
    # input stream length (entries; `keys` additionally carries the
    # alignment-gap filler positions at [in_len:] for the sort path)
    in_len: int = dataclasses.field(default=0,
                                    metadata=dict(static=True))
    # statically-planned routing replacing the runtime key sort
    # (ops/permute.py); None = sort by `keys` at runtime
    perm: object = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamSumPlan:
    levels: list                       # list[SumLevel]
    final_keys: jax.Array | np.ndarray  # concat of level tkeys (i32 row)
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    # static routing for the final natural-order reorder (None = sort)
    final_perm: object = None
    # column-chunked level 1 (wide-column scale): BLOCK-aligned global
    # stream base of each chunk's region, C+1 cumulative entries; () when
    # unchunked. Build-time metadata for the stream builder's per-chunk
    # mega grouping — never read at runtime.
    chunk_bases: tuple = dataclasses.field(default=(),
                                           metadata=dict(static=True))

    def device_put(self):
        return jax.tree_util.tree_map(jnp.asarray, self)


def _position_targets(keys: np.ndarray) -> np.ndarray:
    """Static-permutation target map: keys ARE the aligned stream
    positions (sentinels -> -1); gap positions simply receive no element
    (the kernel's count mask never reads them)."""
    keys = np.asarray(keys)
    return np.where(keys == _I32_SENTINEL, np.int64(-1),
                    keys.astype(np.int64))


def _attach_perms(plan: "StreamSumPlan") -> None:
    """Replace the runtime sorts of levels >= 2 and the final reorder with
    static routing (ops/permute.py) where the router's half-block budget
    allows (their inputs are previous-level outputs, so the input order is
    fixed but small). Level 1 is handled by the stream builder, which owns
    the entry order. The sharded-uniform path keeps sorts: per-device
    router shapes would differ and break SPMD uniformity."""
    import os
    if os.environ.get("ELLSPMV_TPU_NO_PERMUTE"):
        return
    # below this stream length a lax.sort is comparable to the router's
    # fixed per-pass costs; ELLSPMV_TPU_PERMUTE_MIN tunes the crossover
    min_len = int(os.environ.get("ELLSPMV_TPU_PERMUTE_MIN", "0"))
    from ellspmv_tpu.ops.permute import build_permute
    for lv in plan.levels[1:]:
        if len(np.asarray(lv.keys)) < min_len:
            continue
        try:
            lv.perm = build_permute(
                _position_targets(np.asarray(lv.keys)[:lv.in_len]),
                n_out=lv.in_rows * 128, validate=False)
        except ValueError:
            pass
        else:
            # size the kernel's stream view to the router's padded output:
            # the apply-side slice/pad around the Pallas call then
            # disappears (it was a full extra HBM round trip of the stream)
            lv.in_rows = max(lv.in_rows, lv.perm.n_out // 128)
            # the sort keys are dead once the router owns the reorder:
            # dropping them saves their device transfer at conversion time
            lv.keys = np.zeros(0, np.int32)
    # tkeys only feed the final_keys concat at build time; never read at
    # runtime — keep them off the device transfer (before any early
    # return below, so the cleanup happens regardless of min_len)
    for lv in plan.levels:
        lv.tkeys = np.zeros(0, np.int32)
    # final reorder: every row terminates exactly once, so the sorted
    # position of a terminal output IS its row id
    fk = np.asarray(plan.final_keys)
    if len(fk) < min_len:
        return
    target = np.where(fk == _I32_SENTINEL, np.int64(-1),
                      fk.astype(np.int64))
    try:
        plan.final_perm = build_permute(target, n_out=plan.num_rows,
                                        validate=False)
    except ValueError:
        pass
    else:
        plan.final_keys = np.zeros(0, np.int32)


def _build_level(dest: np.ndarray, n_rows: int, cap: int,
                 include_empty_rows: bool, forward_all: bool = False,
                 forced=None, force_multi: np.ndarray | None = None,
                 empty_terminal: np.ndarray | None = None,
                 scramble: bool = False):
    """One sum level. `dest` maps each input position to a row (-1 = pad).

    Rows with <= cap entries complete here: their sums land in the
    single-group SUFFIX of the output with `tkeys` naming the row. Rows
    with more split into sub-rows whose sums land in the multi-group
    PREFIX [0, multi_len); `out_dest` (length multi_len) maps those
    positions to parent rows for the next level. `include_empty_rows`
    gives 0-entry rows a terminal zero (level 1 only: deeper levels must
    not re-emit rows that completed earlier).

    Column-chunked streams (formats/stream.py at wide-column scale) build
    one level per column chunk: `force_multi` (bool per row) marks rows
    with entries in OTHER chunks too, whose partial sums here must feed
    the merge level rather than terminate, and `empty_terminal` (bool per
    row) replaces the blanket include_empty_rows with an explicit mask of
    count-0 rows owed a terminal zero by THIS chunk (exactly one chunk
    may own a row's zero, or the final reorder would see duplicate
    targets).

    SPMD options (sharded stream): `forward_all=True` marks EVERY row as
    multi, so the whole output feeds the next level (pass-through
    aggregation of count-1 rows emulates a no-op level on devices that
    finished early). `forced=(bucket_shapes, K_of, in_rows)` with
    bucket_shapes=[(S, T_b), ...] dictates the output layout: this
    device's tiles fill the first slots of each forced bucket, the rest
    are zero-run pad tiles — every device then compiles the SAME kernel
    shapes. Returns (level, out_dest, shape) where shape is this level's
    own (bucket_shapes, K_of, in_rows) for unification."""
    E = len(dest)
    valid = dest >= 0
    vpos = np.flatnonzero(valid)
    # int32 internals where the sizes allow: the stable argsort and the
    # rank gathers are radix/cache-bound, so narrowing halves their cost
    # (single-core plan-build time, VERDICT r2 item 4)
    idt = np.int32 if max(E, n_rows) < 2**31 else np.int64
    rows_v = dest[vpos].astype(idt, copy=False)
    counts = np.bincount(rows_v, minlength=n_rows).astype(np.int64,
                                                          copy=False)

    # rank of each entry within its row, by position order (stable; native
    # radix — numpy introsort costs ~1 s at 7M keys, VERDICT r3 item 5).
    # cells mode (scramble): rank by a POSITION HASH instead — positional
    # ranks over a column-sorted segment make slot-s runs order-statistic
    # tails (slot 0 = every row's MINIMUM column), which concentrates a
    # dest block's slot-0 runs into the low-column input blocks of the
    # uniform-cell router (~6x mean cell load measured at power-law 21M
    # nnz; BENCH_NOTES round 3 saw the same tails on banded-random).
    # Which entry takes which rank only relabels entry -> position within
    # the row's own runs; the per-row addend set, the aligned layout and
    # every window are unchanged.
    from ellspmv_tpu.io import native as _native
    if scramble and idt is np.int32:    # row ids fit the 32-bit key half
        h = ((vpos.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(32))
        order = _native.argsort(
            (rows_v.astype(np.uint64) << np.uint64(32)) | h)
    else:
        order = _native.argsort(rows_v)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(idt)
    rank_sorted = np.arange(len(vpos), dtype=idt) - starts[rows_v[order]]
    rank = np.empty(len(vpos), idt)
    rank[order] = rank_sorted

    # split rows longer than cap into sub-rows of <= cap entries
    nsub = np.maximum(-(-counts // cap), 1)
    if empty_terminal is not None:
        nsub[(counts == 0) & ~empty_terminal] = 0
    elif not include_empty_rows:
        nsub[counts == 0] = 0
    sub_base = np.concatenate([[0], np.cumsum(nsub)])
    n_vrows = int(sub_base[-1])
    vrow = (sub_base[rows_v] + rank // cap).astype(idt)
    vrank = rank % cap
    vcounts = np.full(n_vrows, cap, np.int64)
    has = nsub > 0
    last = (sub_base[:-1] + nsub - 1)[has]
    vcounts[last] = (counts - (nsub - 1) * cap)[has]  # 0 for empty rows
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), nsub)

    # sigma order: split ("multi") rows' sub-rows first, then completed
    # ("single") rows — each group R-padded so (a) within-tile counts stay
    # descending (the kernel's lane-prefix invariant) and (b) the multi
    # group is a whole-tile prefix of the output
    if forward_all:
        vrow_multi = np.ones(n_vrows, bool)
    else:
        vrow_multi = (counts > cap)[parent]          # (n_vrows,)
        if force_multi is not None:
            vrow_multi |= force_multi[parent]
    # (a sigma hash tie-break was tried here for the cells route: it
    # scattered each dest block's rows across the chunk and fixed the
    # near-diagonal cell overloads, but it also scattered every TERMINAL
    # tile's rows, blowing the FINAL reorder's (input block, dest block)
    # grouping budget past ~4M rows — the final route silently degraded
    # to a 10M-key runtime lax.sort, ~40 ms at 10x scale. The quota deal
    # in formats/stream.py hard-bounds cell loads without it.)
    sigperm = np.lexsort((-vcounts, np.where(vrow_multi, 0, 1)))
    n_multi_v = int(vrow_multi.sum())
    n_multi_pad = _round_up(n_multi_v, R) if n_multi_v else 0
    n_single_v = n_vrows - n_multi_v
    n_sig = n_multi_pad + _round_up(n_single_v, R)
    n_sig = max(n_sig, R)
    sig_pos_of_rank = np.arange(n_vrows)
    sig_pos_of_rank = np.where(sig_pos_of_rank < n_multi_v,
                               sig_pos_of_rank,
                               n_multi_pad + sig_pos_of_rank - n_multi_v)
    sig_of = np.empty(n_vrows, idt)
    sig_of[sigperm] = sig_pos_of_rank
    T_all = n_sig // R
    T0 = n_multi_pad // R                            # multi-group tiles
    counts_sig = np.zeros(n_sig, np.int64)
    counts_sig[sig_of] = vcounts
    vrow_at_sig = np.full(n_sig, -1, np.int64)
    vrow_at_sig[sig_of] = np.arange(n_vrows)
    S_tile = counts_sig.reshape(T_all, R)[:, 0]      # descending => max
    S_bucket_of = np.array([_pow2ceil(max(int(s), 1)) for s in S_tile])

    # concat order: multi tiles first, bucket-major within each group;
    # forced mode maps this device's tiles into the dictated layout
    ct_of_tile = np.empty(T_all, np.int64)
    pos = 0
    if forced is None:
        groups = [np.arange(T0), np.arange(T0, T_all)]
        bucket_list = []                             # [(S, tiles, T_b)]
        for g_tiles in groups:
            for S in sorted(set(int(b) for b in S_bucket_of[g_tiles])):
                tl = g_tiles[S_bucket_of[g_tiles] == S]
                ct_of_tile[tl] = pos + np.arange(len(tl))
                pos += len(tl)
                bucket_list.append((S, tl, len(tl)))
    else:
        fb, fK, f_in_rows = forced
        assert T0 in (0, T_all), "forced layouts are single-group"
        own_by_S = {}
        for S in sorted(set(int(b) for b in S_bucket_of)):
            own_by_S[S] = np.flatnonzero(S_bucket_of == S)
        bucket_list = []
        for S, T_f in fb:
            own = own_by_S.pop(S, np.zeros(0, np.int64))
            assert len(own) <= T_f, "forced bucket too small"
            ct_of_tile[own] = pos + np.arange(len(own))
            pos += T_f
            bucket_list.append((S, own, T_f))
        assert not own_by_S, "bucket size missing from forced layout"
    T_concat = pos

    # per-(tile, slot) counts via a per-tile count histogram (counts are
    # descending within a tile, so slot s's lanes are the prefix [0, c))
    capp = int(S_bucket_of.max())
    H = np.zeros((T_all, capp + 2), np.int64)
    tile_of_sig = np.arange(n_sig) // R
    real_sig = vrow_at_sig >= 0
    np.add.at(H, (tile_of_sig[real_sig],
                  np.clip(counts_sig[real_sig], 0, capp + 1)), 1)
    suffix = H[:, ::-1].cumsum(axis=1)[:, ::-1]      # suffix[t,v] = #(>= v)

    # ALIGNED run starts: exclusive cumsum of ceil(c/128)*128 in concat
    # (group, bucket, tile, slot) order — every run begins at a 128-lane
    # boundary so the kernel's realign is a pure sublane slice (no lane
    # gathers). The interior pad is tiny: only the runs whose count is not
    # a 128-multiple pay (+0.2% of stream length on the power-law config).
    buckets_np = []
    align_base = 0
    n_real = 0
    per_bucket_runs = []
    start_of = np.zeros((T_all, capp), np.int64)      # tile, slot -> start
    for S, tl, T_b in bucket_list:
        c = np.zeros((T_b, S), np.int64)
        if len(tl):
            c[:len(tl)] = suffix[tl][:, 1:S + 1]     # (T_b, S): #(> s)
        ca = -(-c // 128) * 128                      # aligned run sizes
        o = align_base + np.concatenate(
            [[0], np.cumsum(ca.ravel())[:-1]]).reshape(T_b, S)
        align_base += int(ca.sum())
        n_real += int(c.sum())
        if len(tl):
            start_of[tl, :S] = o[:len(tl)]
        per_bucket_runs.append((S, tl, T_b, o, c, ca))
    assert n_real == len(vpos)
    stream_top = align_base

    if stream_top + 1 >= np.iinfo(np.int32).max:
        raise ValueError("stream-sum aligned position space exceeds int32")

    # entry sort keys ARE the aligned stream positions (rows within a tile
    # are sigma-sorted descending, so run (t, s) holds exactly the lanes
    # [0, c_ts) — an entry's rank within its run is its lane)
    keys = np.full(E, _I32_SENTINEL, np.int32)
    tg = sig_of[vrow] // R
    lane = sig_of[vrow] % R
    keys[vpos] = (start_of[tg, vrank] + lane).astype(np.int32)

    # gap filler positions (sort path only: lax.sort needs explicit
    # entries at the alignment gaps so that rank == position; the static
    # router simply never maps them and the kernel's count mask never
    # reads them)
    gap_parts = []
    for S, tl, T_b, o, c, ca in per_bucket_runs:
        cr, car, orr = c.ravel(), ca.ravel(), o.ravel()
        part = car > cr
        if part.any():
            lens = (car - cr)[part]
            starts_g = (orr + cr)[part]
            idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(lens) - lens, lens)
            gap_parts.append((np.repeat(starts_g, lens) + idx))
    gaps = (np.concatenate(gap_parts).astype(np.int32) if gap_parts
            else np.zeros(0, np.int32))
    keys = np.concatenate([keys, gaps])

    # per-bucket kernel metadata
    in_rows_needed = _round_up(max(len(keys), 1), 128) // 128
    shape_buckets, shape_K = [], {}
    for S, tl, T_b, o, c, ca in per_bucket_runs:
        end = o[:, -1] + ca[:, -1]                   # aligned run end
        wrow = np.maximum((o[:, 0] >> 7) & ~7, 0)
        K = int(np.max(-(-(end - wrow * 128) // 128) + G + 2))
        K = _round_up(max(K, 8), 8)
        shape_buckets.append((S, T_b))
        shape_K[S] = max(shape_K.get(S, 0), K)
        if forced is not None:
            assert K <= forced[1][S], "forced window too small"
            K = forced[1][S]
        in_rows_needed = max(in_rows_needed, int(np.max(wrow)) + K)
        oc = np.stack([(o - wrow[:, None] * 128), c], axis=1)
        buckets_np.append(SumBucket(
            estart=wrow.astype(np.int32), oc=oc.astype(np.int32),
            S=S, K=K, T=T_b))
    if forced is not None:
        assert in_rows_needed <= forced[2], "forced stream too short"
        in_rows_needed = forced[2]
    shape = (shape_buckets, shape_K, in_rows_needed, stream_top)

    out_len = T_concat * R
    multi_len = out_len if forward_all else T0 * R

    # output position -> sigma position -> vrow (-1 for forced pad tiles)
    ct_inv = np.full(T_concat, -1, np.int64)
    ct_inv[ct_of_tile] = np.arange(T_all)            # concat tile -> tile
    pos_tile = np.repeat(ct_inv, R)
    sig_pos = pos_tile * R + np.tile(np.arange(R), T_concat)
    vr = np.where(pos_tile >= 0,
                  vrow_at_sig[np.clip(sig_pos, 0, n_sig - 1)], -1)

    # terminal suffix: completed rows (or pads) -> final row keys
    vr_term = vr[multi_len:]
    tkeys = np.where(vr_term >= 0, parent[np.maximum(vr_term, 0)],
                     _I32_SENTINEL).astype(np.int32)
    level = SumLevel(keys=keys, tkeys=tkeys, buckets=buckets_np,
                     in_rows=in_rows_needed, out_len=out_len,
                     multi_len=multi_len, in_len=E)
    if multi_len == 0:
        return level, None, shape
    vr_multi = vr[:multi_len]
    out_dest = np.where(vr_multi >= 0, parent[np.maximum(vr_multi, 0)], -1)
    return level, out_dest, shape


def _fold_buckets(level: SumLevel, max_k: int = 1024) -> None:
    """Supertile small-S buckets: fold `sub` consecutive tiles into one
    grid step (one shared window DMA, one step's bookkeeping). The
    measured ~230 ns/grid-step overhead otherwise dominates buckets with
    hundreds of single-slot tiles (891 S=1 tiles on the power-law
    config). Tail tiles (T % sub) become a second sub=1 bucket; the
    raveled output order is preserved, so out_len/tkeys are untouched."""
    new = []
    for b in level.buckets:
        sub = next((cand for cand in (16, 8, 4, 2)
                    if b.S * cand <= 32 and b.T >= 2 * cand), 1)
        if sub == 1 or b.sub != 1:
            new.append(b)
            continue
        T_s = b.T // sub
        main_T = T_s * sub
        es = np.asarray(b.estart, np.int64)
        oc = np.asarray(b.oc, np.int64)
        es_g = es[:main_T].reshape(T_s, sub)
        base = es_g[:, 0]                    # run starts ascend in-bucket
        K_s = _round_up(int(((es_g - base[:, None]).max(axis=1)
                             + b.K).max()), 8)
        if K_s > max_k:
            new.append(b)
            continue
        # the shared window [base, base+K_s) may reach past the last
        # subtile's own window; grow the stream view so the DMA can never
        # run off the array (an out-of-bounds DMA faults the TPU worker)
        level.in_rows = max(level.in_rows, int(base.max()) + K_s)
        oc_g = oc[:main_T].reshape(T_s, sub, 2, b.S).copy()
        oc_g[:, :, 0, :] += (es_g - base[:, None])[:, :, None] * 128
        oc_s = np.ascontiguousarray(
            oc_g.transpose(0, 2, 1, 3)).reshape(T_s, 2, sub * b.S)
        new.append(SumBucket(estart=base.astype(np.int32),
                             oc=oc_s.astype(np.int32),
                             S=b.S, K=K_s, T=T_s, sub=sub))
        if b.T > main_T:
            new.append(SumBucket(estart=es[main_T:].astype(np.int32),
                                 oc=oc[main_T:].astype(np.int32),
                                 S=b.S, K=b.K, T=b.T - main_T))
    level.buckets = new


def _splice_chunk_levels(parts, region_align=0):
    """Merge per-chunk level-1 builds into ONE SumLevel over a global
    stream whose chunk regions are consecutive BLOCK-aligned slices.

    `parts` is a chunk-ordered list of (level, out_dest, stream_top,
    seg_len); level is None for a chunk with no entries and no owed
    terminals (its seg contributes sentinel keys only). Output tiles are
    regrouped (multi buckets first, then single, S ascending, chunks
    interleaved within equal S) so same-S buckets across chunks merge
    into ONE kernel call — without the merge, C chunks x ~8 pow2 buckets
    would each compile and launch separately. Returns (level,
    out_dest_global | None, chunk_bases)."""
    from ellspmv_tpu.ops.permute import BLOCK

    # chunk regions align to `region_align` (= bpg*BLOCK when the
    # uniform-cell router will be attempted, so its group grid tiles
    # them exactly; plain BLOCK otherwise — the bigger pad would cost
    # the general route ~25% dead dest blocks at 1M scale). The
    # general/sort paths tolerate either (gap fillers cover the pad).
    align = max(region_align, BLOCK)
    bases, pos = [], 0
    for (lv, od, top, seg_len) in parts:
        bases.append(pos)
        if lv is not None:
            pos += _round_up(max(int(top), 1), align)
    bases.append(pos)
    if pos + 1 >= np.iinfo(np.int32).max:
        raise ValueError("chunked stream position space exceeds int32")

    key_parts, gap_parts = [], []
    tiles = []          # (group, S, chunk, estart_glob, oc, K, seg)
    in_rows_glob = _round_up(max(pos, 128), 128) // 128
    for ci, (lv, od, top, seg_len) in enumerate(parts):
        if lv is None:
            key_parts.append(np.full(seg_len, _I32_SENTINEL, np.int32))
            continue
        base = bases[ci]
        base_rows = base // 128
        k = np.asarray(lv.keys)
        ent = k[:lv.in_len]
        key_parts.append(np.where(
            ent == _I32_SENTINEL, np.int32(_I32_SENTINEL),
            (ent.astype(np.int64) + base).astype(np.int32)))
        # gap fillers: the level's own aligned-run interior pad, plus the
        # inter-chunk BLOCK pad [top, base_next) — the sort fallback needs
        # every position below the top filled so rank == position
        g = k[lv.in_len:].astype(np.int64) + base
        top_i = max(int(top), 1)
        inter = np.arange(base + top_i, bases[ci + 1], dtype=np.int64)
        gap_parts.append(np.concatenate([g, inter]).astype(np.int32))
        in_rows_glob = max(in_rows_glob, base_rows + lv.in_rows)
        off = 0
        tk = np.asarray(lv.tkeys)
        for b in lv.buckets:
            assert b.sub == 1, "splice happens before folding"
            span = b.T * R
            is_multi = off < lv.multi_len
            est = (np.asarray(b.estart, np.int64)
                   + base_rows).astype(np.int32)
            seg = (od[off:off + span] if is_multi
                   else tk[off - lv.multi_len:off - lv.multi_len + span])
            tiles.append((0 if is_multi else 1, b.S, ci, est,
                          np.asarray(b.oc), b.K, seg))
            off += span

    tiles.sort(key=lambda t: (t[0], t[1], t[2]))
    buckets, od_parts, tk_parts = [], [], []
    multi_tiles = 0
    i = 0
    while i < len(tiles):
        j = i
        while (j < len(tiles) and tiles[j][0] == tiles[i][0]
               and tiles[j][1] == tiles[i][1]):
            j += 1
        grp = tiles[i:j]
        is_multi, S = grp[0][0], grp[0][1]
        # pad each chunk's tile segment to a multiple of the fold factor:
        # _fold_buckets groups `fold` consecutive tiles under one shared
        # window, and a group straddling a chunk boundary would span the
        # inter-chunk stream jump (K > budget -> the whole bucket skips
        # folding, resurrecting the ~230 ns/step overhead folding kills).
        # Pad tiles emit zero-count runs: zero outputs with -1/sentinel
        # destinations the next level / final reorder drop.
        fold = next((c for c in (16, 8, 4, 2) if S * c <= 32), 1)
        est_parts, oc_parts, seg_parts = [], [], []
        for ti, t in enumerate(grp):
            est_c, oc_c, seg_c = t[3], t[4], t[6]
            T_c = len(est_c)
            # every segment but the last must pad (one short unpadded
            # segment would misalign every later chunk's groups)
            if fold > 1 and ti + 1 < len(grp) and T_c % fold:
                n_pad = fold - T_c % fold
                est_c = np.concatenate(
                    [est_c, np.full(n_pad, est_c[-1], est_c.dtype)])
                oc_c = np.concatenate(
                    [oc_c, np.zeros((n_pad,) + oc_c.shape[1:],
                                    oc_c.dtype)])
                fill = np.int64(-1) if is_multi == 0 else _I32_SENTINEL
                seg_c = np.concatenate(
                    [seg_c, np.full(n_pad * R, fill, seg_c.dtype)])
            est_parts.append(est_c)
            oc_parts.append(oc_c)
            seg_parts.append(seg_c)
        est = np.concatenate(est_parts)
        oc = np.concatenate(oc_parts).astype(np.int32)
        K = max(t[5] for t in grp)
        buckets.append(SumBucket(estart=est, oc=oc, S=S, K=K, T=len(est)))
        in_rows_glob = max(in_rows_glob, int(est.max()) + K)
        if is_multi == 0:
            multi_tiles += len(est)
            od_parts.extend(seg_parts)
        else:
            tk_parts.extend(seg_parts)
        i = j

    keys = np.concatenate(key_parts + gap_parts) if key_parts else \
        np.zeros(0, np.int32)
    in_rows_glob = max(in_rows_glob,
                       _round_up(max(len(keys), 1), 128) // 128)
    in_len = sum(seg_len for (_, _, _, seg_len) in parts)
    multi_len = multi_tiles * R
    out_len = sum(b.T for b in buckets) * R
    tkeys = (np.concatenate(tk_parts) if tk_parts
             else np.zeros(0, np.int32))
    level = SumLevel(keys=keys, tkeys=tkeys, buckets=buckets,
                     in_rows=in_rows_glob, out_len=out_len,
                     multi_len=multi_len, in_len=in_len)
    out_dest = (np.concatenate(od_parts) if od_parts else None)
    return level, out_dest, tuple(bases)


def _build_chunked_level1(dest: np.ndarray, n_rows: int, cap: int,
                          chunk_starts, region_align=0):
    """Per-column-chunk level-1 builds spliced into one global SumLevel.

    Each chunk's entries (a contiguous slice of `dest` — the stream
    builder orders entries chunk-major) reduce into per-chunk partial
    sums over their OWN aligned stream region, so the level-1 router only
    ever moves an entry within its chunk — that is what keeps the product
    kernel's window span at the chunk's column span instead of the full
    image (the 10x-scale ks blowup, BENCH_NOTES round 4). Rows touched by
    a single chunk terminate here; rows spanning chunks forward partials
    to the merge level."""
    chunk_starts = [int(s) for s in chunk_starts]
    C = len(chunk_starts) - 1
    valid = dest >= 0
    counts_global = np.bincount(dest[valid], minlength=n_rows)
    empty_mask = counts_global == 0
    if not empty_mask.any():
        empty_mask = None

    touch = np.zeros(n_rows, np.int16)
    for c in range(C):
        seg = dest[chunk_starts[c]:chunk_starts[c + 1]]
        segv = seg[seg >= 0]
        if len(segv):
            touch += (np.bincount(segv, minlength=n_rows) > 0)
    force_multi = touch >= 2

    parts = []
    for c in range(C):
        seg = dest[chunk_starts[c]:chunk_starts[c + 1]]
        emp = empty_mask if c == 0 else None
        if not (seg >= 0).any() and emp is None:
            parts.append((None, None, 0, len(seg)))
            continue
        level, od, shape = _build_level(
            seg, n_rows, cap, include_empty_rows=False,
            force_multi=force_multi, empty_terminal=emp,
            scramble=region_align > 0)
        parts.append((level, od, shape[3], len(seg)))
    return _splice_chunk_levels(parts, region_align)


def build_stream_sum(dest: np.ndarray, n_rows: int, cap: int = 128,
                     chunk_starts=None,
                     region_align: int = 0) -> StreamSumPlan:
    """Build the (possibly multi-level) sum plan for a value stream whose
    position k carries an addend for row `dest[k]` (-1 = padding).

    `chunk_starts` (C+1 cumulative entry boundaries; entries must be
    chunk-contiguous) builds a column-chunked level 1: per-chunk partial
    sums in per-chunk stream regions, merged by the standard deeper
    levels — the wide-column scale path (formats/stream.py)."""
    levels = []
    cur = np.asarray(dest, np.int64)
    first = True
    chunk_bases = ()
    if chunk_starts is not None and len(chunk_starts) > 2:
        level, nxt, chunk_bases = _build_chunked_level1(
            cur, n_rows, cap, chunk_starts, region_align)
        _fold_buckets(level)
        levels.append(level)
        first = False
        if nxt is None:
            final = np.concatenate([lv.tkeys for lv in levels])
            plan = StreamSumPlan(levels=levels, final_keys=final,
                                 num_rows=n_rows,
                                 chunk_bases=chunk_bases)
            _attach_perms(plan)
            return plan
        cur = nxt
    while True:
        level, nxt, _ = _build_level(cur, n_rows, cap,
                                     include_empty_rows=first)
        _fold_buckets(level)
        levels.append(level)
        first = False
        if nxt is None:
            final = np.concatenate([lv.tkeys for lv in levels])
            plan = StreamSumPlan(levels=levels, final_keys=final,
                                 num_rows=n_rows,
                                 chunk_bases=chunk_bases)
            _attach_perms(plan)
            return plan
        cur = nxt


def _sum_depth(counts: np.ndarray, cap: int) -> int:
    """Levels needed until every (virtual) row has <= cap addends."""
    m = int(counts.max()) if counts.size else 0
    depth = 1
    while m > cap:
        m = -(-m // cap)
        depth += 1
    return depth


def build_stream_sum_uniform(dests, n_rows: int,
                             cap: int = 128) -> list:
    """Per-device structurally identical plans (for shard_map SPMD).

    `dests` is one entry->local-row map per device (same length, -1 pads;
    local row spaces all sized `n_rows` = the padded device block). Two
    passes: (1) per device, chain `_build_level` with forward_all on all
    but the last level, collecting layout shapes; (2) rebuild with the
    across-device union of every level's shape, so keys/runs differ per
    device but every static (bucket sizes, tile counts, window heights,
    lengths) is shared — one compiled kernel set serves the whole mesh."""
    D = len(dests)
    dests = [np.asarray(d, np.int64) for d in dests]
    in_len = max(len(d) for d in dests)
    in_len = max(_round_up(in_len, R), R)
    dests = [np.pad(d, (0, in_len - len(d)), constant_values=-1)
             for d in dests]
    L = max(_sum_depth(np.bincount(d[d >= 0], minlength=n_rows), cap)
            for d in dests)

    def chain(dest, forced_levels=None):
        levels, shapes = [], []
        cur = dest
        for li in range(L):
            fwd = li < L - 1
            level, nxt, shape = _build_level(
                cur, n_rows, cap, include_empty_rows=(li == 0),
                forward_all=fwd,
                forced=None if forced_levels is None
                else forced_levels[li])
            levels.append(level)
            shapes.append(shape)
            if fwd:
                assert nxt is not None
                cur = nxt
            else:
                assert nxt is None
        return levels, shapes

    all_shapes = [chain(d)[1] for d in dests]
    forced_levels = []
    cur_len = in_len              # unified input length of each level
    for li in range(L):
        t_of, k_of, rows_max, top_max = {}, {}, 0, 0
        for sh in all_shapes:
            buckets, K_of, in_rows, top = sh[li]
            for S, T_b in buckets:
                t_of[S] = max(t_of.get(S, 0), T_b)
            for S, K in K_of.items():
                k_of[S] = max(k_of.get(S, 0), K)
            rows_max = max(rows_max, in_rows)
            top_max = max(top_max, top)
        fb = sorted(t_of.items())
        # pad-tile windows can start anywhere in the (aligned) stream,
        # whose top may exceed the raw input length; cover both (forced K
        # may also exceed the pass-1 window a real tile used)
        rows_max = max(rows_max,
                       _round_up(max(cur_len, top_max), 128) // 128
                       + max(k_of.values()))
        forced_levels.append((fb, k_of, rows_max))
        cur_len = sum(T_b for _, T_b in fb) * R

    plans = []
    for d in dests:
        levels, _ = chain(d, forced_levels)
        final = np.concatenate([lv.tkeys for lv in levels])
        plans.append(StreamSumPlan(levels=levels, final_keys=final,
                                   num_rows=n_rows))
    # SPMD uniformity: the runtime key sorts must have identical shapes
    # across devices — pad each level's gap-extended keys to the
    # per-level max with sentinels (they sort to the tail, past every
    # kernel window, and the padded values are zeros)
    for li in range(L):
        len_max = max(len(np.asarray(p.levels[li].keys)) for p in plans)
        for p in plans:
            k = np.asarray(p.levels[li].keys)
            if len(k) < len_max:
                p.levels[li].keys = np.concatenate(
                    [k, np.full(len_max - len(k), _I32_SENTINEL,
                                np.int32)])
    for p in plans:             # tkeys are build-time only (see above)
        for lv in p.levels:
            lv.tkeys = np.zeros(0, np.int32)
    return plans


def apply_stream_sum(plan: StreamSumPlan, vh, vl=None, interpret=False):
    """Run the plan: returns per-row sums in natural row order — (hi, lo)
    f32 pair when `vl` is given (double-double), else a single f32 array.

    Each level sorts only the rows still in flight (the previous level's
    multi prefix); completed rows' sums collect in `parts` and ONE final
    key sort puts everything in natural order."""
    dd = vl is not None
    parts_h, parts_l = [], []
    for lv in plan.levels:
        if lv.perm is not None:
            # statically routed: no runtime comparator network at all
            from ellspmv_tpu.ops.permute import apply_permute
            if dd:
                vh, vl = apply_permute(lv.perm, vh, vl,
                                       interpret=interpret)
            else:
                (vh,) = apply_permute(lv.perm, vh, interpret=interpret)
            vh = vh[:lv.in_rows * 128]
            if dd:
                vl = vl[:lv.in_rows * 128]
        else:
            keys = jnp.asarray(lv.keys)
            # keys carry gap-filler positions at [in_len:] (aligned-run
            # interior pad): zero-extend the values so rank == position
            gap = keys.shape[0] - vh.shape[0]
            if gap > 0:
                vh = jnp.pad(vh, (0, gap))
                if dd:
                    vl = jnp.pad(vl, (0, gap))
            if dd:
                _, vh, vl = jax.lax.sort((keys, vh, vl), num_keys=1,
                                         is_stable=False)
            else:
                _, vh = jax.lax.sort((keys, vh), num_keys=1,
                                     is_stable=False)
        pad = lv.in_rows * 128 - vh.shape[0]
        sh = jnp.pad(vh, (0, pad)).reshape(lv.in_rows, 128)
        if dd:
            sl = jnp.pad(vl, (0, pad)).reshape(lv.in_rows, 128)
        outs_h, outs_l = [], []
        for b in lv.buckets:
            es = jnp.asarray(b.estart)
            oc = jnp.asarray(b.oc)
            if dd:
                oh, ol = _runsum_dd(es, oc, sh, sl, S=b.S, K=b.K, T=b.T,
                                    sub=b.sub, interpret=interpret)
                outs_l.append(ol.reshape(-1))
            else:
                oh = _runsum_f32(es, oc, sh, S=b.S, K=b.K, T=b.T,
                                 sub=b.sub, interpret=interpret)
            outs_h.append(oh.reshape(-1))
        oh = jnp.concatenate(outs_h)
        parts_h.append(oh[lv.multi_len:])
        vh = oh[:lv.multi_len]
        if dd:
            ol = jnp.concatenate(outs_l)
            parts_l.append(ol[lv.multi_len:])
            vl = ol[:lv.multi_len]
    n = plan.num_rows
    vh = jnp.concatenate(parts_h)
    import os as _os
    if _os.environ.get("ELLSPMV_TPU_SKIP_FINAL"):
        # measurement ablation (WRONG results: y stays in terminal-output
        # order): drops the final natural-order route so the pipeline
        # delta vs the full run bounds the final-route fusion lever
        # (VERDICT r4 item 4 / BENCH_NOTES round-4 continuity list)
        if dd:
            return vh[:n], jnp.concatenate(parts_l)[:n]
        return vh[:n]
    if dd:
        vl = jnp.concatenate(parts_l)
        if plan.final_perm is not None:
            from ellspmv_tpu.ops.permute import apply_permute
            vh, vl = apply_permute(plan.final_perm, vh, vl,
                                   interpret=interpret)
            return vh[:n], vl[:n]
        fk = jnp.asarray(plan.final_keys)
        _, vh, vl = jax.lax.sort((fk, vh, vl), num_keys=1, is_stable=False)
        return vh[:n], vl[:n]
    if plan.final_perm is not None:
        from ellspmv_tpu.ops.permute import apply_permute
        (vh,) = apply_permute(plan.final_perm, vh, interpret=interpret)
        return vh[:n]
    fk = jnp.asarray(plan.final_keys)
    _, vh = jax.lax.sort((fk, vh), num_keys=1, is_stable=False)
    return vh[:n]
