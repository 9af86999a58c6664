"""Stream format: sort-based SpMV for matrices with no column locality.

Power-law / web matrices (BASELINE configs[3], e.g. webbase-1M) defeat
windowed-gather kernels: their columns are globally random, so per-slot
gather windows span the whole x image. The reference's CPU kernels simply
eat the random loads (csrspmv.c:1590-1592); on TPU a random XLA element
gather runs ~80M elements/s while `lax.sort` moves >700M/s. The
TPU-native answer is to restructure SpMV as dense streaming passes plus
ONE runtime sort:

1. entries are stored sorted by COLUMN (a static layout decision), so the
   existing Pallas windowed kernel computes all products `a_k * x[col_k]`
   with tile-local x windows (consecutive sorted columns span ~one 128
   block) — this is just an `ellspmv_tpu` ELL plan with rowsize 1 over an
   (nnz x 1) matrix;
2. one `lax.sort` by a precomputed destination key delivers the products
   grouped by row tile/slot (`ops/stream_sum.py`);
3. a Pallas segmented-sum kernel reduces them to row sums in
   double-double, and a final n-sized key sort restores natural row
   order.

Semantics are the uniform `y := A*x + y` (SURVEY §7), with optional split
diagonal (ellgemvsd's `y[i] += ad[i]*x[i]`, ellspmv.c:1177).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ellspmv_tpu.formats.coo import CooMatrix
from ellspmv_tpu.formats.ell import EllMatrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamMatrix:
    """Column-sorted product plan + stream-sum plan. A pytree, so it can
    ride through jit as an argument (matrix data never becomes compiled-in
    constants)."""

    prod: object                        # DevicePlan over the (nnz, 1) ELL
    prod_cols: Optional[jax.Array]      # XLA fallback when prod is None
    prod_vals: Optional[jax.Array]
    ddsum: object                       # StreamSumPlan
    diag: Optional[jax.Array]
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_columns: int = dataclasses.field(metadata=dict(static=True))
    num_nonzeros: int = dataclasses.field(metadata=dict(static=True))
    dd: bool = dataclasses.field(metadata=dict(static=True))
    prod_len: int = dataclasses.field(metadata=dict(static=True))

    @property
    def values(self):
        # dtype carrier for the bench harness / CLI reporting
        return np.zeros(0, np.float64 if self.dd else np.float32)

    @property
    def worksize(self) -> int:
        """Stored slots (= nnz: the format is padding-free)."""
        return self.num_nonzeros

    def device_put(self, value_dtype=None) -> "StreamMatrix":
        return jax.tree_util.tree_map(jnp.asarray, self)


def stream_from_coo(coo: CooMatrix, separate_diagonal: bool = False,
                    value_dtype=None, cap: int | None = None
                    ) -> StreamMatrix:
    """Build the stream plan: column-sort the entries, plan the rowsize-1
    product kernel, and build the (possibly multi-level) sum plan."""
    from ellspmv_tpu.ops import ell_pallas
    from ellspmv_tpu.ops import plan as plan_mod
    from ellspmv_tpu.ops.stream_sum import build_stream_sum

    if cap is None:
        # sub-row split length: rows <= cap complete at level 1. Larger
        # caps shrink the multi prefix the deeper levels re-route, at the
        # cost of taller sum windows (VMEM-bounded: ~256 is the ceiling
        # for the dd kernel's double-buffered scratch).
        cap = int(os.environ.get("ELLSPMV_TPU_SUM_CAP", "128"))

    coo = coo.expand_symmetry()
    n, m = coo.num_rows, coo.num_columns
    nnz_total = coo.num_nonzeros

    diag = None
    if separate_diagonal:
        coo, diag = coo.split_diagonal()
    nnz = coo.num_nonzeros

    val_dt = np.dtype(value_dtype) if value_dtype else coo.values.dtype
    dd = val_dt == np.dtype(np.float64)

    import time as _time
    _tlast = [_time.perf_counter()]

    def _tr(stage):
        # stage trace for the in-context conversion budget (VERDICT r4
        # item 3); prints only under ELLSPMV_TPU_CONVERT_TRACE
        if os.environ.get("ELLSPMV_TPU_CONVERT_TRACE"):
            now = _time.perf_counter()
            print(f"  [convert] {stage}: {now - _tlast[0]:.2f}s",
                  flush=True)
            _tlast[0] = now

    if m > np.iinfo(np.int32).max:
        # column ids ride as int32 through the product plan (the window
        # quantization makes the KERNEL index width free — config.py —
        # but the host-side plan arrays are int32); the IDXTYPEWIDTH=64
        # analogue for streams would need an int64 plan build
        raise ValueError("stream format: column count exceeds int32")
    from ellspmv_tpu.io import native as _native
    order = _native.argsort(coo.colidx)
    cols = coo.colidx[order].astype(np.int32, copy=False)
    vals = coo.values[order].astype(val_dt, copy=False)
    rows = coo.rowidx[order]          # int widening happens on assignment

    # unified padded product length — a multiple of the permute BLOCK so
    # the product plan, the static router and the sum level agree
    from ellspmv_tpu.ops.permute import (BLOCK, build_permute,
                                         build_permute_cells, cells_bpg)
    from ellspmv_tpu.ops.stream_sum import _I32_SENTINEL
    prod_len = max(_round_up(nnz, BLOCK), BLOCK)
    dest = np.full(prod_len, -1, np.int64)
    dest[:nnz] = rows

    # COLUMN CHUNKING (wide-column scale): the product kernel's per-tile
    # window span is set by mega-group column density — span_tile ~
    # group_span / (128 * E_group) * 1024 — and with one global dest
    # space the group span is the whole column image, so ks grows
    # linearly with ncols (measured 6.4 -> 35.9 at 1M -> 10M columns,
    # BENCH_NOTES round 4; the reference's CPU gathers are scale-flat,
    # csrspmv.c:1590-1592). Splitting the columns into chunks with
    # PER-CHUNK partial-sum dest spaces shrinks the group span with the
    # chunk while mega groups stay full (~128*BLOCK entries targeting the
    # chunk's own stream region), so ks returns to its 1M-column floor at
    # any scale; the standard deeper sum levels merge the partials.
    # default span 196608 columns: narrow chunks keep the per-group
    # column density at the ks ~6 floor for the 16-block cells groups
    # (ks ~ span_chunk/32768) AND shrink the product windows (KS<=8,
    # K128 4x smaller — hardware measured narrow chunking FASTER even at
    # 1M columns: 2.948 vs 3.108 ms, r5_hw_log)
    span_max = int(os.environ.get("ELLSPMV_TPU_STREAM_SPAN", "196608"))
    n_chunks = max(1, -(-m // span_max))
    # chunks sparser than ~two cells groups lose per-group density
    # (density <= nnz/ncols regardless of chunking — the un-chunkable
    # sparse-wide floor)
    n_chunks = min(n_chunks, max(1, -(-nnz // (32 * BLOCK))))
    forced_chunks = os.environ.get("ELLSPMV_TPU_STREAM_CHUNKS")
    if forced_chunks:            # tests / hardware sweeps
        n_chunks = max(1, min(int(forced_chunks), max(m, 1)))
    _tr("column sort")
    # uniform-cell router gate: below this nnz the route's mid array
    # sits within VMEM reach and the take stage runs at multi-TB/s, so
    # the cells layout's full-group padding is pure overhead; above it
    # the take cliffs to a flat 84 GB/s (8x sublane read amplification,
    # microbench_take.py) and the cells route wins big
    cells_min = int(os.environ.get("ELLSPMV_TPU_CELLS_MIN", "16000000"))
    use_cells = n_chunks > 1 and nnz >= cells_min and not \
        os.environ.get("ELLSPMV_TPU_NO_CELLS")
    if n_chunks > 1:
        from ellspmv_tpu.ops.permute import cells_bpg as _cbpg
        width = -(-m // n_chunks)
        edges = np.arange(1, n_chunks, dtype=np.int64) * width
        cs = np.searchsorted(cols, edges).astype(np.int64)
        chunk_starts = np.concatenate([[0], cs, [prod_len]])
        ddsum = build_stream_sum(
            dest, n_rows=n, cap=cap, chunk_starts=chunk_starts,
            region_align=BLOCK * _cbpg() if use_cells else 0)
    else:
        chunk_starts = None
        ddsum = build_stream_sum(dest, n_rows=n, cap=cap)
    _tr("sum plan build")

    # start device transfers for the finalized plan pieces NOW:
    # jnp.asarray dispatch is async, so the deeper levels and the final
    # reorder stream to the device WHILE the host builds the level-1
    # router below (staging serialized after the whole build cost seconds
    # of the in-context conversion budget, VERDICT r4 item 3). Through
    # the axon tunnel even the DISPATCH costs ~30 ms per buffer (a
    # synchronous per-transfer round trip — measured 1.4 s for the deep
    # levels alone), so by default the dispatch itself runs on a worker
    # thread: the plan-build stages below are numpy/ctypes (GIL
    # released) and overlap it. ELLSPMV_TPU_SYNC_STAGING=1 restores the
    # inline dispatch.
    _put = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    _stager = None
    _deep_fut = _l1_fut = None
    if not os.environ.get("ELLSPMV_TPU_SYNC_STAGING"):
        import concurrent.futures as _cf
        _stager = _cf.ThreadPoolExecutor(1)
    if _stager is None:
        ddsum.levels[1:] = [_put(lv) for lv in ddsum.levels[1:]]
        ddsum.final_keys = jnp.asarray(ddsum.final_keys)
        if ddsum.final_perm is not None:
            ddsum.final_perm = _put(ddsum.final_perm)
    else:
        _deep_fut = _stager.submit(
            lambda lvls=list(ddsum.levels[1:]), fk=ddsum.final_keys,
            fp=ddsum.final_perm: ([_put(lv) for lv in lvls],
                                  jnp.asarray(fk),
                                  None if fp is None else _put(fp)))
    _tr("deep-level staging dispatch")

    # replace the level-1 runtime key sort with a statically planned
    # routing (ops/permute.py): every entry's sorted position (= rank of
    # its key) is known at build time. Entries are re-ordered by
    # (destination megablock, column) — a pure reorder, no padding — to
    # bound the router's half-block budget while keeping the product
    # kernel's per-128-entry column locality.
    lvl1 = ddsum.levels[0]
    if nnz and not os.environ.get("ELLSPMV_TPU_NO_PERMUTE"):
        keys_full = np.asarray(lvl1.keys)
        # keys ARE the aligned stream positions (stream_sum aligned runs);
        # [prod_len:] holds the gap-filler positions for the sort path
        keys = keys_full[:prod_len]
        target = np.where(keys == _I32_SENTINEL, np.int64(-1),
                          keys.astype(np.int64))

        def _reorder(mega, full_cap=None, ngr=None):
            """Reorder entries by (mega, col) and pad each group — to a
            BLOCK multiple (general route), or to a FULL `full_cap`
            slots enumerating all `ngr` groups (uniform-cell route:
            group k's input slots [k*cap, (k+1)*cap) must align with
            its dest blocks). One radix pass on the compact combined
            key; pad slots inherit the nearest preceding real column so
            windows stay tight (value 0 makes them inert)."""
            pre = _native.argsort(mega.astype(np.uint64) * np.uint64(m)
                                  + cols.astype(np.uint64))
            mega_s = mega[pre]
            if full_cap is None:
                starts = np.concatenate(
                    [[0], np.flatnonzero(mega_s[1:] != mega_s[:-1]) + 1,
                     [nnz]])
                sizes = np.diff(starts)
                padded = np.maximum(-(-sizes // BLOCK) * BLOCK, BLOCK)
                offs = np.concatenate([[0], np.cumsum(padded)])[:-1]
                grp_of = np.repeat(np.arange(len(sizes)), sizes)
                within = np.arange(nnz) - starts[:-1][grp_of]
                pos2 = offs[grp_of] + within
                prod_len2 = int(padded.sum())
            else:
                # Uniform-cell QUOTA deal: the stable (mega, col) sort
                # alone concentrates (input block, dest block) cells
                # far past the 2x-margin capacity (measured max 13,011
                # vs cap 2,048 at power-law 21M nnz: hub-column tie
                # runs land consecutively, and multi-prefix dest blocks
                # hold high-count sub-rows whose zipf-spread columns
                # pile onto the chunk's dense head — the latter is
                # scramble-proof).  Correct by construction instead:
                # entry j (column order) of each (group, dest block)
                # bucket is assigned quota block j*bpg//cnt_d, so every
                # cell holds <= ceil(cnt_d/bpg) <= BLOCK/bpg entries —
                # half the cell capacity — at ANY scale or structure.
                # The sort by (group, quota block) is stable, so ties
                # keep (mega, col) order: each input block's entries
                # stay column-sorted and the product windows keep their
                # locality (a per-bucket quantile deal without the
                # block-granular re-sort measured ks_mean 6 -> 305; the
                # quota deal keeps the mix at block granularity where
                # tiles re-sort to column-contiguous slices).
                bpg_r = full_cap // BLOCK
                tpre = target[:nnz][pre]
                d_loc = np.where(tpre >= 0, (tpre // BLOCK) % bpg_r,
                                 np.int64(bpg_r))
                nb_buckets = bpg_r + 1
                bucket = mega_s * np.int64(nb_buckets) + d_loc
                ob = _native.argsort(bucket.astype(np.uint64))
                within_d = np.empty(nnz, np.int64)
                starts_b = np.concatenate(
                    [[0], np.cumsum(np.bincount(
                        bucket, minlength=int(ngr) * nb_buckets))]
                ).astype(np.int64)
                within_d[ob] = np.arange(nnz) - starts_b[bucket[ob]]
                # progress-anchored quota: each entry follows the
                # GROUP's global column progress gp (so input blocks
                # stay column-aligned across dest buckets — a pure
                # per-bucket rank quota measured ks_mean 2.5 -> 8.4
                # from inter-bucket quantile jitter), floored by its
                # bucket's running quota b = floor(j/c + max_{i<=j}
                # (gp_i - i/c)) with c = BLOCK/bpg: consecutive j
                # mapping to one block span <= c+1 entries, a HARD
                # <= (c+1)-per-cell bound (half the 2c cell capacity)
                # at any scale or structure.
                sizes0 = np.bincount(mega_s, minlength=ngr)
                g_start = np.concatenate(
                    [[0], np.cumsum(sizes0)]).astype(np.int64)
                pos_g = np.arange(nnz) - g_start[mega_s]
                gp = pos_g * bpg_r // np.maximum(sizes0[mega_s], 1)
                c_quota = BLOCK // bpg_r
                v = gp.astype(np.float64) - within_d / float(c_quota)
                vo = v[ob]
                bs = bucket[ob]
                seg = np.flatnonzero(np.concatenate(
                    [[True], bs[1:] != bs[:-1]]))
                seg = np.append(seg, len(bs))
                mo = np.empty_like(vo)
                for si in range(len(seg) - 1):
                    s0, s1 = seg[si], seg[si + 1]
                    np.maximum.accumulate(vo[s0:s1], out=mo[s0:s1])
                mprefix = np.empty_like(v)
                mprefix[ob] = mo
                qb = np.clip((within_d / float(c_quota)
                              + mprefix).astype(
                    np.int64), 0, bpg_r - 1).astype(np.uint64)
                deal = _native.argsort(
                    (mega_s.astype(np.uint64) << np.uint64(8)) | qb)
                pre = pre[deal]
                mega_s = mega_s[deal]
                sizes = np.bincount(mega_s, minlength=ngr)
                assert int(sizes.max(initial=0)) <= full_cap
                starts_g = np.concatenate([[0], np.cumsum(sizes)])
                rank = np.arange(nnz) - starts_g[mega_s]
                # spread real entries over the WHOLE group capacity
                # (strictly increasing since full_cap >= group size), so
                # a near-empty group cannot compress one dest block's
                # entries into its first input blocks
                pos2 = (mega_s * np.int64(full_cap)
                        + rank * np.int64(full_cap)
                        // np.maximum(sizes[mega_s], 1))
                prod_len2 = int(ngr) * full_cap
            cols2 = np.zeros(prod_len2, np.int32)
            vals2 = np.zeros(prod_len2, val_dt)
            cols2[pos2] = cols[pre]
            vals2[pos2] = vals[pre]
            filled = np.zeros(prod_len2, bool)
            filled[pos2] = True
            last = np.maximum.accumulate(
                np.where(filled, np.arange(prod_len2), -1))
            first_col = cols[pre][0] if nnz else np.int32(0)
            cols2 = np.where(last >= 0, cols2[np.maximum(last, 0)],
                             first_col).astype(np.int32)
            target2 = np.full(prod_len2, -1, np.int64)
            target2[pos2] = target[:nnz][pre]
            return cols2, vals2, target2, prod_len2

        def _commit(perm, cols2, vals2, prod_len2):
            nonlocal cols, vals, prod_len
            lvl1.perm = perm
            cols, vals = cols2, vals2
            prod_len = prod_len2
            # the router owns the reorder; the sort keys are dead weight
            # (28 MB of device transfer at config3 scale)
            lvl1.keys = np.zeros(0, np.int32)
            lvl1.in_len = prod_len2
            # size the kernel's stream view to the router's padded output
            # so the apply-side slice/pad copies disappear
            lvl1.in_rows = max(lvl1.in_rows, lvl1.perm.n_out // 128)

        done = False
        if use_cells:
            # UNIFORM-CELL route first (ops/permute.py cells mode):
            # fixed-width groups of `bpg` dest blocks with full-capacity
            # input padding, so group k's input blocks align with its
            # dest blocks and W1 writes the mid dest-major directly —
            # no take stage (the HBM row gather measured a flat 84 GB/s
            # past VMEM size, microbench_take.py)
            bases = ddsum.chunk_bases
            bpgc = cells_bpg()
            mega = np.empty(nnz, np.int64)
            gbase = 0
            for c in range(n_chunks):
                s = int(chunk_starts[c])
                e = min(int(chunk_starts[c + 1]), nnz)
                nbo_c = (bases[c + 1] - bases[c]) // BLOCK
                if e > s:
                    mega[s:e] = (gbase + ((target[s:e] - bases[c])
                                          // BLOCK) // bpgc)
                gbase += nbo_c // bpgc
            cols2, vals2, target2, prod_len2 = _reorder(
                mega, full_cap=bpgc * BLOCK, ngr=gbase)
            _tr("cells reorder + full-group pad")
            try:
                perm = build_permute_cells(target2, bpgc)
            except ValueError as e:
                # overflow/budget: general route below (not silent —
                # the reason matters when diagnosing a take-stage
                # regression at scale, r5_hw_log 78 ms vs cells)
                if os.environ.get("ELLSPMV_TPU_CONVERT_TRACE"):
                    print(f"  [convert] cells route fallback: {e}",
                          flush=True)
            else:
                _commit(perm, cols2, vals2, prod_len2)
                done = True
            _tr("level-1 cells router build")
        if not done:
            # megablock = up to 128 destination blocks (the router's W1
            # half-block budget); smaller override for test coverage.
            # BALANCED partition of the dest-block space: a fixed-size
            # cut leaves a tiny tail group whose few entries span every
            # column, and that one group's product tiles sink the whole
            # windowed plan to the resident-x scan (measured: ks_mean
            # 9.4 static vs 6 moving).
            mega_elems = int(os.environ.get("ELLSPMV_TPU_STREAM_MEGA",
                                            BLOCK * 128))
            blocks_per_group = max(mega_elems // BLOCK, 1)
            if chunk_starts is not None:
                # per-chunk balanced mega partition over the chunk's OWN
                # stream region (group ids globally unique so the
                # group-pad pass never merges groups across chunks)
                bases = ddsum.chunk_bases
                mega = np.empty(nnz, np.int64)
                gbase = 0
                for c in range(n_chunks):
                    s = int(chunk_starts[c])
                    e = min(int(chunk_starts[c + 1]), nnz)
                    nbo_c = max((bases[c + 1] - bases[c]) // BLOCK, 1)
                    ng = max(-(-nbo_c // blocks_per_group), 1)
                    bpg_c = -(-nbo_c // ng)
                    if e > s:
                        mega[s:e] = (gbase + ((target[s:e] - bases[c])
                                              // BLOCK) // bpg_c)
                    gbase += ng
            else:
                nbo = max(-(-(lvl1.in_rows * 128) // BLOCK), 1)
                n_groups = max(-(-nbo // blocks_per_group), 1)
                bpg = -(-nbo // n_groups)
                mega = (target[:nnz] // BLOCK) // bpg
            cols2, vals2, target2, prod_len2 = _reorder(mega)
            _tr("mega reorder + group pad")
            try:
                perm = build_permute(target2, n_out=lvl1.in_rows * 128,
                                     validate=False)
            except ValueError:
                pass     # router budget exceeded: keep the sort path
            else:
                _commit(perm, cols2, vals2, prod_len2)
            _tr("level-1 router build")
    if _stager is None:
        ddsum.levels[0] = jax.tree_util.tree_map(jnp.asarray,
                                                 ddsum.levels[0])
        ddsum = ddsum.device_put()  # no-op on already-staged leaves
    else:
        # level 1 is finalized by the router commit above; ship it from
        # the worker while the product plan builds below
        _l1_fut = _stager.submit(lambda lv=ddsum.levels[0]: _put(lv))
    _tr("level-1 staging dispatch")

    # rowsize-1 ELL over the (possibly re-ordered, group-padded) entries:
    # the product kernel
    k = len(cols)
    pad_col = np.int32(cols[-1]) if k else np.int32(0)
    pcol = np.full((prod_len, 1), pad_col, np.int32)
    pval = np.zeros((prod_len, 1), val_dt)
    if k:
        pcol[:k, 0] = cols
        pval[:k, 0] = vals
    prod_ell = EllMatrix(colidx=pcol, values=pval, diag=None,
                        num_rows=prod_len, num_columns=m,
                        num_nonzeros=nnz)
    prod_rt = os.environ.get("ELLSPMV_TPU_PROD_RT", "")
    plan = plan_mod.best_plan(
        prod_ell, value_dtype=np.float64 if dd else np.float32,
        **({"row_tiles": (int(prod_rt),)} if prod_rt else {}))
    _tr("product plan build")
    if _stager is not None:
        lvls, fk, fp = _deep_fut.result()
        ddsum.levels[1:] = lvls
        ddsum.final_keys = fk
        if fp is not None:
            ddsum.final_perm = fp
        ddsum.levels[0] = _l1_fut.result()
        ddsum = ddsum.device_put()  # no-op on already-staged leaves
        _stager.shutdown()
        _tr("staging resolve")
    if plan is not None:
        dp = ell_pallas.DevicePlan(prod_ell, plan, dd)
        assert plan.n_pad == prod_len
        prod_cols = prod_vals = None
        _tr("product staging dispatch")
    else:
        dp = None
        prod_cols = jnp.asarray(np.pad(cols, (0, prod_len - k)))
        pv = np.zeros(prod_len, val_dt)
        pv[:k] = vals
        prod_vals = jnp.asarray(pv)

    if diag is not None:
        d = np.zeros(n, val_dt)
        d[:len(diag)] = diag.astype(val_dt)
        diag = jnp.asarray(d)

    if os.environ.get("ELLSPMV_TPU_CONVERT_TRACE"):
        # trace-only transfer fence. NOT the 1-element-fetch pattern: a
        # per-leaf `reshape[:1]` fetch compiles a tiny remote program per
        # distinct leaf shape, and ~100 leaves through the degraded
        # remote compile service measured 194 s of pure compile wall
        # (r5_hw_log config3-convert-trace) — block_until_ready's
        # early-return caveat applies to kernel execution, not H2D
        # transfer completion, so it is the right fence here
        for leaf in jax.tree_util.tree_leaves((ddsum, dp)):
            if isinstance(leaf, jax.Array):
                leaf.block_until_ready()
        _tr("staging transfer fence (trace only)")

    return StreamMatrix(prod=dp, prod_cols=prod_cols, prod_vals=prod_vals,
                        ddsum=ddsum, diag=diag,
                        num_rows=n, num_columns=m,
                        num_nonzeros=nnz_total, dd=dd, prod_len=prod_len)


def stream_spmv(sm: StreamMatrix, x, y=None):
    """y := A*x + y via products -> sort -> segmented sums."""
    from ellspmv_tpu.ops.stream_sum import apply_stream_sum

    interpret = jax.devices()[0].platform != "tpu"
    x = jnp.asarray(x)
    n = sm.num_rows
    if sm.dd:
        x = x.astype(jnp.float64)
        if sm.prod is not None:
            xh = x.astype(jnp.float32)
            xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
            ph, plo = sm.prod.apply_pair(xh, xl)
        else:
            p = sm.prod_vals * x[sm.prod_cols]
            ph = p.astype(jnp.float32)
            plo = (p - ph.astype(jnp.float64)).astype(jnp.float32)
        yh, yl = apply_stream_sum(sm.ddsum, ph, plo, interpret=interpret)
        out = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    else:
        x = x.astype(jnp.float32)
        if sm.prod is not None:
            p = sm.prod(x)
        else:
            p = sm.prod_vals * x[sm.prod_cols]
        out = apply_stream_sum(sm.ddsum, p, interpret=interpret)
    if sm.diag is not None:
        xi = jnp.minimum(jnp.arange(n), max(sm.num_columns - 1, 0))
        out = out + sm.diag * x.astype(out.dtype)[xi]
    if y is not None:
        out = out + jnp.asarray(y).astype(out.dtype)
    return out
