"""Pallas ELLPACK SpMV kernel — the performance path (ellgemv analogue,
ellspmv.c:1129-1153, redesigned for the TPU memory system).

Per grid step (one tile of R = G*128 rows):

1. the tile's x window (K128 x 128 f32) is DMA'd HBM→VMEM, double-buffered:
   tile i+1's window transfer is issued before tile i's compute so the DMA
   hides behind the gather/FMA work (window starts come from the
   scalar-prefetched `wbase128`). x living in VMEM while a/colidx stream
   past is the TPU realization of the reference's A64FX sector-cache
   isolation of x (ellspmv.c:1737-1743);
2. for each ELL slot s: gather x values with KS lane-local dynamic-gather
   steps from the slot's sub-window row (`qb[t,s]`), select by the high
   bits of the local column, FMA into the (G, 128) accumulator — the VPU
   equivalent of the reference's `yi += a[i*rowsize+l] * x[colidx[...]]`
   inner loop (ellspmv.c:1148);
3. write the accumulator as the y tile (row-major (n/128, 128) layout).

fp64 runs as double-double (hi/lo f32 pairs): TPU has no native f64 — XLA
itself emulates f64 this way — and Mosaic exposes only f32, so the kernel
carries (hi, lo) operands and does compensated multiply-accumulate inline,
matching XLA-on-TPU f64 fidelity (~1e-14 worst-case relative error).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ellspmv_tpu.ops import plan as plan_mod

_PLAN_ATTR = "_pallas_plan_cache"
import ml_dtypes
_BF16 = np.dtype(ml_dtypes.bfloat16)

# Slot loops are unrolled (straight-line code Mosaic can pipeline) when the
# slot count — or the total unrolled scan work S*KS — is small; wider slot
# spaces use a dynamic fori_loop so compiled kernel size stays O(1) in the
# slot count (split rows / widened column buckets).
_SLOT_UNROLL_MAX = int(os.environ.get("ELLSPMV_TPU_SLOT_UNROLL", "16"))
_SLOT_WORK_UNROLL = int(os.environ.get("ELLSPMV_TPU_SLOT_WORK", "160"))


def _slots_unrolled(S: int, KS: int) -> bool:
    return S <= _SLOT_UNROLL_MAX or S * max(KS, 1) <= _SLOT_WORK_UNROLL

# Profiling ablations (benchmarks/profile_kernel.py): produce WRONG results
# but isolate where kernel time goes. "nogather" skips the dynamic lane
# gather (uses the window row directly); "noscan" does a single scan step
# per slot; "nofma" (dd) replaces the compensated FMA with a plain f32 one.
_ABLATE = os.environ.get("ELLSPMV_TPU_ABLATE", "")
# Scan-step combiner in the unrolled path: the select cascade (default)
# costs (trip-1) cmps + 2(trip-1) selects; =1 restores the masked
# balanced-tree sum for A/B measurement.
_SELECT_TREE = os.environ.get("ELLSPMV_TPU_SELECT_TREE", "0") != "0"
# Unroll the supertile's subtile loop statically (sub*S slot bodies of
# straight-line code) instead of a dynamic fori over shared bodies.
_SUB_STATIC = os.environ.get("ELLSPMV_TPU_SUB_STATIC", "0") != "0"
# Chunked dynamic-scan width: window rows loaded per dynamic slice (U
# static select steps follow). The scratch slack below grows with it.
_CHUNK_U = max(8, min(32, int(os.environ.get("ELLSPMV_TPU_CHUNK", "8"))))


def _i0():
    """int32 zero for BlockSpec index maps: with jax_enable_x64, a bare
    Python 0 traces as i64 and Mosaic fails to legalize the index-map
    function's return."""
    return jnp.int32(0)


def _lane_gather(op, lane):
    """out[g, j] = op[g, lane[g, j]] with int32 indices.

    Equivalent to `jnp.take_along_axis(op, lane, axis=1)` but emitted
    directly as lax.gather so jax_enable_x64 cannot promote the indices to
    int64 (Mosaic has no 64-bit types). Lowers to the TPU dynamic lane
    gather (lane dim must be 128)."""
    g = lane[..., None]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        op, g, dnums, slice_sizes=(1, 1), indices_are_sorted=False,
        unique_indices=False, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    """Dekker split of f32 into 12+12-bit halves (no fused FMA assumed)."""
    c = a * np.float32(4097.0)        # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _two_prod_fma(a, b):
    """two_prod when the compiler contracts a*b-p into a fused
    multiply-add (single rounding): the residual IS the exact error.
    Only used after `fma_contraction_available()` verified exactness
    on this backend."""
    p = a * b
    return p, a * b - p


def _dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + xl + yl
    hi = s + e
    return hi, e - (hi - s)


def _dd_fma(acc_h, acc_l, a_h, a_l, x_h, x_l, fast=False):
    """(acc) += (a) * (x) in double-double with per-step renormalization.

    (A Kahan-style deferred renormalization was measured on v5e: no speed
    gain and worst-case error grew from 1.1e-14 to 2.6e-14 — the per-step
    renorm stays.)"""
    ph, pl_ = (_two_prod_fma if fast else _two_prod)(a_h, x_h)
    pl_ = pl_ + a_h * x_l + a_l * x_h
    return _dd_add(acc_h, acc_l, ph, pl_)


_FMA_PROBE = {"result": None}


def fma_contraction_available() -> bool:
    """Probe whether this backend contracts `a*b - p` to a fused FMA with
    single rounding inside Pallas kernels, by comparing the residual
    against the exact two_prod error for random f32 pairs. Cached."""
    if _FMA_PROBE["result"] is not None:
        return _FMA_PROBE["result"]
    if jax.devices()[0].platform != "tpu":
        _FMA_PROBE["result"] = False
        return False
    try:
        rng = np.random.RandomState(0)
        a = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)
        b = rng.uniform(0.5, 2.0, (8, 128)).astype(np.float32)

        def k(a_ref, b_ref, o_ref):
            p = a_ref[:] * b_ref[:]
            o_ref[:] = a_ref[:] * b_ref[:] - p

        got = np.asarray(pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
                jnp.asarray(a), jnp.asarray(b)))
        exact = (a.astype(np.float64) * b.astype(np.float64)
                 - (a * b).astype(np.float64)).astype(np.float32)
        ok = bool(np.array_equal(got, exact) and np.any(exact != 0))
    except Exception:
        ok = False
    _FMA_PROBE["result"] = ok
    return ok


def _make_kernel(S: int, G: int, KS: int, K128: int, T: int, dd: bool,
                 slope: int = 0, unroll: bool = False,
                 fastdd: bool = False, static: bool = False,
                 ks_slot: tuple | None = None, nacc: int = 1,
                 sub: int = 1):
    """Kernel body. Tensor operands are 4D (1, S*sub, G, 128) per-tile
    blocks so slot selection indexes a leading (untiled) dim; the x window
    is double-buffered through a (2, K128, W) scratch — or, for static
    (resident-x) plans, the whole padded x image is DMA'd once into a
    single (K128, W) scratch at grid step 0 and reused by every tile.

    `sub` > 1 processes SUB consecutive G*128-row subtiles per grid step
    (one shared window DMA, one grid-step's bookkeeping): per-grid-step
    overhead measured ~230 ns on v5e dominates small-tile kernels, while
    gathers on operands taller than ~16 sublanes cost ~4.5x per element —
    supertiling keeps the (G,128) gather granularity AND the big-tile
    amortization. Subtile j's slot s lives at operand row j*S + s; its
    window base qb is pre-shifted to the supertile's window."""

    def kernel(wb_ref, qb_ref, lcol_ref, *rest):
        if dd:
            (vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref,
             xw, xwl, sem, seml) = rest
        else:
            v_ref, x_ref, y_ref, xw, sem = rest
        i = pl.program_id(0)
        if static:
            slot = nxt = jnp.int32(0)
        else:
            slot = jax.lax.rem(i, jnp.int32(2))
            nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        sbase = slot * jnp.int32(K128)

        # chunked per-tile window DMA: a 2-row wbase128 carries per-tile
        # 8-row chunk counts in row 1 (DevicePlan). The monolithic K128
        # copy priced the window at the plan-global MAX span for every
        # tile — 5.33 GB/iter vs 0.24 ideal at power-law 21M (ks_mean
        # 8.4 but K128=248 from p99.9 outlier tiles); at 10x scale the
        # static window was ~23 GB/iter, the dominant stream cost.
        # Chunked reads are a strict subset of the old K128 reads, so
        # the x-image bounds the plan already guarantees still hold.
        chunked_w = len(wb_ref.shape) == 2

        def _wb(tile):
            return wb_ref[0, tile] if chunked_w else wb_ref[tile]

        def dmas(buf, tile):
            # each scratch is (2*K128, 128): buffer b = rows [b*K128, ...)
            dst = pl.ds(buf * jnp.int32(K128), K128)
            src = pl.ds(_wb(tile), K128)
            if dd:
                return (pltpu.make_async_copy(xh_ref.at[src], xw.at[dst],
                                              sem.at[buf]),
                        pltpu.make_async_copy(xl_ref.at[src], xwl.at[dst],
                                              seml.at[buf]))
            return (pltpu.make_async_copy(x_ref.at[src], xw.at[dst],
                                          sem.at[buf]),)

        def _chunk_copies(buf, tile, off):
            src = pl.ds(_wb(tile) + off, 8)
            dst = pl.ds(buf * jnp.int32(K128) + off, 8)
            if dd:
                return (pltpu.make_async_copy(xh_ref.at[src], xw.at[dst],
                                              sem.at[buf]),
                        pltpu.make_async_copy(xl_ref.at[src], xwl.at[dst],
                                              seml.at[buf]))
            return (pltpu.make_async_copy(x_ref.at[src], xw.at[dst],
                                          sem.at[buf]),)

        def dma_start(buf, tile):
            if not chunked_w:
                for c in dmas(buf, tile):
                    c.start()
                return

            def body(c, carry):
                for cp in _chunk_copies(buf, tile, c * jnp.int32(8)):
                    cp.start()
                return carry
            jax.lax.fori_loop(jnp.int32(0), wb_ref[1, tile], body,
                              jnp.int32(0))

        def dma_wait(buf, tile):
            if not chunked_w:
                for c in dmas(buf, tile):
                    c.wait()
                return

            def body(c, carry):
                for cp in _chunk_copies(buf, tile, c * jnp.int32(8)):
                    cp.wait()
                return carry
            jax.lax.fori_loop(jnp.int32(0), wb_ref[1, tile], body,
                              jnp.int32(0))

        if static:
            # one DMA of the whole image at step 0; later tiles reuse it
            # (grid steps run sequentially on the core, so the step-0 wait
            # fences every later read)
            @pl.when(i == 0)
            def _():
                for c in dmas(jnp.int32(0), jnp.int32(0)):
                    c.start()
                for c in dmas(jnp.int32(0), jnp.int32(0)):
                    c.wait()
        else:
            @pl.when(i == 0)
            def _():
                dma_start(slot, i)

            @pl.when(i + 1 < T)
            def _():
                dma_start(nxt, i + jnp.int32(1))

            dma_wait(slot, i)

        gather = ((lambda opnd, lane: opnd) if _ABLATE == "nogather"
                  else _lane_gather)

        def slot_step(s, s_stat, acc, acc_l):
            # `s` indexes the operand refs (j*S + s_stat under supertiling,
            # possibly traced); `s_stat` is the static per-subtile slot for
            # ks_slot lookups, or None in the dynamic-slot loop.
            idx = lcol_ref[0, s]
            if idx.ndim == 3:         # dynamic s: (1, G, 128) slice
                idx = idx[0]
            if idx.dtype == jnp.int8:
                # int8 storage biased by -128 (KS*128 <= 256), i32 compute
                idx = idx.astype(jnp.int32) + jnp.int32(128)
            elif idx.dtype != jnp.int32:
                idx = idx.astype(jnp.int32)   # int16 storage, i32 compute
            q = jax.lax.shift_right_logical(idx, jnp.int32(7))
            lane = jax.lax.bitwise_and(idx, jnp.int32(127))
            qb = qb_ref[0, 0, s]
            ks = qb_ref[0, 1, s]      # per-(tile, slot) gather step count
            if _ABLATE in ("staticqb", "staticbase"):
                # time the addressing: static per-slot window offsets
                # (wrong results; isolates the dynamic-slice cost)
                qb = jnp.int32(0)
            sbase_l = (jnp.int32(0) if _ABLATE == "staticbase" else sbase)

            # slope-1: the operand is a (G,128) diagonal slice of the
            # window — sublane g reads window row qb+k+g, matching the
            # per-group rebased local columns. slope-0: one window row
            # broadcast to all groups. The loop trip count is the SLOT's
            # span, not the global max (lax.fori_loop, dynamic bound).
            def op(buf, k):
                if slope:
                    return buf[pl.ds(sbase_l + qb + k, G), :]
                return jnp.broadcast_to(
                    buf[pl.ds(sbase_l + qb + k, 1), :], (G, 128))

            # chunked scan (dynamic loops): load one window block per
            # iteration — (U,128) for slope-0, (U+G-1,128) for slope-1 —
            # then U static select steps; a static sub-slice costs ~4
            # cycles where a per-step dynamic slice measured ~31 (stream
            # products ablation 2026-08-19). The chunk may read up to
            # U-1 rows past the slot's span (+G-1 for the slope-1
            # diagonal): those steps' k never matches any q (q < ks), and
            # the scratch carries 8 slack rows so the read itself stays
            # in bounds (max overreach = qb+ks+G-1 + U-1 <= K128 + 7).
            # Slope-1 chunking is gated to G <= 8: bigger G would hold a
            # register-busting (U+G-1, 128) value per chunk.
            U = _CHUNK_U
            chunked = (not unroll) and (slope == 0 or G <= 8)
            if _ABLATE == "noscan":
                KS_eff, ks_eff = 1, jnp.int32(1)
            else:
                KS_eff, ks_eff = KS, ks

            if dd:
                def body(k, carry):
                    h, lo = carry
                    hit = q == k
                    h = jnp.where(hit, gather(op(xw, k), lane), h)
                    lo = jnp.where(hit, gather(op(xwl, k), lane), lo)
                    return h, lo

                def chunk(c, carry):
                    h, lo = carry
                    base = sbase_l + qb + c * jnp.int32(U)
                    L2 = U + (G - 1 if slope else 0)
                    wh = xw[pl.ds(base, L2), :]
                    wl = xwl[pl.ds(base, L2), :]
                    for j in range(U):
                        k = c * jnp.int32(U) + jnp.int32(j)
                        hit = q == k
                        if slope:
                            rh, rl = wh[j:j + G], wl[j:j + G]
                        else:
                            rh = jnp.broadcast_to(wh[j:j + 1], (G, 128))
                            rl = jnp.broadcast_to(wl[j:j + 1], (G, 128))
                        h = jnp.where(hit, gather(rh, lane), h)
                        lo = jnp.where(hit, gather(rl, lane), lo)
                    return h, lo

                init = (jnp.zeros((G, 128), jnp.float32),
                        jnp.zeros((G, 128), jnp.float32))
                if unroll:
                    # static unroll to the SLOT's own span (ks_slot, from
                    # the plan) — narrow slots stop early instead of
                    # running the global KS
                    trip = KS_eff
                    if (ks_slot is not None and s_stat is not None
                            and _ABLATE != "noscan"):
                        trip = ks_slot[s_stat]
                    if trip == 1:
                        # span-1 slot: every real entry's q is 0 and
                        # padding multiplies v=0, so the hit mask is the
                        # identity — skip the compare+selects entirely
                        xg_h = gather(op(xw, jnp.int32(0)), lane)
                        xg_l = gather(op(xwl, jnp.int32(0)), lane)
                    else:
                        L = -(-(trip + G - 1) // 8) * 8
                        if slope and L <= 16:
                            # hoist ONE dynamic window slice per slot
                            # (rounded to the 8-sublane rule; the scratch
                            # carries 8 slack rows) — steps then take
                            # static sub-slices instead of paying a
                            # dynamic slice each. Gated to tiny slices:
                            # a big G would hoist a register-busting
                            # (G+trip, 128) value.
                            Wh = xw[pl.ds(sbase_l + qb, L), :]
                            Wl = xwl[pl.ds(sbase_l + qb, L), :]
                            oph = lambda k: Wh[k:k + G]
                            opl = lambda k: Wl[k:k + G]
                        else:
                            oph = lambda k: op(xw, jnp.int32(k))
                            opl = lambda k: op(xwl, jnp.int32(k))
                        gh = [gather(oph(k), lane) for k in range(trip)]
                        gl = [gather(opl(k), lane) for k in range(trip)]
                        if _SELECT_TREE:
                            # masked steps summed in a balanced tree
                            # (hits are unique per element)
                            parts = []
                            for k in range(trip):
                                hit = q == jnp.int32(k)
                                parts.append((
                                    jnp.where(hit, gh[k], jnp.float32(0)),
                                    jnp.where(hit, gl[k], jnp.float32(0))))
                            while len(parts) > 1:
                                nxt_ = [(a[0] + b[0], a[1] + b[1])
                                        for a, b in
                                        zip(parts[0::2], parts[1::2])]
                                if len(parts) % 2:
                                    nxt_.append(parts[-1])
                                parts = nxt_
                            xg_h, xg_l = parts[0] if parts else init
                        else:
                            # select cascade: real entries always have
                            # q < trip (plan.py lcol is qb-relative and
                            # bounded by the slot span) and padding
                            # multiplies v=0, so the final step needs no
                            # mask — (trip-1) cmps + 2(trip-1) selects
                            # replaces the tree's trip cmps + 2*trip
                            # selects + 2(trip-1) adds (~2*trip+1 fewer
                            # VPU ops per slot; the cascade depth <= KS
                            # is far shorter than the dd-FMA chain it
                            # feeds, so the serialization is free)
                            xg_h, xg_l = gh[trip - 1], gl[trip - 1]
                            for k in range(trip - 2, -1, -1):
                                hit = q == jnp.int32(k)
                                xg_h = jnp.where(hit, gh[k], xg_h)
                                xg_l = jnp.where(hit, gl[k], xg_l)
                elif chunked:
                    xg_h, xg_l = jax.lax.fori_loop(
                        0, (ks_eff + jnp.int32(U - 1)) // jnp.int32(U),
                        chunk, init)
                else:
                    xg_h, xg_l = jax.lax.fori_loop(0, ks_eff, body, init)
                vh = vh_ref[0, s]
                vl = vl_ref[0, s]
                if vh.ndim == 3:
                    vh, vl = vh[0], vl[0]
                if _ABLATE == "nofma":
                    return acc + vh * xg_h, acc_l
                return _dd_fma(acc, acc_l, vh, vl, xg_h, xg_l, fast=fastdd)
            else:
                def body(k, xg):
                    return jnp.where(q == k, gather(op(xw, k), lane),
                                     xg)

                def chunk(c, xg):
                    base = sbase_l + qb + c * jnp.int32(U)
                    L2 = U + (G - 1 if slope else 0)
                    w = xw[pl.ds(base, L2), :]
                    for j in range(U):
                        k = c * jnp.int32(U) + jnp.int32(j)
                        r = (w[j:j + G] if slope else
                             jnp.broadcast_to(w[j:j + 1], (G, 128)))
                        xg = jnp.where(q == k, gather(r, lane), xg)
                    return xg

                if unroll:
                    trip = KS_eff
                    if (ks_slot is not None and s_stat is not None
                            and _ABLATE != "noscan"):
                        trip = ks_slot[s_stat]
                    if trip == 1:
                        # span-1 slot: identity hit mask (see dd path)
                        xg = gather(op(xw, jnp.int32(0)), lane)
                    else:
                        L = -(-(trip + G - 1) // 8) * 8
                        if slope and L <= 16:
                            W1 = xw[pl.ds(sbase_l + qb, L), :]
                            op1 = lambda k: W1[k:k + G]
                        else:
                            op1 = lambda k: op(xw, jnp.int32(k))
                        g1 = [gather(op1(k), lane) for k in range(trip)]
                        if _SELECT_TREE:
                            parts = []
                            for k in range(trip):
                                parts.append(jnp.where(
                                    q == jnp.int32(k), g1[k],
                                    jnp.float32(0)))
                            while len(parts) > 1:
                                nxt_ = [a + b for a, b in
                                        zip(parts[0::2], parts[1::2])]
                                if len(parts) % 2:
                                    nxt_.append(parts[-1])
                                parts = nxt_
                            xg = parts[0] if parts else jnp.zeros(
                                (G, 128), jnp.float32)
                        else:
                            # select cascade (see dd path)
                            xg = g1[trip - 1]
                            for k in range(trip - 2, -1, -1):
                                xg = jnp.where(q == jnp.int32(k),
                                               g1[k], xg)
                elif chunked:
                    xg = jax.lax.fori_loop(
                        0, (ks_eff + jnp.int32(U - 1)) // jnp.int32(U),
                        chunk, jnp.zeros((G, 128), jnp.float32))
                else:
                    xg = jax.lax.fori_loop(
                        0, ks_eff, body, jnp.zeros((G, 128), jnp.float32))
                v = v_ref[0, s]
                if v.ndim == 3:
                    v = v[0]
                if v.dtype != jnp.float32:
                    v = v.astype(jnp.float32)   # bf16 storage, f32 FMA
                return acc + v * xg, acc_l

        zero = lambda: jnp.zeros((G, 128), jnp.float32)

        def subtile(jS):
            acc = zero()
            acc_l = zero() if dd else jnp.float32(0)
            if _slots_unrolled(S, KS):
                # static slot loop; `nacc` independent accumulators break
                # the serial per-slot (dd-renorm) dependency chain so
                # slots pipeline against each other
                na = max(1, min(nacc, S))
                accs = [(zero(), zero() if dd else jnp.float32(0))
                        for _ in range(na)]
                for s in range(S):
                    accs[s % na] = slot_step(
                        jS + s if sub > 1 else s, s, *accs[s % na])
                acc, acc_l = accs[0]
                for a2, a2l in accs[1:]:
                    if dd:
                        acc, acc_l = _dd_add(acc, acc_l, a2, a2l)
                    else:
                        acc = acc + a2
            else:
                # wide slot spaces (split long rows, widened column
                # buckets): a dynamic slot loop keeps the compiled kernel
                # size O(1) in S
                # i32 bounds: python-int bounds give an i64 induction
                # var under x64, and i64->i32 converts loop forever in
                # Mosaic's lowering fallback
                acc, acc_l = jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(S),
                    lambda s, c: slot_step(jS + s, None, *c),
                    (acc, acc_l))
            return acc, acc_l

        if sub == 1:
            acc, acc_l = subtile(0)
            if dd:
                yh_ref[0, :, :] = acc
                yl_ref[0, :, :] = acc_l
            else:
                y_ref[0, :, :] = acc
        elif _SUB_STATIC and sub * S <= 192:
            # static subtile unroll: refs get static indices (cheapest
            # address paths) at sub*S slot bodies of compiled code
            for j in range(sub):
                acc, acc_l = subtile(j * S)
                if dd:
                    yh_ref[0, j * G:(j + 1) * G, :] = acc
                    yl_ref[0, j * G:(j + 1) * G, :] = acc_l
                else:
                    y_ref[0, j * G:(j + 1) * G, :] = acc
        else:
            # dynamic subtile loop: slot bodies are generated once and
            # shared by all SUB subtiles (compiled size stays O(S))
            def sub_body(j, carry):
                acc, acc_l = subtile(j * jnp.int32(S))
                r = pl.ds(j * jnp.int32(G), G)
                if dd:
                    yh_ref[0, r, :] = acc
                    yl_ref[0, r, :] = acc_l
                else:
                    y_ref[0, r, :] = acc
                return carry
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(sub), sub_body,
                              jnp.int32(0))

    return kernel


def _tile_specs(S, G, n_tensor_inputs, n_outputs, sub=1):
    """Specs shared by both kernels: SMEM qb block, 4D per-tile operand
    blocks, ANY-space x. (wbase128 is a scalar-prefetch arg, not listed.)
    Under supertiling the slot dim carries sub*S rows and the y tile
    sub*G sublane groups."""
    def im3(i, *_):
        return (i, _i0(), _i0())

    def im4(i, *_):
        return (i, _i0(), _i0(), _i0())

    in_specs = [
        pl.BlockSpec((1, 2, sub * S), im3, memory_space=pltpu.SMEM),
    ] + [
        pl.BlockSpec((1, sub * S, G, 128), im4, memory_space=pltpu.VMEM)
        for _ in range(n_tensor_inputs)
    ] + [
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    outs = [pl.BlockSpec((1, sub * G, 128), im3, memory_space=pltpu.VMEM)
            for _ in range(n_outputs)]
    return in_specs, (outs if n_outputs > 1 else outs[0])


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "KS", "K128", "T", "slope",
                                    "unroll", "static", "ks_slot", "nacc",
                                    "sub", "interpret"))
def _run_f32(wbase128, qb, lcol, vals, x2d, S, G, KS, K128, T, slope=0,
             unroll=False, static=False, ks_slot=None, nacc=1, sub=1,
             interpret=False):
    in_specs, out_specs = _tile_specs(S, G, 2, 1, sub=sub)
    nbuf = 1 if static else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            # +U slack rows: the chunked scan may read up to U-1 rows past
            # the last buffer's end (values masked by the q==k selects)
            pltpu.VMEM((nbuf * K128 + _CHUNK_U, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(S, G, KS, K128, T, dd=False, slope=slope,
                     unroll=unroll, static=static, ks_slot=ks_slot,
                     nacc=nacc, sub=sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32),
        interpret=interpret,
    )(wbase128, qb, lcol, vals, x2d)


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "KS", "K128", "T", "slope",
                                    "unroll", "fastdd", "static",
                                    "ks_slot", "nacc", "sub", "interpret"))
def _run_dd(wbase128, qb, lcol, vals_h, vals_l, x2d_h, x2d_l,
            S, G, KS, K128, T, slope=0, unroll=False, fastdd=False,
            static=False, ks_slot=None, nacc=1, sub=1, interpret=False):
    in_specs, out_specs = _tile_specs(S, G, 3, 2, sub=sub)
    in_specs.insert(-1, pl.BlockSpec(memory_space=pl.ANY))  # x lo halves
    nbuf = 1 if static else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            # +U slack rows: the chunked scan may read up to U-1 rows past
            # the last buffer's end (values masked by the q==k selects)
            pltpu.VMEM((nbuf * K128 + _CHUNK_U, 128), jnp.float32),  # x hi
            pltpu.VMEM((nbuf * K128 + _CHUNK_U, 128), jnp.float32),  # x lo
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(S, G, KS, K128, T, dd=True, slope=slope,
                     unroll=unroll, fastdd=fastdd, static=static,
                     ks_slot=ks_slot, nacc=nacc, sub=sub),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32),
                   jax.ShapeDtypeStruct((T, sub * G, 128), jnp.float32)],
        interpret=interpret,
    )(wbase128, qb, lcol, vals_h, vals_l, x2d_h, x2d_l)


import collections

PlanCfg = collections.namedtuple(
    "PlanCfg",
    "S G KS K128 T nx128 lead slope static dd unroll fastdd ks_slot nacc "
    "sub n_out interpret")


def _super_k128(plan, sub):
    """Shared-window height (128-rows, 8-aligned) if `sub` consecutive
    tiles fold into one grid step."""
    T = plan.num_tiles
    T_s = -(-T // sub)
    pad = T_s * sub - T
    wb = np.asarray(plan.wbase128, np.int64)
    if pad:
        wb = np.concatenate([wb, np.repeat(wb[-1:], pad)])
    wbg = wb.reshape(T_s, sub)
    k = int(((wbg + plan.K128) - wbg.min(axis=1)[:, None]).max())
    return -(-k // 8) * 8


def _superize(plan, sub):
    """Fold `sub` consecutive tiles into one grid step: shared x window
    (base = min of the subtiles' bases, height = the max joint span), qb
    re-based to the shared window, operands concatenated subtile-major
    so subtile j's slot s sits at operand row j*S + s."""
    T, S, G = plan.num_tiles, plan.rowsize, plan.G
    T_s = -(-T // sub)
    pad = T_s * sub - T
    wb = np.asarray(plan.wbase128, np.int64)
    qb = np.asarray(plan.qb, np.int64)            # (T, 2, S)
    lcol, vals = plan.lcol, plan.vals
    if pad:
        wb = np.concatenate([wb, np.repeat(wb[-1:], pad)])
        qbp = np.zeros((pad, 2, S), qb.dtype)
        qbp[:, 1, :] = 1
        qb = np.concatenate([qb, qbp])
        # padding tiles must decode to local column 0 (int8 stores biased)
        fill = -128 if lcol.dtype == np.int8 else 0
        lcol = np.concatenate(
            [lcol, np.full((pad,) + lcol.shape[1:], fill, lcol.dtype)])
        vals = np.concatenate(
            [vals, np.zeros((pad,) + vals.shape[1:], vals.dtype)])
    wbg = wb.reshape(T_s, sub)
    wbs = wbg.min(axis=1)
    K128_s = int(((wbg + plan.K128) - wbs[:, None]).max())
    K128_s = -(-K128_s // 8) * 8                  # <= nx128 (see _windows)
    wbs = np.minimum(wbs, max(plan.nx128 - K128_s, 0))
    shift = wbg - wbs[:, None]                    # (T_s, sub) >= 0
    qb2 = qb.reshape(T_s, sub, 2, S).copy()
    qb2[:, :, 0, :] += shift[:, :, None]
    qb_s = np.ascontiguousarray(qb2.transpose(0, 2, 1, 3)).reshape(
        T_s, 2, sub * S)
    return (T_s, wbs.astype(np.int32), qb_s.astype(np.int32),
            lcol.reshape(T_s, sub * S, G, 128),
            vals.reshape(T_s, sub * S, G, 128), K128_s)


class DevicePlan:
    """Plan operands on device + the jitted pre/post glue.

    Registered as a JAX pytree (arrays are leaves, the static config is aux
    data) so it can be passed as a jit *argument* — closing over it inside
    an outer jit would embed the matrix data as constants in the compiled
    program (multi-hundred-MB HLO for large matrices)."""

    def __init__(self, ell, plan: plan_mod.EllPlan | None, dd: bool,
                 _leaves=None, _cfg=None):
        if plan is not None:
            self.plan = plan
            interpret = (jax.devices()[0].platform != "tpu"
                         or bool(os.environ.get(
                             "ELLSPMV_TPU_PALLAS_INTERPRET")))
            # static unroll measured ~1.8x faster than the dynamic per-slot
            # loop up to KS=9 on v5e (scalar loop overhead dominates)
            unroll = plan.KS <= int(os.environ.get(
                "ELLSPMV_TPU_UNROLL_KS", "16"))
            # fastdd=None defers the FMA-contraction probe (a tiny Pallas
            # compile — seconds over the remote-compile tunnel) to the
            # first kernel application: codegen cost belongs with compile,
            # not inside the timed format conversion (VERDICT r3 item 5)
            fastdd = (None if dd and os.environ.get(
                "ELLSPMV_TPU_FASTDD", "1") != "0" else False)
            # per-slot static scan trips (tile-max spans): narrow slots
            # stop early instead of running the global KS
            ks_slot = None
            if (unroll and _slots_unrolled(plan.rowsize, plan.KS)
                    and os.environ.get("ELLSPMV_TPU_SLOT_KS", "1") != "0"
                    and plan.qb.size):
                ks_slot = tuple(
                    int(v) for v in plan.qb[:, 1, :].max(axis=0))
            T, S, G = plan.num_tiles, plan.rowsize, plan.G
            # supertiling: amortize the measured ~230 ns/grid-step cost
            # without leaving the cheap (G,128) gather regime; biggest
            # SUB whose operand blocks + shared window still fit VMEM
            sub = int(os.environ.get("ELLSPMV_TPU_SUB", "0"))
            if sub <= 0:
                sub = 1
                if not plan.static_window and T >= 4:
                    for cand in (8, 4, 2):
                        if cand > T:
                            continue
                        k128c = _super_k128(plan, cand)
                        if plan_mod._vmem_bytes(
                                S * cand, G, plan.KS, k128c,
                                dd) > plan_mod.VMEM_BUDGET_BYTES:
                            continue
                        sub = cand
                        break
            sub = max(1, min(sub, max(T, 1)))
            # accumulator split: nacc=1 measured best on the non-supertiled
            # plans (poisson 97.8% roofline, r1 sweep); supertiled plans
            # (long shared-window slot chains) measured ~3% faster with 2
            # independent dd chains (banded 2M: 1.320 -> 1.286 ms)
            nacc_env = os.environ.get("ELLSPMV_TPU_NACC", "")
            nacc = int(nacc_env) if nacc_env else (2 if sub > 1 else 1)
            K128 = plan.K128
            if sub > 1:
                (T, wbs, qb_s, lcol4, vals4, K128) = _superize(plan, sub)
                wb_np = np.asarray(wbs, np.int32)               # (T_s,)
                qb_np = np.asarray(qb_s)
                self.qb = jnp.asarray(qb_s)                     # (T_s,2,sub*S)
            else:
                wb_np = np.asarray(plan.wbase128, np.int32)     # (T,)
                qb_np = np.asarray(plan.qb)
                self.qb = jnp.asarray(plan.qb)                  # (T,2,S)
                lcol4 = plan.lcol.reshape(T, S, G, 128)
                vals4 = plan.vals.reshape(T, S, G, 128)
            # chunked per-tile window DMA (see _make_kernel): ship each
            # tile's 8-row chunk count as row 1 of the prefetch array so
            # the DMA moves the tile's ACTUAL span instead of the
            # plan-global max window (K128 follows the p99.9 outlier
            # tiles; measured 22x the per-tile-ideal window traffic on
            # the power-law stream at 21M nnz)
            if (os.environ.get("ELLSPMV_TPU_CHUNKED_DMA", "1") != "0"
                    and not plan.static_window and qb_np.size):
                need = (qb_np[:, 0, :].astype(np.int64)
                        + qb_np[:, 1, :]).max(axis=1)
                if plan.slope:
                    need += G - 1
                wrows = np.clip(-(-need // 8), 0,
                                K128 // 8).astype(np.int32)
                self.wbase128 = jnp.asarray(np.stack([wb_np, wrows]))
            else:
                self.wbase128 = jnp.asarray(wb_np)
            self.cfg = PlanCfg(S, G, plan.KS, K128,
                               T, plan.nx128, plan.lead,
                               plan.slope, bool(plan.static_window),
                               dd, unroll, fastdd, ks_slot, nacc,
                               sub, plan.num_tiles * G * 128, interpret)
            self.lcol = jnp.asarray(lcol4)
            if dd:
                vh = vals4.astype(np.float32)
                vl = (vals4 - vh.astype(np.float64)).astype(np.float32)
                self.vals = (jnp.asarray(vh), jnp.asarray(vl))
            else:
                v0 = (vals4 if vals4.dtype == _BF16
                      else vals4.astype(np.float32))
                self.vals = (jnp.asarray(v0),)
        else:
            self.plan = None
            self.cfg = _cfg
            self.wbase128, self.qb, self.lcol, *vals = _leaves
            self.vals = tuple(vals)

    @property
    def dd(self):
        return self.cfg.dd

    @property
    def interpret(self):
        return self.cfg.interpret

    def _fastdd(self) -> bool:
        """Resolve the deferred FMA-contraction probe (cached on cfg)."""
        c = self.cfg
        if c.fastdd is None:
            self.cfg = c._replace(
                fastdd=bool(c.dd and fma_contraction_available()))
        return self.cfg.fastdd

    def __call__(self, x):
        c = self.cfg
        if c.dd:
            return _dd_apply(self.wbase128, self.qb, self.lcol,
                             self.vals[0], self.vals[1], x,
                             c.S, c.G, c.KS, c.K128, c.T,
                             c.nx128, c.lead, c.slope, c.unroll,
                             self._fastdd(),
                             c.static, c.ks_slot, c.nacc, c.sub,
                             c.n_out, c.interpret)
        return _f32_apply(self.wbase128, self.qb, self.lcol, self.vals[0],
                          x, c.S, c.G, c.KS, c.K128, c.T,
                          c.nx128, c.lead, c.slope, c.unroll, c.static,
                          c.ks_slot, c.nacc, c.sub, c.n_out, c.interpret)

    def apply_pair(self, xh, xl):
        """fp64 SpMV on pre-split (hi, lo) f32 vectors, returning the
        (hi, lo) pair — no emulated-f64 boundary crossings (for dd-vector
        solvers)."""
        c = self.cfg
        assert c.dd, "apply_pair is the fp64 (double-double) path"
        return _dd_apply_pair(self.wbase128, self.qb, self.lcol,
                              self.vals[0], self.vals[1], xh, xl,
                              c.S, c.G, c.KS, c.K128, c.T,
                              c.nx128, c.lead, c.slope, c.unroll,
                              self._fastdd(),
                              c.static, c.ks_slot, c.nacc, c.sub,
                              c.n_out, c.interpret)


def _dp_flatten(dp):
    return (dp.wbase128, dp.qb, dp.lcol) + dp.vals, dp.cfg


def _dp_unflatten(cfg, leaves):
    return DevicePlan(None, None, cfg.dd, _leaves=leaves, _cfg=cfg)


jax.tree_util.register_pytree_node(DevicePlan, _dp_flatten, _dp_unflatten)


@functools.partial(jax.jit, static_argnames=("S", "G", "KS", "K128", "T",
                                             "nx128", "lead", "slope",
                                             "unroll", "static", "ks_slot",
                                             "nacc", "sub", "n_out",
                                             "interpret"))
def _f32_apply(wbase128, qb, lcol, vals, x, S, G, KS, K128, T, nx128,
               lead=0, slope=0, unroll=False, static=False, ks_slot=None,
               nacc=1, sub=1, n_out=None, interpret=False):
    x = x.astype(jnp.float32)
    x2d = jnp.pad(x, (lead * 128,
                      nx128 * 128 - lead * 128 - x.shape[0])
                  ).reshape(nx128, 128)
    y = _run_f32(wbase128, qb, lcol, vals, x2d, S, G, KS, K128, T, slope,
                 unroll, static, ks_slot, nacc, sub, interpret)
    y = y.reshape(-1)
    # supertile padding may append dummy rows; keep the plan's contract
    return y if n_out is None else y[:n_out]


@functools.partial(jax.jit, static_argnames=("S", "G", "KS", "K128", "T",
                                             "nx128", "lead", "slope",
                                             "unroll", "fastdd", "static",
                                             "ks_slot", "nacc", "sub",
                                             "n_out", "interpret"))
def _dd_apply(wbase128, qb, lcol, vals_h, vals_l, x, S, G, KS, K128, T,
              nx128, lead=0, slope=0, unroll=False, fastdd=False,
              static=False, ks_slot=None, nacc=1, sub=1, n_out=None,
              interpret=False):
    xp = jnp.pad(x, (lead * 128, nx128 * 128 - lead * 128 - x.shape[0]))
    xh = xp.astype(jnp.float32)
    xl = (xp - xh.astype(xp.dtype)).astype(jnp.float32)
    yh, yl = _run_dd(wbase128, qb, lcol, vals_h, vals_l,
                     xh.reshape(nx128, 128), xl.reshape(nx128, 128),
                     S, G, KS, K128, T, slope, unroll, fastdd, static,
                     ks_slot, nacc, sub, interpret)
    y = (yh.reshape(-1).astype(jnp.float64)
         + yl.reshape(-1).astype(jnp.float64))
    return y if n_out is None else y[:n_out]


@functools.partial(jax.jit, static_argnames=("S", "G", "KS", "K128", "T",
                                             "nx128", "lead", "slope",
                                             "unroll", "fastdd", "static",
                                             "ks_slot", "nacc", "sub",
                                             "n_out", "interpret"))
def _dd_apply_pair(wbase128, qb, lcol, vals_h, vals_l, xh, xl,
                   S, G, KS, K128, T, nx128, lead=0, slope=0, unroll=False,
                   fastdd=False, static=False, ks_slot=None, nacc=1,
                   sub=1, n_out=None, interpret=False):
    pad = (lead * 128, nx128 * 128 - lead * 128 - xh.shape[0])
    yh, yl = _run_dd(wbase128, qb, lcol, vals_h, vals_l,
                     jnp.pad(xh, pad).reshape(nx128, 128),
                     jnp.pad(xl, pad).reshape(nx128, 128),
                     S, G, KS, K128, T, slope, unroll, fastdd, static,
                     ks_slot, nacc, sub, interpret)
    if n_out is not None:
        return yh.reshape(-1)[:n_out], yl.reshape(-1)[:n_out]
    return yh.reshape(-1), yl.reshape(-1)


def get_plan(ell, **kw):
    """Build (and cache on the EllMatrix) the device plan, or None."""
    if isinstance(ell.values, jax.core.Tracer):
        return None      # under trace there is no concrete data to plan on
    cached = getattr(ell, _PLAN_ATTR, None)
    if cached is not None:
        return cached if cached != "unsupported" else None
    val_dt = np.dtype(np.asarray(ell.values).dtype)
    dd = val_dt == np.float64
    vdt = (np.float64 if dd
           else (_BF16 if val_dt == _BF16 else np.float32))
    vb = 8 if dd else 4
    plan = plan_mod.best_plan(ell, value_dtype=vdt, **kw)

    def better(cand):
        return cand is not None and (
            plan is None or plan_mod.estimate_cycles(cand, vb, dd)
            < plan_mod.estimate_cycles(plan, vb, dd))

    def good_enough():
        # a plan scanning ~the 2-block floor (the 128-row j-term crosses
        # one boundary) has nothing left for more candidates to win
        return (plan is not None and plan.KS <= 3
                and float(plan.qb[:, 1, :].mean()) <= 2.2)

    # Slot reassignment candidates, cheapest-win-first: offset buckets
    # shrink windows when rows are partially filled (stencil boundaries,
    # FEM surfaces); widened offset buckets give FULL rows slack — with
    # `u` = one slot per distinct diagonal the minimal-padding exact
    # widening for stencil/mesh matrices; column buckets confine each
    # slot's resident-x scan to its own column band (random/power-law).
    # The search stops as soon as the winner is at the ~2-step scan floor.
    S = ell.rowsize
    cap = plan_mod.MAX_ROWSIZE
    square = ell.num_rows == ell.num_columns
    candidates = [("offset", None)]
    if square and S > 1:
        cols_s = np.asarray(ell.colidx)
        vals_s = np.asarray(ell.values)
        offs = (cols_s.astype(np.int64)
                - np.arange(cols_s.shape[0])[:, None])[vals_s != 0]
        if offs.size > 2_000_000:
            offs = offs[:: offs.size // 2_000_000]
        u = len(np.unique(offs))
        if S < u <= min(4 * S, cap):
            candidates.append(("offset", u))
    candidates += [("offset", min(3 * S // 2, cap)),
                   ("offset", min(2 * S, cap)),
                   # pair-window ranges: ks <= 2 by CONSTRUCTION at any
                   # tile size (interval-covering capacities, Hall's
                   # condition) — beats the tile-max wall that flattens
                   # block buckets on banded-random matrices
                   ("pair", None),
                   # gather-block-aligned capacities: the banded-RANDOM
                   # shape (no diagonal structure, ks stuck ~4 under
                   # offset quantiles) drops to ks ~1.3 here
                   ("block", min(3 * S // 2, cap)),
                   ("block", min(2 * S, cap)), ("column", None),
                   ("column", min(2 * S, cap)),
                   ("offset", min(4 * S, cap)),
                   ("column", min(4 * S, cap))]
    forced = os.environ.get("ELLSPMV_TPU_FORCE_REBUCKET")
    if forced:
        # ablation hook: use exactly this rebucket candidate, skipping the
        # cost-model competition ("offset", "offset:48", "block:32",
        # "pair", "column", "none")
        plan = plan_mod.best_plan(ell, value_dtype=vdt, **kw)
        if forced != "none":
            key, _, widen = forced.partition(":")
            ell2 = plan_mod.rebucket_slots(
                ell, key=key, widen_to=int(widen) if widen else None)
            if ell2 is not ell:
                plan2 = plan_mod.best_plan(ell2, value_dtype=vdt, **kw)
                if plan2 is not None:
                    plan = plan2
        if plan is None:
            object.__setattr__(ell, _PLAN_ATTR, "unsupported")
            return None
        dp = DevicePlan(ell, plan, dd)
        object.__setattr__(ell, _PLAN_ATTR, dp)
        return dp
    seen = set()
    for key, widen in candidates:
        if good_enough():
            break
        if key == "offset" and not square:
            continue
        if widen is not None and (widen <= S or (key, widen) in seen):
            continue
        seen.add((key, widen))
        ell2 = plan_mod.rebucket_slots(ell, key=key, widen_to=widen)
        if ell2 is ell:
            continue
        plan2 = plan_mod.best_plan(ell2, value_dtype=vdt, **kw)
        if better(plan2):
            plan = plan2
    if plan is None:
        object.__setattr__(ell, _PLAN_ATTR, "unsupported")
        return None
    dp = DevicePlan(ell, plan, dd)
    object.__setattr__(ell, _PLAN_ATTR, dp)
    return dp


def supported(ell, x) -> bool:
    if isinstance(ell.values, jax.core.Tracer):
        return False
    if jax.devices()[0].platform not in ("tpu",):
        return False
    val_dt = np.dtype(np.asarray(ell.values).dtype)
    if val_dt not in (np.dtype(np.float32), np.dtype(np.float64),
                      _BF16):
        return False
    return get_plan(ell) is not None


def ell_spmv_pallas(ell, x, y=None):
    """y := A*x + y via the Pallas kernel (+ diagonal and y-accumulate as a
    fused XLA epilogue)."""
    dp = get_plan(ell)
    if dp is None:
        raise ValueError("matrix unsupported by the pallas ELL kernel")
    x = jnp.asarray(x)
    core = dp(x)[:ell.num_rows]
    val_dt = np.asarray(ell.values).dtype
    out = core.astype(val_dt)
    if ell.diag is not None:
        n = ell.num_rows
        d = jnp.asarray(ell.diag)[:n]
        xi = jnp.minimum(jnp.arange(n), max(ell.num_columns - 1, 0))
        out = out + d * x.astype(val_dt)[xi]
    if y is not None:
        out = out + jnp.asarray(y).astype(val_dt)
    return out
