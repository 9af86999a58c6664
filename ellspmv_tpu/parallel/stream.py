"""Row-sharded stream SpMV: power-law matrices across the device mesh.

Extends the row-sharding story (parallel/spmv.py — the TPU realization of
the reference's thread partitions, csrspmv.c:2834-2837) to the sort-based
stream format: each device owns a row block's ENTRIES (column-sorted
locally), so the whole pipeline — product kernel, key sorts, segmented-sum
kernels — runs device-locally under `shard_map`; the ONLY communication is
the allgather of x over ICI (plus y staying sharded), exactly like the
windowed path.

SPMD needs every device to compile the same program, so per-device plans
are built structurally identical:

- product stage: every device's (nnz_d x 1) column-sorted ELL is padded to
  a common entry count and planned at a common tile size; tile counts,
  window heights and scan bounds take the across-device maxima (pad tiles
  multiply zeros);
- sum stage: `build_stream_sum_uniform` (ops/stream_sum.py) forces every
  level's bucket layout to the across-device union, with early-finished
  devices running pass-through aggregation levels.

Per-device plan data rides as stacked, row-sharded jit arguments.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ellspmv_tpu.formats.coo import CooMatrix
from ellspmv_tpu.parallel.mesh import make_mesh


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class ShardedStream:
    mesh: object
    boundaries: np.ndarray          # (D+1,) logical row boundaries
    block: int                      # rows per device (padded)
    logical_rows: int
    logical_cols: int
    num_nonzeros: int
    x_block: int
    unpermute: jax.Array            # (logical_rows,) physical y -> logical
    dd: bool
    # product stage (stacked per device, row-sharded)
    prod_args: tuple                # wbase (D,T), qb, lcol, vals...
    prod_cfg: dict                  # static kernel parameters
    # sum stage: stacked leaves + shared treedef
    sum_leaves: list
    sum_treedef: object
    # split diagonal (--separate-diagonal): per-device dense blocks
    diag_args: tuple = ()
    diag_pad: int = 0               # extra x padding for the diag slice
    # raw per-device triplets for the strict-f64 XLA backend (stacked
    # (D, E_pad) cols/local rows/values): native-f64 gather + segment-sum
    # under the same shard_map — the certification path for exact
    # multi-chip stream numerics (dd Pallas loses its error-free
    # transforms to XLA rewrites under interpret mode)
    xla_args: tuple = ()

    @property
    def num_rows(self):
        return self.logical_rows

    @property
    def num_columns(self):
        return self.logical_cols

    @property
    def values(self):
        return np.zeros(0, np.float64 if self.dd else np.float32)

    @property
    def worksize(self):
        return self.num_nonzeros

    nnz_per_device: np.ndarray | None = None

    def workload_report(self) -> list[str]:
        """Per-device rows/nonzeros table — the `-vv` workload report
        (csrspmv.c:2289-2338)."""
        lines = ["device  rows       nonzeros"]
        rows_per = np.diff(self.boundaries)
        for d in range(self.mesh.devices.size):
            nnz = (0 if self.nnz_per_device is None
                   else int(self.nnz_per_device[d]))
            lines.append(f"{d:<7d} {rows_per[d]:<10d} {nnz}")
        return lines


def shard_stream(coo: CooMatrix, n_devices: int | None = None,
                 partition: str = "rows", rows_per_device=None,
                 mesh=None, value_dtype=None, separate_diagonal: bool = False,
                 row_tile: int = 4096) -> ShardedStream:
    """Build the row-sharded stream plan from COO.

    `separate_diagonal` splits the diagonal into a per-device dense vector
    added as `y[i] += ad[i]*x[i]` (ellgemvsd's epilogue, ellspmv.c:1177)."""
    from ellspmv_tpu.ops import plan as plan_mod
    from ellspmv_tpu.ops.stream_sum import build_stream_sum_uniform
    from ellspmv_tpu.formats.ell import EllMatrix

    if mesh is None:
        mesh = make_mesh(n_devices)
    D = mesh.devices.size
    axis = mesh.axis_names[0]

    coo = coo.expand_symmetry()
    n, m = coo.num_rows, coo.num_columns
    nnz = coo.num_nonzeros
    val_dt = np.dtype(value_dtype) if value_dtype else coo.values.dtype
    dd = val_dt == np.dtype(np.float64)

    diag_full = None
    if separate_diagonal:
        coo, diag_full = coo.split_diagonal()

    # row-block boundaries (rows / nonzeros / explicit — csrspmv.c:2022-71)
    if rows_per_device is not None:
        if len(rows_per_device) != D or sum(rows_per_device) != n:
            raise ValueError("bad rows-per-device list")
        bounds = np.concatenate([[0], np.cumsum(rows_per_device)])
    elif partition == "nonzeros":
        counts = np.bincount(coo.rowidx, minlength=n)
        rowptr = np.concatenate([[0], np.cumsum(counts)])
        targets = (np.arange(1, D) * rowptr[-1]) // D
        inner = np.searchsorted(rowptr, targets, side="left")
        bounds = np.concatenate([[0], inner, [n]])
    else:
        b = -(-n // D)
        bounds = np.minimum(np.arange(D + 1) * b, n)
    rows_per = np.diff(bounds)
    block = max(int(rows_per.max()), 1)

    # per-device entries, column-sorted, rows local to the block
    unperm = np.zeros(n, np.int64)
    per_cols, per_vals, per_rows = [], [], []
    for d in range(D):
        lo, hi = bounds[d], bounds[d + 1]
        sel = (coo.rowidx >= lo) & (coo.rowidx < hi)
        order = np.argsort(coo.colidx[sel], kind="stable")
        per_cols.append(coo.colidx[sel][order].astype(np.int32))
        per_vals.append(coo.values[sel][order].astype(val_dt))
        per_rows.append((coo.rowidx[sel][order] - lo).astype(np.int64))
        unperm[lo:hi] = d * block + np.arange(hi - lo)
    E_max = max(max(len(c) for c in per_cols), 1)
    E_pad = max(_round_up(E_max, row_tile), row_tile)

    # product plans at a common tile size, padded to common statics
    plans = []
    for d in range(D):
        cols = np.full(E_pad, per_cols[d][-1] if len(per_cols[d])
                       else 0, np.int32)
        vals = np.zeros(E_pad, val_dt)
        cols[:len(per_cols[d])] = per_cols[d]
        vals[:len(per_vals[d])] = per_vals[d]
        ell = EllMatrix(colidx=cols[:, None], values=vals[:, None],
                        diag=None, num_rows=E_pad, num_columns=m,
                        num_nonzeros=max(len(per_cols[d]), 1))
        p = plan_mod.build_plan(ell, row_tile=row_tile, slope=0,
                                static=False,
                                value_dtype=np.float64 if dd
                                else np.float32)
        if p is None:
            raise ValueError("stream product stage has no plan "
                             "(pathological column space)")
        plans.append(p)
    T = max(p.num_tiles for p in plans)
    KS = max(p.KS for p in plans)
    K128 = max(p.K128 for p in plans)
    nx128 = plans[0].nx128
    Gp = plans[0].G
    assert all(p.nx128 == nx128 and p.G == Gp and p.rowsize == 1
               and p.n_pad == E_pad and p.num_tiles == T for p in plans)
    lcol_dt = np.int16 if KS * 128 <= np.iinfo(np.int16).max else np.int32

    def pad_plan(p):
        wb = np.minimum(p.wbase128.astype(np.int64),
                        max(nx128 - K128, 0))
        delta = p.wbase128.astype(np.int64) - wb       # widen window down
        qb = p.qb.astype(np.int64).copy()              # (T, 2, 1)
        qb[:, 0, :] += delta[:, None]
        lcol = p.lcol
        if lcol.dtype == np.int8:     # biased storage: unbias first
            lcol = lcol.astype(np.int16) + np.int16(128)
        lcol = lcol.reshape(T, 1, Gp, 128)
        return (wb.astype(np.int32), qb.astype(np.int32),
                lcol.astype(lcol_dt))

    wbs, qbs, lcols, vhs, vls = [], [], [], [], []
    for p in plans:
        wb, qb, lcol = pad_plan(p)
        wbs.append(wb)
        qbs.append(qb)
        lcols.append(lcol)
        if dd:
            vh = p.vals.astype(np.float32)
            vls.append((p.vals - vh.astype(np.float64)).astype(
                np.float32).reshape(T, 1, Gp, 128))
            vhs.append(vh.reshape(T, 1, Gp, 128))
        else:
            vhs.append(p.vals.astype(np.float32).reshape(T, 1, Gp, 128))
    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    dev = lambda arrs, nd: jax.device_put(
        jnp.asarray(np.stack(arrs)), sh(axis, *([None] * nd)))
    prod_args = (dev(wbs, 1), dev(qbs, 3), dev(lcols, 4), dev(vhs, 4)) + \
        ((dev(vls, 4),) if dd else ())
    prod_cfg = dict(S=1, G=Gp, KS=KS, K128=K128, T=T, nx128=nx128,
                    unroll=KS <= 16)

    # split diagonal: per-device dense block + its global row offset
    diag_args = ()
    diag_pad = 0
    if diag_full is not None:
        dblocks, dstarts = [], []
        for d in range(D):
            lo, hi = int(bounds[d]), int(bounds[d + 1])
            blk = np.zeros(block, val_dt)
            sl = diag_full[lo:min(hi, len(diag_full))]
            blk[:len(sl)] = sl.astype(val_dt)
            dblocks.append(blk)
            dstarts.append(np.array([lo], np.int32))
            diag_pad = max(diag_pad, lo + block - m)
        diag_args = (dev(dblocks, 1), dev(dstarts, 1))
        diag_pad = max(diag_pad, 0)

    # raw triplets for the strict-f64 XLA backend
    xcols = np.zeros((D, E_pad), np.int32)
    xrows = np.full((D, E_pad), -1, np.int32)
    xvals = np.zeros((D, E_pad), val_dt)
    for d in range(D):
        k = len(per_cols[d])
        xcols[d, :k] = per_cols[d]
        xrows[d, :k] = per_rows[d]
        xvals[d, :k] = per_vals[d]
    xla_args = (dev(list(xcols), 1), dev(list(xrows), 1),
                dev(list(xvals), 1))

    # uniform sum plans over the padded local row blocks
    dests = []
    for d in range(D):
        dst = np.full(E_pad, -1, np.int64)
        dst[:len(per_rows[d])] = per_rows[d]
        # pad rows [rows_d, block) must still emit terminal zeros so the
        # physical y layout is dense; give them no entries (bincount 0)
        dests.append(dst)
    sum_plans = build_stream_sum_uniform(dests, n_rows=block)
    leaves0, treedef = jax.tree_util.tree_flatten(sum_plans[0])
    all_leaves = [jax.tree_util.tree_flatten(p)[0] for p in sum_plans]
    sum_leaves = [dev([np.asarray(lv[i]) for lv in all_leaves],
                      np.asarray(leaves0[i]).ndim)
                  for i in range(len(leaves0))]

    return ShardedStream(
        mesh=mesh, boundaries=bounds, block=block, logical_rows=n,
        logical_cols=m, num_nonzeros=nnz,
        x_block=_round_up(max(m, 1), D) // D,
        unpermute=jnp.asarray(unperm), dd=dd,
        prod_args=prod_args, prod_cfg=prod_cfg,
        sum_leaves=sum_leaves, sum_treedef=treedef,
        diag_args=diag_args, diag_pad=diag_pad, xla_args=xla_args,
        nnz_per_device=np.array([len(c) for c in per_cols]))


def sharded_stream_xla_fn(ss: ShardedStream):
    """Strict-f64 XLA backend over the same mesh/shard_map: per device a
    native-f64 gather-product + segment-sum over the local row block.
    Slower than the Pallas pipeline but numerically EXACT per the fp64
    north star (<= 1e-14 rel, BASELINE.md) on any backend — the
    certification path for sharded stream numerics in the dryrun."""
    if not ss.xla_args:
        raise ValueError("stream built without the XLA fallback triplets")
    mesh, axis = ss.mesh, ss.mesh.axis_names[0]
    D = mesh.devices.size
    dd = ss.dd
    m = ss.logical_cols
    val_dt = np.float64 if dd else np.float32
    has_diag = len(ss.diag_args) > 0

    def local(*args):
        if has_diag:
            *op, dvec, dstart, x_blk, y_blk = args
        else:
            *op, x_blk, y_blk = args
            dvec = dstart = None
        cols, rows, vals = (a[0] for a in op)
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)[:m]
        p = vals * x_full[cols]
        p = jnp.where(rows >= 0, p, jnp.zeros((), p.dtype))
        acc = jax.ops.segment_sum(p, jnp.maximum(rows, 0),
                                  num_segments=ss.block)
        if has_diag:
            xd = jax.lax.dynamic_slice(
                jnp.pad(x_full, (0, ss.diag_pad)),
                (dstart[0, 0],), (ss.block,))
            acc = acc + dvec[0].astype(acc.dtype) * xd.astype(acc.dtype)
        return acc.astype(y_blk.dtype) + y_blk

    all_args = ss.xla_args + ss.diag_args
    in_specs = tuple(P(axis, *([None] * (np.asarray(a).ndim - 1)))
                     for a in all_args) + (P(axis), P(axis))
    mapped = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                           out_specs=P(axis), check_vma=False)

    @jax.jit
    def fn_physical(x_phys, y_phys, *op):
        return mapped(*op, x_phys, y_phys)

    def fn(_ss, x, y=None):
        x = jnp.asarray(x, val_dt)
        m_pad = ss.x_block * D
        x_phys = jax.device_put(
            jnp.pad(x, (0, m_pad - x.shape[0])),
            NamedSharding(mesh, P(axis)))
        if y is None:
            y_phys = jnp.zeros(ss.block * D, val_dt)
        else:
            y_phys = jnp.zeros(ss.block * D, val_dt).at[
                ss.unpermute].set(jnp.asarray(y, val_dt))
        out = fn_physical(x_phys, y_phys, *all_args)
        return out[ss.unpermute]

    return fn


def sharded_stream_spmv_fn(ss: ShardedStream, backend: str = "pallas"):
    """Build `fn(ss, x_logical, y_logical|None) -> y_logical`.

    `backend="xla"` returns the strict-f64 certification path
    (sharded_stream_xla_fn)."""
    from ellspmv_tpu.ops import ell_pallas
    from ellspmv_tpu.ops.stream_sum import apply_stream_sum

    if backend == "xla":
        return sharded_stream_xla_fn(ss)
    mesh, axis = ss.mesh, ss.mesh.axis_names[0]
    D = mesh.devices.size
    cfg = ss.prod_cfg
    dd = ss.dd
    m = ss.logical_cols
    nx128 = cfg["nx128"]
    interpret = jax.devices()[0].platform != "tpu"
    treedef = ss.sum_treedef
    val_dt = np.float64 if dd else np.float32

    n_sum = len(ss.sum_leaves)
    has_diag = len(ss.diag_args) > 0

    def local(*args):
        *op, x_blk, y_blk = args
        wb, qb, lcol, *vals_and_sum = op
        nv = 2 if dd else 1
        vals = vals_and_sum[:nv]
        sum_leaves = vals_and_sum[nv:nv + n_sum]
        dvec = dstart = None
        if has_diag:
            dvec, dstart = vals_and_sum[nv + n_sum:nv + n_sum + 2]
        wb, qb, lcol = wb[0], qb[0], lcol[0]
        vals = [v[0] for v in vals]
        plan = jax.tree_util.tree_unflatten(
            treedef, [lv[0] for lv in sum_leaves])
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)[:m]
        xp = jnp.pad(x_full, (0, nx128 * 128 - m))
        if dd:
            xh = xp.astype(jnp.float32)
            xl = (xp - xh.astype(xp.dtype)).astype(jnp.float32)
            ph, pl_ = ell_pallas._run_dd(
                wb, qb, lcol, vals[0], vals[1],
                xh.reshape(nx128, 128), xl.reshape(nx128, 128),
                cfg["S"], cfg["G"], cfg["KS"], cfg["K128"], cfg["T"],
                slope=0, unroll=cfg["unroll"],
                fastdd=ell_pallas.fma_contraction_available(),
                static=False, ks_slot=None, nacc=1, interpret=interpret)
            yh, yl = apply_stream_sum(plan, ph.reshape(-1),
                                      pl_.reshape(-1),
                                      interpret=interpret)
            acc = yh.astype(jnp.float64) + yl.astype(jnp.float64)
        else:
            pv = ell_pallas._run_f32(
                wb, qb, lcol, vals[0],
                xp.astype(jnp.float32).reshape(nx128, 128),
                cfg["S"], cfg["G"], cfg["KS"], cfg["K128"], cfg["T"],
                slope=0, unroll=cfg["unroll"], static=False,
                ks_slot=None, nacc=1, interpret=interpret)
            acc = apply_stream_sum(plan, pv.reshape(-1),
                                   interpret=interpret)
        if has_diag:
            # ellgemvsd's epilogue y[i] += ad[i]*x[i] (ellspmv.c:1177) on
            # this device's row block
            xd = jax.lax.dynamic_slice(
                jnp.pad(x_full, (0, ss.diag_pad)),
                (dstart[0, 0],), (ss.block,))
            acc = acc + dvec[0].astype(acc.dtype) * xd.astype(acc.dtype)
        return acc.astype(y_blk.dtype) + y_blk

    in_specs = tuple(P(axis, *([None] * (np.asarray(a).ndim - 1)))
                     for a in ss.prod_args) + \
        tuple(P(axis, *([None] * (np.asarray(l).ndim - 1)))
              for l in ss.sum_leaves) + \
        tuple(P(axis, *([None] * (np.asarray(a).ndim - 1)))
              for a in ss.diag_args) + (P(axis), P(axis))
    mapped = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                           out_specs=P(axis), check_vma=False)
    args = ss.prod_args + tuple(ss.sum_leaves) + ss.diag_args

    @jax.jit
    def fn_physical(x_phys, y_phys, *op):
        return mapped(*op, x_phys, y_phys)

    def fn(_ss, x, y=None):
        x = jnp.asarray(x, val_dt)
        m_pad = ss.x_block * D
        x_phys = jax.device_put(
            jnp.pad(x, (0, m_pad - x.shape[0])),
            NamedSharding(mesh, P(axis)))
        if y is None:
            y_phys = jnp.zeros(ss.block * D, val_dt)
        else:
            y_phys = jnp.zeros(ss.block * D, val_dt).at[
                ss.unpermute].set(jnp.asarray(y, val_dt))
        out = fn_physical(x_phys, y_phys, *args)
        return out[ss.unpermute]

    # traceable (operand, fn) form: plan/value arrays travel as jit
    # ARGUMENTS so an enclosing jit (the bench harness's chained loop)
    # does not embed them as compiled-program constants
    def traceable_fn(op, x, y=None):
        unperm = op[0]
        rest = op[1:]
        x = jnp.asarray(x, val_dt)
        m_pad = ss.x_block * D
        x_phys = jax.lax.with_sharding_constraint(
            jnp.pad(x, (0, m_pad - x.shape[0])),
            NamedSharding(mesh, P(axis)))
        if y is None:
            y_phys = jnp.zeros(ss.block * D, val_dt)
        else:
            y_phys = jnp.zeros(ss.block * D, val_dt).at[unperm].set(
                jnp.asarray(y, val_dt))
        out = mapped(*rest, x_phys, y_phys)
        return out[unperm]

    fn.traceable = ((ss.unpermute,) + tuple(args), traceable_fn)
    return fn