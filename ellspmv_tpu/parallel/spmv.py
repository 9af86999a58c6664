"""Row-sharded multi-chip SpMV: A row-sharded, x allgathered over ICI,
y sharded.

This is the TPU-native realization of the reference's three thread-partition
strategies (SURVEY §2.4):

- ``partition='rows'``   → equal row blocks per device (the default enclosing
  `omp parallel` + orphaned `omp for`, csrspmv.c:2834-2837);
- ``partition='nonzeros'`` → device row-block boundaries chosen so each
  device owns ~equal nonzeros (csrgemvnz's intent, csrspmv.c:1681-1761,
  without its atomics: blocks stay row-aligned, so no write conflicts);
- ``rows_per_device=[N, ...]`` → explicit row counts (csrgemvrp /
  ``--rows-per-thread``, csrspmv.c:2022-2053).

Because SPMD blocks must be equal-shaped, uneven partitions are realized by
padding every device's block to the largest block (padding rows multiply
zeros against in-bounds columns). The physical y layout is
``(n_dev * block,)`` with device d's rows at ``[d*block, d*block+rows_d)``;
`from_physical_y` / the precomputed `unpermute` gather restores the logical
vector.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ellspmv_tpu.formats.csr import CsrMatrix
from ellspmv_tpu.formats.ell import EllMatrix
from ellspmv_tpu.parallel.mesh import make_mesh


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _partition_boundaries(mat, n_dev: int, partition: str,
                          rows_per_device) -> np.ndarray:
    """Row-block boundaries (n_dev+1,) over the logical rows."""
    n = mat.num_rows
    if rows_per_device is not None:
        if len(rows_per_device) != n_dev:
            raise ValueError(f"rows-per-device list has "
                             f"{len(rows_per_device)} entries for {n_dev} "
                             "devices")
        if sum(rows_per_device) != n:
            # same check as csrspmv.c:2041-2053
            raise ValueError(f"rows-per-device sums to "
                             f"{sum(rows_per_device)}, expected {n}")
        return np.concatenate([[0], np.cumsum(rows_per_device)])
    if partition == "nonzeros":
        # Balanced-nnz boundaries via the row-count prefix sum — the
        # precomputed variant of csrgemvnz's startrow scan
        # (csrspmv.c:2054-2071).
        if isinstance(mat, CsrMatrix):
            rowptr = np.asarray(mat.rowptr, dtype=np.int64)
        else:
            counts = (np.asarray(mat.values)[:mat.num_rows] != 0).sum(axis=1)
            rowptr = np.concatenate([[0], np.cumsum(counts)])
        total = rowptr[-1]
        targets = (np.arange(1, n_dev) * total) // n_dev
        inner = np.searchsorted(rowptr, targets, side="left")
        return np.concatenate([[0], inner, [n]])
    # equal rows
    b = -(-n // n_dev)
    return np.minimum(np.arange(n_dev + 1) * b, n)


@dataclasses.dataclass
class ShardedMatrix:
    """A row-sharded EllMatrix or CsrMatrix in physical (padded-block)
    layout, plus the mesh and logical<->physical row maps."""

    base: EllMatrix | CsrMatrix      # physical layout, arrays sharded
    mesh: Mesh
    boundaries: np.ndarray           # (n_dev+1,) logical row boundaries
    block: int                       # physical rows per device
    logical_rows: int
    logical_cols: int
    x_block: int                     # physical x entries per device
    unpermute: jax.Array             # (logical_rows,) physical y -> logical
    x_physical: bool = False         # x shares the physical row layout

    # --- delegation so the bench harness can treat this like a matrix ---
    @property
    def num_rows(self):
        return self.logical_rows

    @property
    def num_columns(self):
        return self.logical_cols

    @property
    def num_nonzeros(self):
        return self.base.num_nonzeros

    @property
    def values(self):
        return self.base.values

    def to_physical_x(self, x):
        if self.x_physical:
            return jax.device_put(
                self.to_physical_y(x),
                NamedSharding(self.mesh, P(self.mesh.axis_names[0])))
        m_pad = self.x_block * self.mesh.devices.size
        x = jnp.asarray(x)
        xp = jnp.pad(x, (0, m_pad - x.shape[0]))
        return jax.device_put(
            xp, NamedSharding(self.mesh, P(self.mesh.axis_names[0])))

    def from_physical_y(self, y_phys):
        return y_phys[self.unpermute]

    def to_physical_y(self, y):
        n_dev = self.mesh.devices.size
        yp = jnp.zeros(self.block * n_dev, jnp.asarray(y).dtype)
        return yp.at[self.unpermute].set(jnp.asarray(y))

    def workload_report(self) -> list[str]:
        """Per-device rows/nonzeros table — the `-vv` workload report
        (csrspmv.c:2289-2338)."""
        lines = ["device  rows       nonzeros"]
        if isinstance(self.base, CsrMatrix):
            rowptr_logical = self.boundaries  # entries per block below
            nnz_per = np.diff(self._entries_per_device)
        else:
            counts = (np.asarray(self.base.values) != 0).reshape(
                self.mesh.devices.size, self.block, -1)
            nnz_per = counts.sum(axis=(1, 2)).astype(np.int64)
        rows_per = np.diff(self.boundaries)
        for d in range(self.mesh.devices.size):
            lines.append(f"{d:<7d} {rows_per[d]:<10d} {int(nnz_per[d])}")
        return lines

    _entries_per_device: np.ndarray | None = None
    _host_ell: "EllMatrix | None" = None


def shard_matrix(mat, n_devices: int | None = None, partition: str = "rows",
                 rows_per_device=None, mesh: Mesh | None = None,
                 x_layout: str = "logical") -> ShardedMatrix:
    """`x_layout="physical"` (ELL, square, no split diagonal) remaps the
    column indices into the padded physical row layout, so x and y share
    ONE layout: physical position p is both row p and x entry p. Solvers
    (CG) then iterate entirely in physical space — no per-iteration
    unpermute gathers; only b in and x out cross the layouts."""
    if mesh is None:
        mesh = make_mesh(n_devices)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    bounds = _partition_boundaries(mat, n_dev, partition, rows_per_device)
    rows_per = np.diff(bounds)
    if x_layout not in ("logical", "physical"):
        raise ValueError(f"unknown x_layout {x_layout!r}")
    if x_layout == "physical":
        if not isinstance(mat, EllMatrix):
            raise ValueError("physical x layout is ELL-only")
        if mat.num_rows != mat.num_columns:
            raise ValueError("physical x layout needs a square matrix")
        if mat.diag is not None:
            raise ValueError("physical x layout: fold the diagonal into "
                             "the ELL slots (no --separate-diagonal)")
    if isinstance(mat, EllMatrix):
        # 128-aligned so Pallas row tiles can divide the device block
        tile = 128
        block = max(_round_up(int(rows_per.max()), tile), tile)
        r = mat.rowsize
        idx_dt = np.asarray(mat.colidx).dtype
        val_dt = np.asarray(mat.values).dtype
        m = mat.num_columns
        pad_col = np.minimum(np.arange(block * n_dev, dtype=idx_dt),
                             max(m - 1, 0))
        colidx = np.broadcast_to(pad_col[:, None],
                                 (block * n_dev, r)).copy()
        values = np.zeros((block * n_dev, r), val_dt)
        diag = np.zeros(block * n_dev, val_dt) if mat.diag is not None \
            else None
        src_col = np.asarray(mat.colidx)
        src_val = np.asarray(mat.values)
        src_diag = None if mat.diag is None else np.asarray(mat.diag)
        unperm = np.zeros(mat.num_rows, np.int64)
        for d in range(n_dev):
            lo, hi = bounds[d], bounds[d + 1]
            cnt = hi - lo
            colidx[d * block:d * block + cnt] = src_col[lo:hi]
            values[d * block:d * block + cnt] = src_val[lo:hi]
            if diag is not None:
                diag[d * block:d * block + cnt] = src_diag[lo:hi]
            unperm[lo:hi] = np.arange(d * block, d * block + cnt)
        if x_layout == "physical":
            # logical column c lives at physical x position unperm[c]
            colidx = unperm[colidx].astype(idx_dt)
            m_eff = block * n_dev
            x_block = block
        else:
            m_eff = m
            x_block = _round_up(max(m, 1), n_dev) // n_dev
        shard = NamedSharding(mesh, P(axis, None))
        shard1 = NamedSharding(mesh, P(axis))
        base = EllMatrix(
            colidx=jax.device_put(colidx, shard),
            values=jax.device_put(values, shard),
            diag=None if diag is None else jax.device_put(diag, shard1),
            num_rows=mat.num_rows, num_columns=m_eff,
            num_nonzeros=mat.num_nonzeros)
        sm = ShardedMatrix(base=base, mesh=mesh, boundaries=bounds,
                           block=block, logical_rows=mat.num_rows,
                           logical_cols=m,
                           x_block=x_block,
                           unpermute=jnp.asarray(unperm),
                           x_physical=(x_layout == "physical"))
        # host copy of the physical layout, for the sharded Pallas plan
        sm._host_ell = EllMatrix(
            colidx=colidx, values=values, diag=None,
            num_rows=block * n_dev, num_columns=m_eff,
            num_nonzeros=mat.num_nonzeros)
        return sm
    if isinstance(mat, CsrMatrix):
        rowptr = np.asarray(mat.rowptr, dtype=np.int64)
        entries_bounds = rowptr[bounds]
        per_dev = np.diff(entries_bounds)
        eblock = max(int(per_dev.max()), 1)
        idx_dt = np.asarray(mat.colidx).dtype
        val_dt = np.asarray(mat.values).dtype
        m = mat.num_columns
        colidx = np.zeros(eblock * n_dev, idx_dt)
        values = np.zeros(eblock * n_dev, val_dt)
        # local row ids within the device block (padding entries -> row 0 of
        # the block with value 0: harmless)
        rowids = np.zeros(eblock * n_dev, idx_dt)
        diag = None
        block = max(_round_up(int(rows_per.max()), 8), 8)
        if mat.diag is not None:
            diag = np.zeros(block * n_dev, val_dt)
        src_col = np.asarray(mat.colidx)
        src_val = np.asarray(mat.values)
        src_row = np.asarray(mat.rowids)
        src_diag = None if mat.diag is None else np.asarray(mat.diag)
        unperm = np.zeros(mat.num_rows, np.int64)
        for d in range(n_dev):
            lo, hi = entries_bounds[d], entries_bounds[d + 1]
            cnt = hi - lo
            colidx[d * eblock:d * eblock + cnt] = src_col[lo:hi]
            values[d * eblock:d * eblock + cnt] = src_val[lo:hi]
            rowids[d * eblock:d * eblock + cnt] = src_row[lo:hi] - bounds[d]
            rlo, rhi = bounds[d], bounds[d + 1]
            if diag is not None:
                diag[d * block:d * block + (rhi - rlo)] = src_diag[rlo:rhi]
            unperm[rlo:rhi] = np.arange(d * block, d * block + (rhi - rlo))
        shard1 = NamedSharding(mesh, P(axis))
        base = CsrMatrix(
            rowptr=jnp.asarray(rowptr),   # kept whole (host metadata)
            colidx=jax.device_put(colidx, shard1),
            values=jax.device_put(values, shard1),
            rowids=jax.device_put(rowids, shard1),
            diag=None if diag is None else jax.device_put(diag, shard1),
            num_rows=mat.num_rows, num_columns=m,
            num_nonzeros=mat.num_nonzeros)
        sm = ShardedMatrix(base=base, mesh=mesh, boundaries=bounds,
                           block=block, logical_rows=mat.num_rows,
                           logical_cols=m,
                           x_block=_round_up(max(m, 1), n_dev) // n_dev,
                           unpermute=jnp.asarray(unperm))
        sm._entries_per_device = entries_bounds
        return sm
    raise TypeError(f"unsupported matrix type {type(mat)}")


def sharded_spmv_fn(sm: ShardedMatrix, backend: str = "auto"):
    """Build `fn(sm, x_logical, y_logical|None) -> y_logical` running the
    local kernel per device under shard_map with an allgather of x.

    With backend auto/pallas on TPU (or in interpret-mode tests), ELL
    matrices use the sharded Pallas kernel when a plan exists."""
    if isinstance(sm.base, EllMatrix) and backend in ("auto", "pallas"):
        import os
        on_tpu = jax.devices()[0].platform == "tpu"
        if on_tpu or os.environ.get("ELLSPMV_TPU_SHARDED_PALLAS"):
            fn = sharded_pallas_spmv_fn(sm)
            if fn is not None:
                return fn
        if backend == "pallas":
            raise ValueError("pallas backend unsupported for this "
                             "matrix/platform")
    shard_map = jax.shard_map

    mesh, axis = sm.mesh, sm.mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = sm.base.num_columns          # x image length (logical or physical)
    base = sm.base
    is_ell = isinstance(base, EllMatrix)
    val_dt = np.asarray(base.values).dtype

    # Per-device logical row start: physical row p on device d is logical
    # row row_start[d] + (p - d*block), which is also the x index the split
    # diagonal multiplies against (ellgemvsd's y[i] += ad[i]*x[i],
    # ellspmv.c:1177).
    row_start = jnp.asarray(sm.boundaries[:-1], jnp.int32)

    if is_ell:
        in_specs = (P(axis, None), P(axis, None), P(axis),
                    *(() if base.diag is None else (P(axis),)),
                    P(axis), P(axis))
        def local(colidx, values, start, *rest):
            *maybe_diag, x_blk, y_blk = rest
            x_full = jax.lax.all_gather(x_blk, axis, tiled=True)[:m]
            acc = y_blk
            if values.shape[1]:
                acc = acc + (values * x_full[colidx]).sum(
                    axis=1, dtype=values.dtype)
            if maybe_diag:
                gi = start[0] + jnp.arange(sm.block, dtype=jnp.int32)
                xi = jnp.minimum(gi, max(m - 1, 0))
                acc = acc + maybe_diag[0] * x_full[xi]
            return acc
        args = (base.colidx, base.values, row_start) + \
            (() if base.diag is None else (base.diag,))
    else:
        in_specs = (P(axis), P(axis), P(axis), P(axis),
                    *(() if base.diag is None else (P(axis),)),
                    P(axis), P(axis))
        def local(colidx, values, rowids, start, *rest):
            *maybe_diag, x_blk, y_blk = rest
            x_full = jax.lax.all_gather(x_blk, axis, tiled=True)[:m]
            prod = values * x_full[colidx]
            acc = y_blk + jax.ops.segment_sum(
                prod, rowids, num_segments=sm.block)
            if maybe_diag:
                gi = start[0] + jnp.arange(sm.block, dtype=jnp.int32)
                xi = jnp.minimum(gi, max(m - 1, 0))
                acc = acc + maybe_diag[0] * x_full[xi]
            return acc
        args = (base.colidx, base.values, base.rowids, row_start) + \
            (() if base.diag is None else (base.diag,))

    mapped = shard_map(local, mesh=mesh,
                       in_specs=in_specs, out_specs=P(axis),
                       check_vma=False)

    # matrix arrays travel as jit parameters, not compiled-in constants
    @jax.jit
    def fn_physical(x_phys, y_phys, *op):
        return mapped(*op, x_phys, y_phys)

    def fn(_sm, x, y=None):
        x_phys = sm.to_physical_x(jnp.asarray(x, val_dt))
        if y is None:
            y_phys = jnp.zeros(sm.block * n_dev, val_dt)
        elif getattr(y, "shape", (0,))[0] == sm.block * n_dev:
            y_phys = y                       # already physical (bench loop)
        else:
            y_phys = sm.to_physical_y(jnp.asarray(y, val_dt))
        out_phys = fn_physical(x_phys, y_phys, *args)
        return sm.from_physical_y(out_phys)

    _attach_traceable(fn, sm, mapped, args, val_dt)
    return fn


def _attach_traceable(fn, sm: ShardedMatrix, mapped, args, val_dt):
    """Give a sharded spmv fn the `.traceable = (operand, fn)` form the
    bench harness's chained protocol jits (mirroring the sharded stream's,
    parallel/stream.py): matrix/plan arrays ride as jit ARGUMENTS and the
    physical<->logical layout transforms trace (sharding expressed via
    `with_sharding_constraint`, not `device_put`). Without this,
    ``ellspmv --devices=N --protocol=chained`` jitted the non-pytree
    ShardedMatrix itself and crashed (the reference's timed loop works
    under every partition flag, ellspmv.c:1821-1876)."""
    import jax
    import jax.numpy as jnp

    mesh, axis = sm.mesh, sm.mesh.axis_names[0]
    n_dev = sm.mesh.devices.size
    x_shard = NamedSharding(mesh, P(axis))
    m_pad = sm.x_block * n_dev
    phys_rows = sm.block * n_dev
    x_physical = sm.x_physical

    def traceable_fn(op, x, y=None):
        unperm = op[0]
        rest = op[1:]
        x = jnp.asarray(x, val_dt)
        if x_physical:
            x_phys = jnp.zeros(phys_rows, val_dt).at[unperm].set(x)
        else:
            x_phys = jnp.pad(x, (0, m_pad - x.shape[0]))
        x_phys = jax.lax.with_sharding_constraint(x_phys, x_shard)
        if y is None:
            y_phys = jnp.zeros(phys_rows, val_dt)
        else:
            y_phys = jnp.zeros(phys_rows, val_dt).at[unperm].set(
                jnp.asarray(y, val_dt))
        return mapped(*rest, x_phys, y_phys)[unperm]

    fn.traceable = ((sm.unpermute,) + tuple(args), traceable_fn)


import collections

_PlanDims = collections.namedtuple(
    "_PlanDims",
    "S G KS K128 nx128 lead slope static unroll T_local dd m ks_slot")
_PlanParts = collections.namedtuple("_PlanParts", "wb qb lcol vals dims")


def _sharded_plan(sm: ShardedMatrix) -> "_PlanParts | None":
    """Build the Pallas plan over the physical (padded-block) layout —
    device blocks are whole numbers of kernel row tiles — and device_put
    its operand arrays row-tile-sharded over the mesh. Cached on `sm`;
    None when the matrix has no plan."""
    import jax.numpy as jnp

    from ellspmv_tpu.ops import plan as plan_mod

    cached = getattr(sm, "_sharded_plan_cache", None)
    if cached is not None:
        return cached if cached != "unsupported" else None
    def reject():
        sm._sharded_plan_cache = "unsupported"
        return None
    if sm._host_ell is None:
        return reject()
    val_dt = np.dtype(np.asarray(sm.base.values).dtype)
    if val_dt not in (np.dtype(np.float32), np.dtype(np.float64)):
        return reject()
    dd = val_dt == np.dtype(np.float64)
    n_dev = sm.mesh.devices.size
    tiles = [t for t in (8192, 4096, 2048, 1024, 512, 256, 128)
             if sm.block % t == 0]
    if not tiles:
        return reject()
    plan = plan_mod.best_plan(
        sm._host_ell, row_tiles=tiles,
        value_dtype=np.float64 if dd else np.float32)
    if plan is None:
        return reject()
    assert plan.num_tiles % n_dev == 0
    mesh = sm.mesh
    axis = mesh.axis_names[0]
    import os as _os
    from ellspmv_tpu.ops.ell_pallas import _slots_unrolled
    unroll = plan.KS <= 16
    ks_slot = None
    if (unroll and _slots_unrolled(plan.rowsize, plan.KS) and plan.qb.size
            and _os.environ.get("ELLSPMV_TPU_SLOT_KS", "1") != "0"):
        ks_slot = tuple(int(v) for v in plan.qb[:, 1, :].max(axis=0))
    dims = _PlanDims(
        S=plan.rowsize, G=plan.G, KS=plan.KS, K128=plan.K128,
        nx128=plan.nx128, lead=plan.lead, slope=plan.slope,
        static=bool(plan.static_window), unroll=unroll,
        T_local=plan.num_tiles // n_dev, dd=dd,
        m=sm._host_ell.num_columns, ks_slot=ks_slot)
    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    T, S, G = plan.num_tiles, plan.rowsize, plan.G
    wb = jax.device_put(jnp.asarray(plan.wbase128), sh(axis))
    qb = jax.device_put(jnp.asarray(plan.qb), sh(axis, None, None))
    lcol = jax.device_put(jnp.asarray(plan.lcol.reshape(T, S, G, 128)),
                          sh(axis, None, None, None))
    if dd:
        vh = plan.vals.astype(np.float32)
        vl = (plan.vals - vh.astype(np.float64)).astype(np.float32)
        vals_dev = (
            jax.device_put(jnp.asarray(vh.reshape(T, S, G, 128)),
                           sh(axis, None, None, None)),
            jax.device_put(jnp.asarray(vl.reshape(T, S, G, 128)),
                           sh(axis, None, None, None)))
    else:
        vals_dev = (
            jax.device_put(
                jnp.asarray(plan.vals.astype(np.float32).reshape(
                    T, S, G, 128)), sh(axis, None, None, None)),)
    parts = _PlanParts(wb=wb, qb=qb, lcol=lcol, vals=vals_dev, dims=dims)
    sm._sharded_plan_cache = parts
    return parts


def sharded_pallas_spmv_fn(sm: ShardedMatrix):
    """Row-sharded SpMV whose per-device compute is the Pallas windowed
    ELL kernel (plan via `_sharded_plan`). Inside shard_map each device
    allgathers x over ICI and runs its tile range.

    Returns None when the matrix has no plan (caller uses the XLA local
    kernel instead).
    """
    import jax.numpy as jnp

    from ellspmv_tpu.ops import ell_pallas

    parts = _sharded_plan(sm)
    if parts is None:
        return None
    base = sm.base
    val_dt = np.dtype(np.asarray(base.values).dtype)
    n_dev = sm.mesh.devices.size
    wb, qb, lcol, vals_dev = parts.wb, parts.qb, parts.lcol, parts.vals
    d_ = parts.dims
    dd, T_local = d_.dd, d_.T_local
    S, G, KS, K128, nx128 = d_.S, d_.G, d_.KS, d_.K128, d_.nx128
    slope, lead, static, unroll = d_.slope, d_.lead, d_.static, d_.unroll
    mesh, axis = sm.mesh, sm.mesh.axis_names[0]
    m = d_.m
    interpret = jax.devices()[0].platform != "tpu"

    row_start = jnp.asarray(sm.boundaries[:-1], jnp.int32)
    has_diag = base.diag is not None

    def local(wb_blk, qb_blk, lcol_blk, *rest):
        if dd:
            vh_blk, vl_blk, start, *rest2 = rest
        else:
            v_blk, start, *rest2 = rest
        *maybe_diag, x_blk, y_blk = rest2
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)[:m]
        xp = jnp.pad(x_full, (lead * 128, nx128 * 128 - lead * 128 - m))
        if dd:
            xh = xp.astype(jnp.float32)
            xl = (xp - xh.astype(xp.dtype)).astype(jnp.float32)
            yh, yl = ell_pallas._run_dd(
                wb_blk, qb_blk, lcol_blk, vh_blk, vl_blk,
                xh.reshape(nx128, 128), xl.reshape(nx128, 128),
                S, G, KS, K128, T_local, slope=slope, unroll=unroll,
                fastdd=ell_pallas.fma_contraction_available(),
                static=static, ks_slot=d_.ks_slot, nacc=1,
                interpret=interpret)
            acc = (yh.reshape(-1).astype(jnp.float64)
                   + yl.reshape(-1).astype(jnp.float64))[:sm.block]
        else:
            x2d = xp.astype(jnp.float32).reshape(nx128, 128)
            acc = ell_pallas._run_f32(
                wb_blk, qb_blk, lcol_blk, v_blk, x2d,
                S, G, KS, K128, T_local, slope=slope, unroll=unroll,
                static=static, ks_slot=d_.ks_slot, nacc=1,
                interpret=interpret
            ).reshape(-1)[:sm.block].astype(y_blk.dtype)
        if maybe_diag:
            gi = start[0] + jnp.arange(sm.block, dtype=jnp.int32)
            xi = jnp.minimum(gi, max(m - 1, 0))
            acc = acc + maybe_diag[0] * x_full[xi]
        return acc + y_blk

    in_specs = ((P(axis), P(axis, None, None), P(axis, None, None, None))
                + (P(axis, None, None, None),) * len(vals_dev)
                + (P(axis),)
                + ((P(axis),) if has_diag else ())
                + (P(axis), P(axis)))
    mapped = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                           out_specs=P(axis), check_vma=False)
    args = (wb, qb, lcol) + vals_dev + (row_start,) + \
        ((base.diag,) if has_diag else ())

    @jax.jit
    def fn_physical(x_phys, y_phys, *op):
        return mapped(*op, x_phys, y_phys)

    def fn(_sm, x, y=None):
        x_phys = sm.to_physical_x(jnp.asarray(x, val_dt))
        if y is None:
            y_phys = jnp.zeros(sm.block * n_dev, val_dt)
        elif getattr(y, "shape", (0,))[0] == sm.block * n_dev:
            y_phys = y
        else:
            y_phys = sm.to_physical_y(jnp.asarray(y, val_dt))
        return sm.from_physical_y(fn_physical(x_phys, y_phys, *args))

    _attach_traceable(fn, sm, mapped, args, val_dt)
    return fn
