"""Kernel dispatch — the analogue of the reference's flag dispatch in main
(ellspmv.c:1834-1843, csrspmv.c:2851-2868), keyed on format and backend."""

from __future__ import annotations

from ellspmv_tpu.formats.csr import CsrMatrix
from ellspmv_tpu.formats.dia import DiaMatrix, dia_spmv
from ellspmv_tpu.formats.ell import EllMatrix
from ellspmv_tpu.formats.hybrid import HybridMatrix, hybrid_spmv
from ellspmv_tpu.formats.sell import SellMatrix, sell_spmv
from ellspmv_tpu.formats.stream import StreamMatrix, stream_spmv


def spmv(matrix, x, y=None, backend: str = "auto"):
    """y := A*x + y.

    backend: 'auto' | 'xla' | 'pallas'. 'auto' prefers the Pallas kernel on
    TPU when the matrix has a precomputed plan (or one can be built) and
    falls back to XLA.
    """
    if isinstance(matrix, DiaMatrix):
        return dia_spmv(matrix, x, y)   # gather-free; XLA streams it
    if isinstance(matrix, SellMatrix):
        return sell_spmv(matrix, x, y, backend=backend)
    if isinstance(matrix, HybridMatrix):
        return hybrid_spmv(matrix, x, y, backend=backend)
    if isinstance(matrix, StreamMatrix):
        return stream_spmv(matrix, x, y)
    if isinstance(matrix, EllMatrix):
        if backend in ("auto", "pallas"):
            from ellspmv_tpu.ops import ell_pallas
            if ell_pallas.supported(matrix, x):
                return ell_pallas.ell_spmv_pallas(matrix, x, y)
            if backend == "pallas":
                raise ValueError("pallas backend unsupported for this "
                                 "matrix/platform")
        from ellspmv_tpu.ops.ell_xla import ell_spmv_xla
        return ell_spmv_xla(matrix, x, y)
    if isinstance(matrix, CsrMatrix):
        if backend in ("auto", "pallas"):
            # On TPU the XLA segment-sum scatter is ~100x off; route
            # through the sliced-ELL repack whose buckets use the Pallas
            # kernel (csrgemvnz's different-schedule idea, csrspmv.c:1681).
            import jax as _jax
            if backend == "pallas" or (
                    _jax.devices()[0].platform == "tpu"
                    and not isinstance(matrix.values, _jax.core.Tracer)):
                from ellspmv_tpu.ops import csr_pallas
                return csr_pallas.csr_spmv_pallas(matrix, x, y)
        from ellspmv_tpu.ops.csr_xla import csr_spmv_xla
        return csr_spmv_xla(matrix, x, y)
    raise TypeError(f"unsupported matrix type {type(matrix)}")


def traceable_spmv(matrix, backend: str = "auto"):
    """Return (operand_pytree, fn) where ``fn(operand, x, y|None) -> y`` can
    be traced inside an outer jit with the matrix data passed as jit
    ARGUMENTS. Closing over a large matrix inside jit embeds its arrays as
    constants in the compiled program (hundreds of MB of HLO); benchmark
    loops and solvers use this instead."""
    import jax
    import jax.numpy as jnp

    if isinstance(matrix, EllMatrix) and backend in ("auto", "pallas"):
        from ellspmv_tpu.ops import ell_pallas
        on_tpu = jax.devices()[0].platform == "tpu"
        import os
        if on_tpu or os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET"):
            dp = ell_pallas.get_plan(matrix)
            if dp is not None:
                n, m = matrix.num_rows, matrix.num_columns
                val_dt = jnp.asarray(matrix.values).dtype
                diag = (None if matrix.diag is None
                        else jnp.asarray(matrix.diag)[:n])

                def fn(op, x, y=None):
                    dp_, diag_ = op
                    out = dp_(x)[:n].astype(val_dt)
                    if diag_ is not None:
                        # index built under trace, not an n-sized constant
                        xi = jnp.minimum(jnp.arange(n), max(m - 1, 0))
                        out = out + diag_ * x.astype(val_dt)[xi]
                    if y is not None:
                        out = out + y.astype(val_dt)
                    return out

                return (dp, diag), fn
        if backend == "pallas":
            raise ValueError("pallas backend unsupported for this "
                             "matrix/platform")
    if isinstance(matrix, StreamMatrix):
        # already a pytree whose arrays travel as jit arguments
        return matrix, lambda m, x, y=None: stream_spmv(m, x, y)
    if isinstance(matrix, HybridMatrix):
        hub_pair = (None if matrix.hub is None
                    else traceable_spmv(matrix.hub, backend=backend))
        rest_op, rest_fn = traceable_spmv(matrix.rest, backend=backend)
        hub_cols = (None if matrix.hub_cols is None
                    else jnp.asarray(matrix.hub_cols))

        def fn(op, x, y=None):
            hub_op, rest_op_, cols = op
            out = None
            if hub_op is not None:
                xh = jnp.take(x, cols, axis=0)
                out = hub_pair[1](hub_op, xh, None)
            out = rest_fn(rest_op_, x, out)
            if y is not None:
                out = out + y.astype(out.dtype)
            return out

        return ((None if hub_pair is None else hub_pair[0]), rest_op,
                hub_cols), fn
    if isinstance(matrix, SellMatrix):
        import numpy as _np

        if matrix.trivial_reassembly:
            # one bucket, natural order: no reassembly passes at all
            op0, fn0 = traceable_spmv(matrix.buckets[0], backend=backend)
            n = matrix.num_rows

            def fn_triv(op, x, y=None):
                out = fn0(op, x, None)[:n]
                if y is not None:
                    out = out + y.astype(out.dtype)
                return out

            return op0, fn_triv

        subs = [traceable_spmv(b, backend=backend) for b in matrix.buckets]
        sub_fns = [f for _, f in subs]
        order = jnp.asarray(_np.asarray(matrix.order))
        unperm = (None if matrix.row_unperm is None
                  else jnp.asarray(_np.asarray(matrix.row_unperm)))
        extra = (None if matrix.extra_rows is None
                 else jnp.asarray(_np.asarray(matrix.extra_rows)))
        R = matrix.slice_rows
        n = matrix.num_rows
        n_sub = (matrix.num_sub_rows if matrix.num_sub_rows is not None
                 else matrix.num_rows)

        def fn(op, x, y=None):
            sub_ops, tail, order_, unperm_, extra_ = op
            parts = [f(o, x, None).reshape(-1, R)
                     for f, o in zip(sub_fns, sub_ops)]
            tiles = jnp.concatenate(parts, axis=0)
            out = tiles[order_].reshape(-1)
            if tail is not None:                     # tail ids are padded
                from ellspmv_tpu.ops.csr_xla import csr_spmv_xla
                out = csr_spmv_xla(tail, x, out[:tail.num_rows])
            if unperm_ is not None:
                # index the padded sorted vector (group padding leaves
                # gap rows the unperm skips)
                out = out[unperm_]
            else:
                out = out[:n_sub]
            if extra_ is not None:   # long-row split re-aggregation
                out = out[:n] + jax.ops.segment_sum(
                    out[n:], extra_, num_segments=n,
                    indices_are_sorted=True)
            if y is not None:
                out = out + y.astype(out.dtype)
            return out

        return ([o for o, _ in subs], matrix.tail, order, unperm,
                extra), fn
    if isinstance(matrix, CsrMatrix):
        import jax as _jax
        if backend in ("auto", "pallas") and (
                backend == "pallas"
                or _jax.devices()[0].platform == "tpu"):
            from ellspmv_tpu.ops.csr_pallas import _to_sell
            sm = _to_sell(matrix)
            op, fn0 = traceable_spmv(sm, backend=backend)
            diag = (None if matrix.diag is None
                    else jnp.asarray(matrix.diag))
            k = min(matrix.num_rows, matrix.num_columns)

            def fn(op_, x, y=None):
                o, d = op_
                out = fn0(o, x, None)
                if d is not None:
                    out = out.at[:k].add(d[:k] * x.astype(out.dtype)[:k])
                if y is not None:
                    out = out + y.astype(out.dtype)
                return out

            return (op, diag), fn
    if isinstance(matrix, DiaMatrix):
        from ellspmv_tpu.ops import dia_pallas
        dp = (dia_pallas.get_plan(matrix)
              if dia_pallas.supported(matrix) else None)
        if dp is not None:
            val_dt = jnp.asarray(matrix.data).dtype

            def fn_dia(op, x, y=None):
                out = op(x).astype(val_dt)
                if y is not None:
                    out = out + y.astype(val_dt)
                return out

            return dp, fn_dia
    # XLA paths: the matrix containers are pytrees already
    if isinstance(matrix, (EllMatrix, CsrMatrix, DiaMatrix)):
        return matrix, lambda m, x, y=None: spmv(m, x, y, backend="xla")
    raise TypeError(f"no traceable spmv for {type(matrix)}")


def traceable_spmv_dd(matrix):
    """Return (operand, fn) where ``fn(op, x: DDVec, y: DDVec|None) ->
    DDVec`` runs the fp64 SpMV entirely on double-double (f32 hi/lo)
    vector pairs — this framework's native f64 carrier (the same
    representation `models.solvers.cg_dd` keeps end-to-end, and the one
    the dd kernels use internally). Iterating `y := A*x + y` through this
    form moves exactly the same bytes per element as f64 (a pair is
    8 B/elem) but never crosses the emulated-f64 boundary between
    iterations. Returns None when the matrix has no dd Pallas plan."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    on_tpu = (jax.devices()[0].platform == "tpu"
              or bool(os.environ.get("ELLSPMV_TPU_PALLAS_INTERPRET")))
    if not on_tpu:
        return None
    from ellspmv_tpu.ops.dd_vec import DDVec, dd_add, dd_mul

    def _pair_const(arr):
        """f64 host array -> (hi, lo) f32 device pair (split once)."""
        a = np.asarray(arr, np.float64)
        hi = a.astype(np.float32)
        return (jnp.asarray(hi),
                jnp.asarray((a - hi.astype(np.float64)).astype(np.float32)))

    if isinstance(matrix, EllMatrix):
        vals = matrix.values
        if (isinstance(vals, jax.core.Tracer)
                or np.asarray(vals).dtype != np.float64):
            return None
        from ellspmv_tpu.ops import ell_pallas
        dp = ell_pallas.get_plan(matrix)
        if dp is None or not dp.dd:
            return None
        n, m = matrix.num_rows, matrix.num_columns
        if matrix.diag is not None and min(n, m) != n:
            return None     # epilogue below assumes a full-length diagonal
        diag_pair = (None if matrix.diag is None
                     else _pair_const(np.asarray(matrix.diag)[:n]))

        def fn_ell(op, x, y=None):
            dp_, dpair = op
            yh, yl = dp_.apply_pair(x.hi, x.lo)
            out = DDVec(yh[:n], yl[:n])
            if dpair is not None:
                # split-diagonal epilogue d[i]*x[i] (ellspmv.c:1177) in dd
                xi = jnp.minimum(jnp.arange(n), max(m - 1, 0))
                out = dd_add(out, dd_mul(DDVec(*dpair),
                                         DDVec(x.hi[xi], x.lo[xi])))
            return out if y is None else dd_add(out, y)

        return (dp, diag_pair), fn_ell

    if isinstance(matrix, SellMatrix):
        # pair form only for the trivial single-bucket layout (the banded
        # CSR fast path); the reassembling layouts would have to gather
        # both halves — possible, but their XLA row gathers dominate anyway
        if not matrix.trivial_reassembly:
            return None
        sub = traceable_spmv_dd(matrix.buckets[0])
        if sub is None:
            return None
        op0, f0 = sub
        n = matrix.num_rows

        def fn_sell(op, x, y=None):
            out = f0(op, x, None)
            out = DDVec(out.hi[:n], out.lo[:n])
            return out if y is None else dd_add(out, y)

        return op0, fn_sell

    if isinstance(matrix, CsrMatrix):
        vals = matrix.values
        if (isinstance(vals, jax.core.Tracer)
                or np.asarray(vals).dtype != np.float64):
            return None
        n, m = matrix.num_rows, matrix.num_columns
        if matrix.diag is not None and min(n, m) != n:
            return None
        from ellspmv_tpu.ops.csr_pallas import _to_sell
        sub = traceable_spmv_dd(_to_sell(matrix))
        if sub is None:
            return None
        op0, f0 = sub
        diag_pair = (None if matrix.diag is None
                     else _pair_const(np.asarray(matrix.diag)[:n]))

        def fn_csr(op, x, y=None):
            op0_, dpair = op
            out = f0(op0_, x, None)
            if dpair is not None:
                # csrgemvsd's diagonal epilogue (csrspmv.c:1598-1629) in dd
                xi = jnp.minimum(jnp.arange(n), max(m - 1, 0))
                out = dd_add(out, dd_mul(DDVec(*dpair),
                                         DDVec(x.hi[xi], x.lo[xi])))
            return out if y is None else dd_add(out, y)

        return (op0, diag_pair), fn_csr

    if isinstance(matrix, DiaMatrix):
        data = matrix.data
        if (isinstance(data, jax.core.Tracer)
                or np.asarray(data).dtype != np.float64):
            return None
        from ellspmv_tpu.ops import dia_pallas
        dp = (dia_pallas.get_plan(matrix)
              if dia_pallas.supported(matrix) else None)
        if dp is None or not dp.cfg.get("dd"):
            return None

        def fn_dia(op, x, y=None):
            yh, yl = op.apply_pair(x.hi, x.lo)
            out = DDVec(yh, yl)
            return out if y is None else dd_add(out, y)

        return dp, fn_dia

    from ellspmv_tpu.formats.stream import StreamMatrix
    if isinstance(matrix, StreamMatrix):
        # the stream pipeline is dd-native end-to-end (f32 product pairs
        # through the router and run-realign sums); the pair form skips
        # the emulated-f64 merge/split/accumulate glue that stream_spmv
        # pays per call — inside the chained timing loop those XLA
        # emulated-f64 vector passes are pure overhead on top of the
        # kernels being measured
        if not matrix.dd or matrix.prod is None:
            return None
        from ellspmv_tpu.formats.stream import stream_spmv  # noqa: F401
        from ellspmv_tpu.ops.stream_sum import apply_stream_sum
        interpret = (jax.devices()[0].platform != "tpu"
                     or bool(os.environ.get(
                         "ELLSPMV_TPU_PALLAS_INTERPRET")))
        n, m = matrix.num_rows, matrix.num_columns
        diag_pair = None
        if matrix.diag is not None:
            diag_pair = _pair_const(np.asarray(matrix.diag)[:n])

        def fn_stream(op, x, y=None):
            sm, dpair = op
            ph, plo = sm.prod.apply_pair(x.hi, x.lo)
            yh, yl = apply_stream_sum(sm.ddsum, ph, plo,
                                      interpret=interpret)
            out = DDVec(yh[:n], yl[:n])
            if dpair is not None:
                xi = jnp.minimum(jnp.arange(n), max(m - 1, 0))
                out = dd_add(out, dd_mul(DDVec(*dpair),
                                         DDVec(x.hi[xi], x.lo[xi])))
            return out if y is None else dd_add(out, y)

        return (matrix, diag_pair), fn_stream

    return None
