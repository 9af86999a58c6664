"""`cgsolve` — conjugate-gradient solve over the SpMV kernels.

The reference has no solver, but its y-accumulation contract exists so runs
can be chained (SURVEY §5 checkpoint/resume); the driver's north-star
config asks for a CG loop over the row-sharded SpMV (BASELINE configs[4]).
This CLI solves A x = b for SPD A:

    cgsolve [OPTION..] A [b]

Options mirror the SpMV CLIs where they apply (gzip, precision, devices,
reorder) plus --tol and --maxiter. Prints x as a Matrix Market vector.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ellspmv_tpu.cli.common import CliError, _split_eq


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    program = "cgsolve"
    gzip_flag = False
    tol = 1e-8
    maxiter = 1000
    precision = "float64"
    devices = 1
    reorder = "none"
    verbose = 0
    quiet = False
    positional = []
    i = 0
    try:
        while i < len(argv):
            arg = argv[i]
            if not arg.startswith("-"):
                positional.append(arg)
            elif arg in ("-z", "--gzip", "--gunzip", "--ungzip"):
                gzip_flag = True
            elif arg in ("-q", "--quiet"):
                quiet = True
            elif arg in ("-v", "--verbose"):
                verbose += 1
            elif (v := _split_eq(arg, "--tol")) is not False:
                tol = float(v if v is not None else argv[(i := i + 1)])
            elif (v := _split_eq(arg, "--maxiter")) is not False:
                maxiter = int(v if v is not None else argv[(i := i + 1)])
            elif (v := _split_eq(arg, "--precision")) is not False:
                precision = v if v is not None else argv[(i := i + 1)]
            elif (v := _split_eq(arg, "--devices")) is not False:
                devices = int(v if v is not None else argv[(i := i + 1)])
            elif (v := _split_eq(arg, "--reorder")) is not False:
                reorder = v if v is not None else argv[(i := i + 1)]
            elif arg in ("-h", "--help"):
                sys.stdout.write(__doc__)
                return 0
            else:
                raise CliError(f"unrecognized option '{arg}'")
            i += 1
        if not positional:
            sys.stderr.write(f"Usage: {program} [OPTION..] A [b]\n")
            return 1
    except (CliError, ValueError, IndexError) as e:
        sys.stderr.write(f"{program}: {e}\n")
        return 1

    import jax

    if precision == "float64":
        jax.config.update("jax_enable_x64", True)

    from ellspmv_tpu.formats.ell import ell_from_coo
    from ellspmv_tpu.io.mtx import read_matrix, read_vector, write_vector
    from ellspmv_tpu.models.solvers import cg
    from ellspmv_tpu.ops import spmv

    try:
        coo = read_matrix(positional[0], gzipped=gzip_flag or None)
    except Exception as e:
        sys.stderr.write(f"{program}: {positional[0]}: {e}\n")
        return 1
    if coo.num_rows != coo.num_columns:
        sys.stderr.write(f"{program}: CG needs a square (SPD) matrix\n")
        return 1
    n = coo.num_rows
    if len(positional) > 1:
        b = read_vector(positional[1], gzipped=gzip_flag or None)
        if len(b) != n:
            sys.stderr.write(f"{program}: b has length {len(b)}, "
                             f"expected {n}\n")
            return 1
    else:
        b = np.ones(n)
    b = b.astype(precision)

    rm = None
    if reorder == "rcm":
        from ellspmv_tpu.models.reorder import reorder_rcm
        rm = reorder_rcm(coo)
        coo = rm.coo
        b = rm.permute_x(b)

    ell = ell_from_coo(coo, sort_rows=True, value_dtype=precision)

    if devices > 1:
        from ellspmv_tpu.parallel.spmv import shard_matrix, sharded_spmv_fn
        res = None
        sm_dd = None
        if precision == "float64":
            # distributed dd-vector CG: the whole solve inside one
            # shard_map; vectors stay f32 (hi, lo) pairs on every device.
            # Only plan-eligibility failures (no Pallas plan, bad layout)
            # fall back to the generic path; errors from the solve itself
            # propagate rather than masking solver bugs.
            from ellspmv_tpu.parallel.solver import (cg_dd_ineligible,
                                                     cg_dd_sharded)
            reason = None
            try:
                sm_dd = shard_matrix(ell, devices, x_layout="physical")
            except ValueError as e:
                reason = str(e)
            if sm_dd is not None:
                reason = cg_dd_ineligible(sm_dd)
            if reason is not None:
                sm_dd = None
                if verbose:
                    sys.stderr.write(
                        f"{program}: note: dd-sharded CG unavailable "
                        f"({reason}); using generic CG\n")
        if sm_dd is not None:
            t0 = time.perf_counter()
            res = cg_dd_sharded(sm_dd, jax.numpy.asarray(b), tol=tol,
                                maxiter=maxiter)
        if res is None:
            try:
                sm = shard_matrix(ell, devices)
            except ValueError as e:
                sys.stderr.write(f"{program}: {e}\n")
                return 1
            fn_s = sharded_spmv_fn(sm)
            matvec = lambda v: fn_s(sm, v)

            t0 = time.perf_counter()
            res = cg(matvec, jax.numpy.asarray(b), tol=tol,
                     maxiter=maxiter)
    else:
        from ellspmv_tpu.ops.dispatch import traceable_spmv
        from ellspmv_tpu.ops.ell_pallas import DevicePlan
        mat = ell.device_put()
        operand, fn = traceable_spmv(mat)
        dd_plan = (isinstance(operand, tuple)
                   and isinstance(operand[0], DevicePlan)
                   and operand[0].dd and operand[1] is None
                   and precision == "float64")
        t0 = time.perf_counter()
        if dd_plan:
            # double-double-vector CG: every loop op at f32 speed
            from ellspmv_tpu.models.solvers import cg_dd
            res = cg_dd(operand[0], jax.numpy.asarray(b), tol=tol,
                        maxiter=maxiter)
        else:
            res = cg(lambda op, v: fn(op, v), jax.numpy.asarray(b),
                     tol=tol, maxiter=maxiter, operand=operand)
    x = np.asarray(res.x, np.float64)
    dt = time.perf_counter() - t0
    if verbose:
        sys.stderr.write(
            f"cg: {int(res.iterations)} iterations, residual "
            f"{float(res.residual_norm):.3e}, {dt:.3f} seconds\n")
    if rm is not None:
        x = rm.unpermute_y(x)
    if not quiet:
        write_vector(sys.stdout, x)
    return 0 if float(res.residual_norm) <= tol * np.linalg.norm(b) * 10 \
        else 2


if __name__ == "__main__":
    raise SystemExit(main())
