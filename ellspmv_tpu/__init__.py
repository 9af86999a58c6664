"""ellspmv_tpu — a TPU-native sparse matrix–vector multiplication framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
C/OpenMP programs ``ellspmv``/``csrspmv`` (jamtrott/ellspmv): a Matrix Market
loader (incl. gzip, real/integer/pattern fields, general/symmetric), COO→ELL
and COO→CSR conversion with diagonal splitting and per-row column sorting,
``y := A*x + y`` SpMV kernels, a benchmark harness with the reference's exact
flop/byte accounting, and a row-sharded multi-chip path.

The architecture is TPU-first, not a port:

- hot kernels are Pallas (Mosaic) kernels built around the TPU's 128-lane
  dynamic gather, with x staged through VMEM windows (the TPU analogue of the
  reference's A64FX sector-cache tuning, ellspmv.c:1737-1743);
- fp64 on TPU is double-double (two f32) arithmetic, matching XLA's own f64
  emulation fidelity;
- multi-chip parallelism is a `jax.sharding.Mesh` + `shard_map` row sharding
  with an `all_gather` of x over ICI (the reference's only parallelism is
  OpenMP threads, csrspmv.c:2834-2837 — the mesh is its scaling analogue).
"""

from ellspmv_tpu.config import Config, default_index_dtype, select_index_dtype
from ellspmv_tpu.formats.auto import auto_from_coo
from ellspmv_tpu.formats.coo import CooMatrix
from ellspmv_tpu.formats.ell import EllMatrix, ell_from_coo
from ellspmv_tpu.formats.csr import CsrMatrix, csr_from_coo
from ellspmv_tpu.formats.stream import StreamMatrix, stream_from_coo
from ellspmv_tpu.io.mtx import (
    MtxHeader,
    read_matrix,
    read_vector,
    write_vector,
)
from ellspmv_tpu.ops import spmv

__version__ = "0.1.0"

__all__ = [
    "Config",
    "CooMatrix",
    "CsrMatrix",
    "EllMatrix",
    "MtxHeader",
    "StreamMatrix",
    "auto_from_coo",
    "csr_from_coo",
    "default_index_dtype",
    "ell_from_coo",
    "read_matrix",
    "read_vector",
    "select_index_dtype",
    "spmv",
    "stream_from_coo",
    "write_vector",
]
