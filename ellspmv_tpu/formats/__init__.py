from ellspmv_tpu.formats.auto import auto_from_coo
from ellspmv_tpu.formats.coo import CooMatrix
from ellspmv_tpu.formats.csr import CsrMatrix, csr_from_coo
from ellspmv_tpu.formats.ell import EllMatrix, ell_from_coo
from ellspmv_tpu.formats.stream import StreamMatrix, stream_from_coo

__all__ = ["CooMatrix", "CsrMatrix", "EllMatrix", "StreamMatrix",
           "auto_from_coo", "csr_from_coo", "ell_from_coo",
           "stream_from_coo"]
