"""Global configuration: dtypes, index-width selection, hardware tables.

The reference selects its index type at compile time via ``IDXTYPEWIDTH``
(ellspmv.c:112-130): 32-bit, 64-bit, or plain ``int``. Here the analogue is a
runtime dtype choice with automatic promotion — int32 by default (TPU gathers
are much faster with 32-bit indices), int64 when the matrix dimensions or
nonzero count demand it.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# Largest value an int32 index may take. Mirrors the reference's idx_t bounds
# checks (ellspmv.c:123 IDX_T_MAX).
_INT32_MAX = np.iinfo(np.int32).max


def default_index_dtype() -> np.dtype:
    """Default index dtype (the reference's default is plain ``int``,
    ellspmv.c:126-130 — 32-bit on every platform it targets)."""
    return np.dtype(np.int32)


def select_index_dtype(num_rows: int, num_columns: int, num_nonzeros: int,
                       requested: str | np.dtype | None = None) -> np.dtype:
    """Pick an index dtype, honoring an explicit request.

    Automatic promotion to int64 when any dimension or the nonzero count
    exceeds int32 range — the runtime analogue of rebuilding the reference
    with ``IDXTYPEWIDTH=64`` (README:25-30).
    """
    if requested is not None:
        dt = np.dtype(requested)
        if dt not in (np.dtype(np.int32), np.dtype(np.int64)):
            raise ValueError(f"index dtype must be int32 or int64, got {dt}")
        if dt == np.dtype(np.int32):
            if max(num_rows, num_columns, num_nonzeros) > _INT32_MAX:
                raise OverflowError(
                    "matrix too large for int32 indices; use int64 "
                    "(the reference would likewise fail unless rebuilt with "
                    "IDXTYPEWIDTH=64)")
        return dt
    if max(num_rows, num_columns, num_nonzeros) > _INT32_MAX:
        return np.dtype(np.int64)
    return default_index_dtype()


# Per-chip HBM peak bandwidth in bytes/s, used by the roofline reporting in
# bench/ (replaces the reference's PAPI-derived memory bandwidth metrics,
# papi_util_a64fx_memdp.txt:14-29). Values are vendor-published theoretical
# peaks; `bench.stream.measure_peak_bandwidth()` measures the achievable one.
HBM_PEAK_BYTES_PER_S = {
    "TPU v2": 700e9,
    "TPU v3": 900e9,
    "TPU v4": 1228e9,
    "TPU v4 lite": 614e9,
    "TPU v5 lite": 819e9,   # v5e
    "TPU v5": 2765e9,       # v5p
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,  # v6e / Trillium
    "TPU v6e": 1640e9,
    "cpu": 50e9,            # placeholder for host-platform test runs
}


def hbm_peak_bytes_per_s(device=None) -> float:
    """Theoretical per-chip HBM peak for `device` (default: first device).

    Overridable with the HBM_PEAK_GBPS environment variable so benchmark
    rooflines can be pinned on unknown hardware.
    """
    env = os.environ.get("HBM_PEAK_GBPS")
    if env:
        return float(env) * 1e9
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for key, val in HBM_PEAK_BYTES_PER_S.items():
        if kind.lower().startswith(key.lower()):
            return val
    return HBM_PEAK_BYTES_PER_S.get(kind, 819e9)


@dataclasses.dataclass
class Config:
    """Runtime configuration shared by conversions, kernels and CLIs.

    Mirrors the reference's knob surface: `separate_diagonal` and `sort_rows`
    are the two conversion flags (ellspmv.c:219-311 help text);
    `value_dtype`/`index_dtype` replace the compile-time precision and
    IDXTYPEWIDTH choices.
    """

    value_dtype: str = "float64"
    index_dtype: str | None = None     # None = auto (int32 unless too large)
    separate_diagonal: bool = False
    sort_rows: bool = False
    # Pad row counts to a multiple of this so every kernel tile is full.
    row_tile: int = 8

    def np_value_dtype(self) -> np.dtype:
        return np.dtype(self.value_dtype)
