from ellspmv_tpu.utils.timing import PhaseTimer
from ellspmv_tpu.utils.trace import device_trace

__all__ = ["PhaseTimer", "device_trace"]
