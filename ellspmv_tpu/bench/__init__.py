from ellspmv_tpu.bench.harness import BenchResult, SpmvMetrics, benchmark_spmv

__all__ = ["BenchResult", "SpmvMetrics", "benchmark_spmv"]
