#!/usr/bin/env bash
# Example TPU runs (the run_a64fx.sh analogue: environment + invocations).
set -euo pipefail
cd "$(dirname "$0")/.."

# Optional tuning knobs (defaults are auto-detected/measured):
#   HBM_PEAK_GBPS=819            roofline denominator override
#   ELLSPMV_TPU_UNROLL_KS=16     static-unroll threshold for gather steps
#   ELLSPMV_TPU_LCOL16=1         int16 local columns when windows fit
#   ELLSPMV_TPU_NO_NATIVE=1      disable the C++ parser/packer
#   ELLSPMV_TPU_FASTDD=0         disable the FMA-probed fast double-double

# ELLPACK benchmark, 10 timed iterations, per-iteration metric lines:
python -m ellspmv_tpu.cli.ellspmv --repeat=10 --warmup=2 --sort-rows -v -q \
    examples/test.mtx

# CSR with the roofline summary and a derived-metric file:
python -m ellspmv_tpu.cli.csrspmv -q --papi-event-summary \
    --papi-event-file=examples/tpu_membw.metrics examples/test.mtx

# Conjugate-gradient solve (SPD matrix), RCM-reordered internally:
python -m ellspmv_tpu.cli.cgsolve -v --tol=1e-10 --reorder=rcm \
    examples/test_spd.mtx || true

# Full benchmark suite over the five BASELINE configs:
python -m ellspmv_tpu.bench.suite --quick
