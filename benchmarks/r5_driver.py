"""Round-5 probe-gated hardware driver (pattern: hw_driver.py).

Stages (run all or name a subset on the command line):
  config3   — 1M-row power-law regression check (unchunked at this scale)
  chunk1m   — 1M-row with FORCED 4-way column chunking: validates the
              chunked kernels on hardware and prices the merge overhead
              directly against the unchunked run
  stream10x — the 10M-row / 64.9M-nnz scale deliverable (VERDICT r4
              item 1: <= 45 ms, oracle <= 2e-14)
"""
import os
import subprocess
import sys
import time

LOG = "/root/repo/benchmarks/r5_hw_log.txt"
REPO = "/root/repo"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe(timeout=150):
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "print(np.asarray(jax.jit(lambda v: v*2+1)(jnp.ones(8)))[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           capture_output=True, timeout=timeout)
        return r.returncode == 0 and b"3.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_tpu(max_wait=7200):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if probe():
            log("probe: TPU alive")
            return True
        log("probe: TPU wedged; waiting 180 s")
        time.sleep(180)
    return False


def stage(name, cmd, env=None, timeout=1800, retries=2):
    for attempt in range(retries + 1):
        if not wait_tpu():
            log(f"{name}: giving up (TPU never came back)")
            return False
        e = dict(os.environ)
        e.setdefault("JAX_COMPILATION_CACHE_DIR",
                     os.path.expanduser("~/.jax_cache"))
        if env:
            e.update(env)
        log(f"{name}: start (attempt {attempt + 1}) env={env or {}}")
        try:
            r = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True,
                               timeout=timeout, text=True)
        except subprocess.TimeoutExpired:
            log(f"{name}: TIMEOUT after {timeout}s")
            continue
        tail = "\n".join((r.stdout + "\n" + r.stderr).strip()
                         .splitlines()[-16:])
        log(f"{name}: rc={r.returncode}\n{tail}")
        if r.returncode == 0:
            return True
    return False


def main():
    which = sys.argv[1:] or ["config3", "chunk1m", "stream10x"]
    py = sys.executable
    bs = "benchmarks/bench_stream.py"
    if "config3" in which:
        stage("config3-1M-regression", [py, bs, "--n", "1000000"],
              timeout=2400)
    if "chunk1m" in which:
        stage("config3-1M-chunked4", [py, bs, "--n", "1000000"],
              env={"ELLSPMV_TPU_STREAM_CHUNKS": "4"}, timeout=2400)
    if "stream10x" in which:
        stage("stream10x-chunked", [py, bs, "--n", "10000000"],
              timeout=5400, retries=1)
    if "microbench" in which:
        stage("microbench-gather16",
              [py, "benchmarks/microbench_ops.py",
               "--ops", "gather,gather16,select16,select,dd_fma"],
              timeout=2400)
    if "ablate-final" in which:
        stage("config3-skip-final", [py, bs, "--n", "1000000",
                                     "--no-oracle"],
              env={"ELLSPMV_TPU_SKIP_FINAL": "1"}, timeout=2400)
    if "convtrace" in which:
        stage("config3-convert-trace", [py, bs, "--n", "1000000",
                                        "--repeat", "1", "--no-oracle"],
              env={"ELLSPMV_TPU_CONVERT_TRACE": "1"}, timeout=2400)
    if "refscale" in which:
        stage("reference-scale-114M",
              [py, "benchmarks/reference_scale.py"], timeout=7200,
              retries=1)
    if "denserows" in which:
        stage("dense-rows-compare",
              [py, "benchmarks/dense_rows_compare.py"], timeout=3600)
    if "stages10x" in which:
        stage("stream10x-stages", [py, bs, "--n", "10000000",
                                   "--no-oracle", "--stages"],
              timeout=5400, retries=1)
    if "stages1m" in which:
        stage("stream1m-stages", [py, bs, "--n", "1000000",
                                  "--no-oracle", "--stages"],
              timeout=2400)
    if "take" in which:
        stage("microbench-take", [py, "benchmarks/microbench_take.py"],
              timeout=2400)
    if "midscale" in which:
        # power-law 21M nnz: above the 16M cells gate — direct cells
        # (take-free) vs general-router A/B at mid scale
        stage("midscale21M-cells", [py, bs, "--n", "3000000"],
              timeout=3600)
        stage("midscale21M-nocells", [py, bs, "--n", "3000000"],
              env={"ELLSPMV_TPU_NO_CELLS": "1"}, timeout=3600)
    if "uniform" in which:
        stage("uniform21M-cells", [py, bs, "--uniform",
                                   "--n", "3000000", "--avg", "7"],
              timeout=3600)
        stage("uniform21M-nocells", [py, bs, "--uniform",
                                     "--n", "3000000", "--avg", "7"],
              env={"ELLSPMV_TPU_NO_CELLS": "1"}, timeout=3600)
    log("driver done")


if __name__ == "__main__":
    main()
