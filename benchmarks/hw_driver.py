"""Probe-gated hardware measurement driver (round-3 pattern).

The remote TPU tunnel/compile service wedges for 30-60 minute stretches
(trivial jits hang); running benchmarks directly loses the work to
timeouts. This driver probes with a subprocess trivial-jit before each
stage, waits out wedges (3-minute retry loop), runs each stage in its own
subprocess with a timeout, and appends results to the log. Customize the
stage list in main() (the round-3 stages are kept as the example).
Stage scripts referenced under /tmp were session-local; point the
entries at benchmarks/ scripts or inline equivalents."""
import os
import subprocess
import sys
import time

LOG = "/root/repo/benchmarks/r3_hw_log.txt"
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
                         .splitlines()[-12:])
        log(f"{name}: rc={r.returncode}\n{tail}")
        if r.returncode == 0:
            return True
    return False


def main():
    which = sys.argv[1:] or ["headline", "banded", "pair", "config3",
                             "bf16", "denserows"]
    py = sys.executable
    if "headline" in which:
        stage("headline-mesh-auto", [py, "bench.py"], timeout=2400)
    if "banded" in which:
        stage("banded-auto(HEAD)", [py, "bench.py"],
              env={"BENCH_GEN": "banded"}, timeout=2400)
    if "pair" in which:
        stage("banded-ell-block32", [py, "bench.py"],
              env={"BENCH_GEN": "banded", "BENCH_FORMAT": "ell",
                   "ELLSPMV_TPU_FORCE_REBUCKET": "block:32"}, timeout=2400)
        stage("banded-ell-pair", [py, "bench.py"],
              env={"BENCH_GEN": "banded", "BENCH_FORMAT": "ell",
                   "ELLSPMV_TPU_FORCE_REBUCKET": "pair"}, timeout=2400)
    if "config3" in which:
        stage("config3-stream", [py, "/tmp/r3_config3.py"], timeout=2400)
        stage("config3-chunk16", [py, "/tmp/r3_config3.py"],
              env={"ELLSPMV_TPU_CHUNK": "16"}, timeout=2400)
        stage("config3-chunk32", [py, "/tmp/r3_config3.py"],
              env={"ELLSPMV_TPU_CHUNK": "32"}, timeout=2400)
    if "bf16" in which:
        stage("bf16-poisson-banded", [py, "/tmp/r3_bf16.py"], timeout=2400)
    if "denserows" in which:
        stage("dense-rows-compare",
              [py, "benchmarks/dense_rows_compare.py"], timeout=3600)
    log("driver done")


if __name__ == "__main__":
    main()
