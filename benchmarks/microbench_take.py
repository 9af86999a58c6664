"""Row-gather (jnp.take axis=0) rate vs operand size, index pattern and
split granularity.

The route's take stage (ops/permute.py apply_permute) ran at HBM speed at
the 1M config (0.27 ms for ~205 MB moved) but measured 24.9 ms at the
10x-scale stream (2.1 GB -> 84 GB/s, a ~9x per-byte cliff;
r5_hw_log stream10x-stages). This isolates the regime: source height
128K..1M rows of (., 128) f32, ascending-with-jitter vs random index
patterns, one whole take vs the same take split into source-window
slices.

Usage: python benchmarks/microbench_take.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_take(src, idx, iters):
    def body(_, s):
        t = jnp.take(s, idx, axis=0)
        # feed back so iterations serialize (scaled to avoid overflow)
        return s + t[: s.shape[0]] * jnp.float32(1e-30)
    return jax.lax.fori_loop(0, iters, body, src)


@functools.partial(jax.jit, static_argnames=("iters", "n_split"))
def chain_take_split(src, idx, iters, n_split):
    """Same gather, but as n_split takes each reading one source window
    (indices pre-bucketed by window; here idx is already window-local
    ascending so a plain slice split is representative)."""
    n = src.shape[0]
    w = -(-n // n_split)

    def body(_, s):
        outs = []
        for k in range(n_split):
            lo = k * w
            hi = min((k + 1) * w, n)
            sl = jax.lax.slice_in_dim(s, lo, hi, axis=0)
            il = jax.lax.slice_in_dim(idx, lo, hi, axis=0) - lo
            outs.append(jnp.take(sl, jnp.maximum(il, 0), axis=0))
        t = jnp.concatenate(outs, axis=0)
        return s + t[: s.shape[0]] * jnp.float32(1e-30)
    return jax.lax.fori_loop(0, iters, body, src)


def measure(fn, src, idx, lo=2, hi=14, **kw):
    _sync(fn(src, idx, iters=lo, **kw))
    _sync(fn(src, idx, iters=hi, **kw))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(fn(src, idx, iters=lo, **kw))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter(); _sync(fn(src, idx, iters=hi, **kw))
        th = time.perf_counter() - t0
        slopes.append(max((th - tl) / (hi - lo), 1e-9))
    slopes.sort()
    return slopes[1]


def main():
    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind})", flush=True)
    rng = np.random.RandomState(0)
    for n_rows in (131_072, 524_288, 1_048_576):
        src = jnp.asarray(rng.rand(n_rows, 128).astype(np.float32))
        mb = n_rows * 128 * 4 / 1e6
        # ascending with local jitter (the route take's gsrc shape)
        asc = np.minimum(np.arange(n_rows)
                         + rng.randint(0, 256, n_rows), n_rows - 1)
        rnd = rng.randint(0, n_rows, n_rows)
        for name, idx in (("asc", asc), ("rnd", rnd)):
            t = measure(chain_take, src, jnp.asarray(idx.astype(np.int32)))
            gbs = 2 * mb / 1e3 / t
            print(f"take {n_rows:>9,} rows ({mb:6.0f} MB) {name}: "
                  f"{t * 1e3:8.3f} ms  {gbs:6.1f} GB/s", flush=True)
        # split take, window-local ascending indices
        for n_split in (8, 16):
            w = -(-n_rows // n_split)
            loc = (np.arange(n_rows) % w) + (np.arange(n_rows) // w) * w
            loc = np.minimum(loc + rng.randint(0, 64, n_rows) % w,
                             n_rows - 1)
            t = measure(chain_take_split, src,
                        jnp.asarray(loc.astype(np.int32)),
                        n_split=n_split)
            gbs = 2 * mb / 1e3 / t
            print(f"take {n_rows:>9,} rows ({mb:6.0f} MB) "
                  f"split{n_split}: {t * 1e3:8.3f} ms  {gbs:6.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
