"""Does index ORDER change TPU scatter cost? (round-4 experiment)

The two per-group scatters are 44% of the P=1 chunk time (7.8 ns/event
pair). If XLA's TPU scatter is memory-locality-bound, host-side
pixel-sorting of each group's winner lanes could cut it; if it is
per-update serialization, order won't matter. Amortized timing (the
round-4 profiling lesson: fence latency ~3 ms, CSE needs distinct
inputs).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

W = H = 320
M = 131072
STEPS = 8
AMORT = 8


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(AMORT):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / AMORT)
    return best


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    rng = np.random.default_rng(0)
    xs = rng.integers(0, W, size=(STEPS, M), dtype=np.int32)
    ys = rng.integers(0, H, size=(STEPS, M), dtype=np.int32)
    ts = np.sort(rng.integers(1, 1 << 20, size=(STEPS, M)), axis=1) \
        .astype(np.int32)

    # pixel-sorted copies of the same updates
    flat = xs.astype(np.int64) * H + ys
    order = np.argsort(flat, axis=1, kind="stable")
    xs_s = np.take_along_axis(xs, order, 1)
    ys_s = np.take_along_axis(ys, order, 1)
    ts_s = np.take_along_axis(ts, order, 1)

    @jax.jit
    def scat(x, y, t):
        def body(surf, xs_):
            x, y, t = xs_
            surf = surf.at[x, y].set(t, mode="drop")
            return surf, surf[0, 0]
        surf0 = jnp.zeros((W, H), jnp.int32)
        surf, o = jax.lax.scan(body, surf0, (x, y, t))
        return surf

    for name, (a, b, c) in (("event-order", (xs, ys, ts)),
                            ("pixel-sorted", (xs_s, ys_s, ts_s))):
        dt = timeit(scat, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        print(json.dumps({"order": name,
                          "ns_per_update": round(dt / (STEPS * M) * 1e9, 2)}),
              flush=True)

    # flat-index single-axis scatter (decode on device) vs 2-D
    fl = (xs.astype(np.int32) * H + ys)
    fl_s = np.sort(fl, axis=1, kind="stable")

    @jax.jit
    def scat_flat(f, t):
        def body(surf, xs_):
            f, t = xs_
            surf = surf.at[f].set(t, mode="drop")
            return surf, surf[0]
        surf0 = jnp.zeros(W * H, jnp.int32)
        surf, o = jax.lax.scan(body, surf0, (f, t))
        return surf

    for name, (a, c) in (("flat-event-order", (fl, ts)),
                         ("flat-pixel-sorted", (fl_s, ts))):
        dt = timeit(scat_flat, jnp.asarray(a), jnp.asarray(c))
        print(json.dumps({"order": name,
                          "ns_per_update": round(dt / (STEPS * M) * 1e9, 2)}),
              flush=True)
    print(json.dumps({"done": True}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
