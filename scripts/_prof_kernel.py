"""Isolated Pallas kernel timing on the real chip (CSE-proof).

Feeds DISTINCT inputs per scan step (the first profile run's CSE lesson)
and amortizes dispatch latency over AMORT calls. FARMS_PROF_OLD=1 forces
the pre-cached local kernel for comparison.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from farms_tpu.config import FlowConfig
from farms_tpu.ops.pallas import kernels as pk
from farms_tpu.ops.dense_flow import dense_aperture, dense_local_flow

W = H = 320
STEPS = 16
AMORT = 6


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
    if os.environ.get("FARMS_PROF_OLD"):
        pk._local_flow_kernel_cached = pk._local_flow_kernel
        tag = "old"
    else:
        tag = "cached"
    cfg = FlowConfig(width=W, height=H, chunk_size=1024)
    rng = np.random.default_rng(0)
    Wa, Ha = cfg.array_width, cfg.array_height
    pres = jnp.asarray(rng.integers(1, 1 << 20, (STEPS, Wa, Ha),
                                    dtype=np.int32))
    posts = pres + jnp.asarray(
        rng.integers(0, 2000, (STEPS, Wa, Ha), dtype=np.int32))
    fls = jnp.asarray((rng.random((STEPS, Wa, Ha)) *
                       (rng.random((STEPS, Wa, Ha)) < 0.3))
                      .astype(np.float32))
    fvs = jnp.asarray(rng.standard_normal((STEPS, Wa, Ha))
                      .astype(np.float32))

    @jax.jit
    def local_scan(pres, posts):
        def body(acc, xs):
            tp, tq = xs
            vx, vy, gate, ln, th = pk.local_flow_pallas(tq, tp, cfg)
            return acc + vx[0, 0] + ln[5, 5], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (posts, pres))
        return acc

    dt = timeit(local_scan, pres, posts)
    print(json.dumps({"stage": f"local_pallas_{tag}",
                      "us_per_pass": round(dt / STEPS * 1e6, 1)}),
          flush=True)

    @jax.jit
    def apert_scan(fls, fvs):
        def body(acc, xs):
            fl, fv = xs
            tvx, tvy, sc = pk.aperture_pallas(fl, fv, fv, cfg)
            return acc + tvx[0, 0] + tvy[5, 5], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (fls, fvs))
        return acc

    dt = timeit(apert_scan, fls, fvs)
    print(json.dumps({"stage": "aperture_pallas",
                      "us_per_pass": round(dt / STEPS * 1e6, 1)}),
          flush=True)

    # XLA dense formulations for scale
    @jax.jit
    def dense_scan(pres, posts):
        def body(acc, xs):
            tp, tq = xs
            vx, vy, gate, ln, th = dense_local_flow(tq, tp, cfg)
            return acc + vx[0, 0] + ln[5, 5], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (posts, pres))
        return acc

    dt = timeit(dense_scan, pres, posts)
    print(json.dumps({"stage": "local_dense_xla",
                      "us_per_pass": round(dt / STEPS * 1e6, 1)}),
          flush=True)
    print(json.dumps({"done": True, "variant": tag}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
