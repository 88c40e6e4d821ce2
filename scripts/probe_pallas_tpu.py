"""On-TPU probe: Pallas vs dense-XLA equivalence + timing per geometry.

Run on the real chip (no JAX_PLATFORMS override). Prints max abs diff and
per-call times for the local-flow and aperture stages at each geometry.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.ops import dense_flow
from farms_tpu.ops.pallas import kernels as pk

assert jax.default_backend() == "tpu", jax.default_backend()


def surfaces(cfg, rng, density=0.05):
    W, H = cfg.width, cfg.height
    n = int(W * H * density)
    t_pre = np.ones((W, H), np.int32)
    xs = rng.integers(0, W, n)
    ys = rng.integers(0, H, n)
    ts = np.sort(rng.integers(1, 5_000_000, n)).astype(np.int64)
    t_pre[xs, ys] = (ts + 1).astype(np.int32)
    t_post = t_pre.copy()
    xs2 = rng.integers(0, W, n // 4)
    ys2 = rng.integers(0, H, n // 4)
    ts2 = rng.integers(5_000_000, 6_000_000, n // 4).astype(np.int64)
    t_post[xs2, ys2] = (ts2 + 1).astype(np.int32)
    return jnp.asarray(t_pre), jnp.asarray(t_post)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps * 1e3


for (w, h) in [(320, 320), (640, 480), (1280, 720)]:
    cfg = FlowConfig(width=w, height=h)
    print(f"\n=== {w}x{h}  local_sup={pk.local_flow_supported(cfg)} "
          f"apert_sup={pk.aperture_supported(cfg)} "
          f"local_vmem={pk._local_vmem_bytes(cfg, pk._tile_rows(cfg))/2**20:.1f}MB "
          f"apert_vmem={pk._aperture_vmem_bytes(cfg, pk._tile_rows(cfg))/2**20:.1f}MB")
    rng = np.random.default_rng(0)
    t_pre, t_post = surfaces(cfg, rng)

    dl = jax.jit(dense_flow.dense_local_flow, static_argnames=("cfg",))
    ref, t_ref = timeit(dl, t_pre, t_post, cfg)
    got, t_pal = timeit(pk.local_flow_pallas, t_pre, t_post, cfg)
    dmax = max(float(jnp.max(jnp.abs(jnp.nan_to_num(a.astype(jnp.float32))
                                     - jnp.nan_to_num(b.astype(jnp.float32)))))
               for a, b in zip(ref, got))
    print(f"local:  dense {t_ref:7.3f} ms  pallas {t_pal:7.3f} ms  "
          f"maxdiff {dmax:.3e}")

    fl, fvx, fvy = (jnp.abs(got[3]) * got[2], got[0] * got[2],
                    got[1] * got[2])
    da = jax.jit(dense_flow.dense_aperture, static_argnames=("cfg",))
    refa, t_refa = timeit(da, fl, fvx, fvy, cfg)
    gota, t_pala = timeit(pk.aperture_pallas, fl, fvx, fvy, cfg)
    dmaxa = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(refa, gota))
    print(f"apert:  dense {t_refa:7.3f} ms  pallas {t_pala:7.3f} ms  "
          f"maxdiff {dmaxa:.3e}")
