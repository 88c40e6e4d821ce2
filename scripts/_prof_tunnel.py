"""Probe the axon tunnel's H2D/D2H characteristics: latency vs bandwidth.

Questions this answers (drives the e2e pipeline design):
- per-transfer fixed latency vs sustained MB/s, each direction
- whether multiple in-flight transfers overlap (device_get of a list)
- whether transfer size changes effective bandwidth
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev, flush=True)

# warm up the backend + a trivial kernel
z = jax.device_put(np.zeros(8, np.float32))
_ = float(jnp.sum(z))

def fence(x):
    return float(jnp.sum(x))

# ---- H2D: vary size ----
for mb in (1, 4, 16, 64):
    a = np.random.randint(0, 100, size=(mb * 256 * 1024,), dtype=np.int32)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(a)
        _ = fence(d)  # includes one tiny d2h of the scalar
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"h2d {mb:3d} MB: best {best*1e3:8.1f} ms  {mb/best:8.1f} MB/s",
          flush=True)

# ---- D2H: vary size ----
for mb in (1, 4, 16, 64):
    n = mb * 256 * 1024
    d = jax.device_put(np.random.rand(n).astype(np.float32))
    _ = fence(d)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = np.asarray(d)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"d2h {mb:3d} MB: best {best*1e3:8.1f} ms  {mb/best:8.1f} MB/s",
          flush=True)

# ---- D2H: 4 x 4 MB sequential vs batched device_get ----
ds = [jax.device_put(np.random.rand(1024 * 1024).astype(np.float32))
      for _ in range(4)]
for d in ds:
    _ = fence(d)
t0 = time.perf_counter()
for d in ds:
    _ = np.asarray(d)
seq = time.perf_counter() - t0
t0 = time.perf_counter()
_ = jax.device_get(ds)
bat = time.perf_counter() - t0
print(f"d2h 4x4MB sequential: {seq*1e3:.1f} ms  batched device_get: "
      f"{bat*1e3:.1f} ms", flush=True)

# ---- tiny transfers: fixed latency ----
small = jax.device_put(np.zeros(32, np.float32))
_ = fence(small)
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(small)
print(f"d2h 128B x10: {(time.perf_counter()-t0)*1e2:.1f} ms each", flush=True)
