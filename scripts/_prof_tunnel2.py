"""Tunnel transfer probe with ZERO jit ops (compiles through the axon
tunnel cost minutes each; pure device_put / np.asarray do not compile)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import threading

import numpy as np
import jax

dev = jax.devices()[0]
print("device:", dev, flush=True)

# ---- D2H ----
for mb in (1, 4, 16):
    n = mb * 256 * 1024
    d = jax.device_put(np.random.rand(n).astype(np.float32))
    _ = np.asarray(d)   # first fetch warms any lazy state
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(d)
        ts.append(time.perf_counter() - t0)
    print(f"d2h {mb:3d} MB: {[round(x*1e3,1) for x in ts]} ms  best "
          f"{mb/min(ts):.1f} MB/s", flush=True)

# ---- D2H concurrency: 4 x 4MB in 4 threads vs sequential ----
ds = [jax.device_put(np.random.rand(1024 * 1024).astype(np.float32))
      for _ in range(4)]
for d in ds:
    _ = np.asarray(d)
t0 = time.perf_counter()
for d in ds:
    _ = np.asarray(d)
seq = time.perf_counter() - t0
res = [None] * 4
def fetch(i):
    res[i] = np.asarray(ds[i])
th = [threading.Thread(target=fetch, args=(i,)) for i in range(4)]
t0 = time.perf_counter()
for x in th: x.start()
for x in th: x.join()
par = time.perf_counter() - t0
print(f"d2h 4x4MB: sequential {seq*1e3:.1f} ms ({16/seq:.1f} MB/s), "
      f"4 threads {par*1e3:.1f} ms ({16/par:.1f} MB/s)", flush=True)

# ---- batched device_get ----
t0 = time.perf_counter()
_ = jax.device_get(ds)
bat = time.perf_counter() - t0
print(f"d2h 4x4MB batched device_get: {bat*1e3:.1f} ms ({16/bat:.1f} MB/s)",
      flush=True)

# ---- H2D: device_put timed via put+known-d2h round trip ----
known_d2h = {}
for mb in (4, 16):
    a = np.random.randint(0, 100, size=(mb * 256 * 1024,), dtype=np.int32)
    d0 = jax.device_put(a)
    _ = np.asarray(d0)
    t0 = time.perf_counter()
    _ = np.asarray(d0)
    known_d2h[mb] = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(a)
        _ = np.asarray(d)       # round trip forces completion
        ts.append(time.perf_counter() - t0)
    best = min(ts) - known_d2h[mb]
    print(f"h2d {mb:3d} MB: round-trips {[round(x*1e3,1) for x in ts]} ms, "
          f"d2h leg {known_d2h[mb]*1e3:.1f} ms -> h2d ~{mb/max(best,1e-6):.1f}"
          f" MB/s", flush=True)

# ---- small-transfer latency ----
s = jax.device_put(np.zeros(32, np.float32))
_ = np.asarray(s)
t0 = time.perf_counter()
for _ in range(10):
    _ = np.asarray(s)
print(f"d2h 128B: {(time.perf_counter()-t0)*1e2:.2f} ms each", flush=True)
print("done", flush=True)
