"""Clean tunnel wire probe: REAL first-fetch D2H + H2D bandwidth.

Previous probe (_prof_tunnel3.py) re-fetched the same jax.Array object;
np.asarray serves the cached host copy after the first fetch, so its D2H
numbers were meaningless. Here every fetch touches a *fresh* device array
(computed on device, never fetched) and every upload is a fresh host
buffer.

Measures: (1) D2H bandwidth vs transfer size, (2) D2H with K concurrent
threads over K distinct arrays, (3) H2D the same two ways, (4) full-duplex
overlap (upload one buffer while downloading another).
"""
import functools
import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/farms_jax_cache")


@functools.partial(jax.jit, static_argnums=(1,))
def make(seed, nwords):
    k = jax.random.key(seed)
    return jax.random.randint(k, (nwords,), 0, 1 << 30, dtype=jnp.int32)


def fresh(seed, nbytes):
    a = make(seed, nbytes // 4)
    # fence: materialize a scalar (depends on whole array? no - sum does)
    _ = float(jnp.sum(a[:8]))
    return a


@jax.jit
def checksum(a):
    return jnp.sum(a)


print("== D2H size sweep (fresh arrays, first fetch) ==", flush=True)
seed = 0
for mb in (1, 4, 16, 64):
    nb = mb * 1024 * 1024
    a = fresh(seed, nb); seed += 1
    # ensure computed: checksum fetch (4 bytes)
    _ = float(checksum(a))
    t0 = time.perf_counter()
    h = np.asarray(a)
    dt = time.perf_counter() - t0
    print(f"d2h {mb:3d} MB: {dt*1e3:8.1f} ms  {nb/dt/1e6:7.1f} MB/s", flush=True)

print("== D2H thread sweep (4x16MB distinct fresh arrays) ==", flush=True)
for nthreads in (1, 2, 4):
    arrs = []
    for i in range(4):
        a = fresh(seed, 16 * 1024 * 1024); seed += 1
        _ = float(checksum(a))
        arrs.append(a)
    res = [None] * 4
    def fetch(i):
        res[i] = np.asarray(arrs[i])
    t0 = time.perf_counter()
    if nthreads == 1:
        for i in range(4):
            fetch(i)
    else:
        ths = []
        for g in range(0, 4, 4 // nthreads):
            pass
        ths = [threading.Thread(target=lambda lo=lo: [fetch(i) for i in
               range(lo, lo + 4 // nthreads)]) for lo in
               range(0, 4, 4 // nthreads)]
        for t in ths: t.start()
        for t in ths: t.join()
    dt = time.perf_counter() - t0
    print(f"d2h 4x16MB {nthreads} threads: {dt*1e3:8.1f} ms  "
          f"{64*1024*1024/dt/1e6:7.1f} MB/s", flush=True)

print("== H2D size sweep (device_put + 4B checksum fence) ==", flush=True)
for mb in (1, 4, 16, 64):
    nb = mb * 1024 * 1024
    h = np.random.randint(0, 1 << 30, size=nb // 4, dtype=np.int32)
    t0 = time.perf_counter()
    d = jax.device_put(h)
    _ = float(checksum(d))  # 4-byte fetch fences the upload
    dt = time.perf_counter() - t0
    print(f"h2d {mb:3d} MB: {dt*1e3:8.1f} ms  {nb/dt/1e6:7.1f} MB/s", flush=True)

print("== H2D thread sweep (4x16MB distinct) ==", flush=True)
for nthreads in (1, 2, 4):
    hosts = [np.random.randint(0, 1 << 30, size=4 * 1024 * 1024,
                               dtype=np.int32) for _ in range(4)]
    res = [None] * 4
    def put(i):
        d = jax.device_put(hosts[i])
        res[i] = float(checksum(d))
    t0 = time.perf_counter()
    if nthreads == 1:
        for i in range(4):
            put(i)
    else:
        ths = [threading.Thread(target=lambda lo=lo: [put(i) for i in
               range(lo, lo + 4 // nthreads)]) for lo in
               range(0, 4, 4 // nthreads)]
        for t in ths: t.start()
        for t in ths: t.join()
    dt = time.perf_counter() - t0
    print(f"h2d 4x16MB {nthreads} threads: {dt*1e3:8.1f} ms  "
          f"{64*1024*1024/dt/1e6:7.1f} MB/s", flush=True)

print("== full duplex: 16MB up in thread while 16MB down in main ==", flush=True)
a = fresh(seed, 16 * 1024 * 1024); seed += 1
_ = float(checksum(a))
h = np.random.randint(0, 1 << 30, size=4 * 1024 * 1024, dtype=np.int32)
done = {}
def up():
    d = jax.device_put(h)
    done["up"] = float(checksum(d))
t0 = time.perf_counter()
th = threading.Thread(target=up); th.start()
hh = np.asarray(a)
th.join()
dt = time.perf_counter() - t0
print(f"16MB down + 16MB up overlapped: {dt*1e3:.1f} ms  "
      f"aggregate {32*1024*1024/dt/1e6:.1f} MB/s", flush=True)
print("done", flush=True)
