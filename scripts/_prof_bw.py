import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")
import numpy as np, jax, jax.numpy as jnp

a = np.random.randint(0, 100, size=(8, 5, 65536), dtype=np.int32)  # 10.5MB
d = jax.device_put(a); np.asarray(d)  # warm path
for _ in range(3):
    t0=time.perf_counter(); d = jax.device_put(a); h = np.asarray(d); dt=time.perf_counter()-t0
    print(f"roundtrip 10.5MB: {dt:.3f}s  {2*a.nbytes/dt/1e6:.0f} MB/s agg")
b = np.random.rand(8, 7, 65536).astype(np.float32)
db = jax.device_put(b); np.asarray(db)
for _ in range(3):
    t0=time.perf_counter(); h = np.asarray(db); dt=time.perf_counter()-t0
    print(f"d2h 14.7MB: {dt:.3f}s  {b.nbytes/dt/1e6:.0f} MB/s")
for _ in range(3):
    t0=time.perf_counter(); d2 = jax.device_put(b); d2.block_until_ready(); dt=time.perf_counter()-t0
    print(f"h2d 14.7MB: {dt:.3f}s  {b.nbytes/dt/1e6:.0f} MB/s")
