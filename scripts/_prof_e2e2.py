"""e2e stage breakdown at the operating point with the f16 wire.

Times, for one 524288-event process()-equivalent: native pack, per-unit
upload+dispatch, fetch drain, host unpack - and the full process() call -
to locate what keeps e2e below the wire bound (~50 MB/s duplex).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine

m, spc, = 65536, 8
n = m * spc
cfg = FlowConfig(width=320, height=320, chunk_size=m, wire="f16")
ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6, seed=0)
eng = FlowEngine(cfg)

# warm compile via one full process
t0 = time.perf_counter()
out = eng.process(ev)
print(f"cold process(): {time.perf_counter()-t0:.1f}s", flush=True)

for rep in range(3):
    eng.reset()
    t0 = time.perf_counter()
    out = eng.process(ev)
    dt = time.perf_counter() - t0
    print(f"warm process() #{rep}: {dt*1e3:.0f} ms -> {n/dt/1e6:.2f} M ev/s",
          flush=True)

# ---- stage breakdown ----
eng.reset()
t0 = time.perf_counter()
packed, _ = eng.pack(ev, steps_per_call=2, compact=True)
t_pack = time.perf_counter() - t0
print(f"pack: {t_pack*1e3:.0f} ms ({packed.nbytes/1e6:.1f} MB)", flush=True)

# uploads + dispatch only (no fetch): chain all, then 4-byte fence
t0 = time.perf_counter()
outs = []
for c in range(packed.shape[0]):
    eng.state, o = eng._dispatch(jnp.asarray(packed[c]))
    outs.append(o)
f = float(jnp.sum(outs[-1][0][:, :, :1]))
t_updisp = time.perf_counter() - t0
print(f"upload+dispatch+compute ({packed.shape[0]} units): "
      f"{t_updisp*1e3:.0f} ms", flush=True)

# fetch drain: sequential vs 2 threads
t0 = time.perf_counter()
blocks = [tuple(np.asarray(x) for x in o) for o in outs]
t_fetch = time.perf_counter() - t0
nbytes = sum(a.nbytes + b.nbytes for a, b in blocks)
print(f"fetch sequential: {t_fetch*1e3:.0f} ms ({nbytes/1e6:.1f} MB, "
      f"{nbytes/t_fetch/1e6:.1f} MB/s)", flush=True)

t0 = time.perf_counter()
res = eng._unpack_outputs(blocks, ev, n)
t_unp = time.perf_counter() - t0
print(f"unpack: {t_unp*1e3:.0f} ms", flush=True)

# threaded fetch of fresh outputs
eng.reset()
outs = []
for c in range(packed.shape[0]):
    eng.state, o = eng._dispatch(jnp.asarray(packed[c]))
    outs.append(o)
f = float(jnp.sum(outs[-1][0][:, :, :1]))
from concurrent.futures import ThreadPoolExecutor
t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=2) as pool:
    futs = [tuple(pool.submit(np.asarray, x) for x in o) for o in outs]
    blocks = [tuple(f2.result() for f2 in fs) for fs in futs]
t_fetch2 = time.perf_counter() - t0
print(f"fetch 2 threads (pre-computed): {t_fetch2*1e3:.0f} ms "
      f"({nbytes/t_fetch2/1e6:.1f} MB/s)", flush=True)
print("done", flush=True)
