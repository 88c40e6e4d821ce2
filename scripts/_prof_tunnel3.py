"""D2H sustained-bandwidth probe: repeated + threaded fetches of a real
engine output buffer. Avoids standalone device_put (pathological through
the axon tunnel) and new jit compiles (minutes each through the tunnel):
the producer is scan_chunk, whose compile is in the persistent cache.

Also times the jit-arg H2D path (host numpy chunk -> dispatch) the way
FlowEngine.process actually uploads.
"""
import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine, scan_chunk
from farms_tpu.state.surfaces import init_state

m, spc = 65536, 8
cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True)
ev = synthetic_random_events(m * spc, width=320, height=320, rate_hz=5e6,
                             seed=0)
eng = FlowEngine(cfg)
packed, _ = eng.pack(ev, steps_per_call=spc, compact=True)
host_chunk = packed[0]

t_all = time.perf_counter()
state = init_state(cfg)
state, out = scan_chunk(state, jnp.asarray(host_chunk), cfg)
h = np.asarray(out)   # warm fetch (also fences compile/exec)
print(f"setup+compile+first-exec+first-fetch: "
      f"{time.perf_counter()-t_all:.1f}s out {h.nbytes/1e6:.1f} MB",
      flush=True)

# ---- repeated big fetch: sustained bandwidth / slow-start check ----
for i in range(5):
    t0 = time.perf_counter()
    h = np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"d2h 14.7MB #{i}: {dt*1e3:7.1f} ms  {h.nbytes/dt/1e6:6.1f} MB/s",
          flush=True)

# ---- four outputs fetched sequentially vs in 4 threads ----
outs = []
for i in range(4):
    state, o = scan_chunk(state, jnp.asarray(host_chunk), cfg)
    outs.append(o)
h = [np.asarray(o) for o in outs]  # warm/fence all
t0 = time.perf_counter()
for o in outs:
    _ = np.asarray(o)
seq = time.perf_counter() - t0
res = [None] * 4
def fetch(i):
    res[i] = np.asarray(outs[i])
th = [threading.Thread(target=fetch, args=(i,)) for i in range(4)]
t0 = time.perf_counter()
for x in th: x.start()
for x in th: x.join()
par = time.perf_counter() - t0
tot = 4 * 14.68
print(f"d2h 4x14.7MB sequential {seq*1e3:.0f} ms ({tot/seq:.1f} MB/s) | "
      f"4 threads {par*1e3:.0f} ms ({tot/par:.1f} MB/s)", flush=True)

# ---- batched device_get ----
t0 = time.perf_counter()
_ = jax.device_get(outs)
bat = time.perf_counter() - t0
print(f"d2h 4x14.7MB device_get: {bat*1e3:.0f} ms ({tot/bat:.1f} MB/s)",
      flush=True)

# ---- H2D jit-arg path: dispatch with fresh host chunk, no fetch ----
# (dispatch is async; measure a full produce+tiny-consume cycle instead:
# the next scan depends on the carried state, so timing N sequential
# dispatches with fresh host args + one final fetch bounds H2D+compute)
shift = host_chunk.copy()
t0 = time.perf_counter()
for i in range(4):
    shift[:, 1, :] += 1000000
    state, o = scan_chunk(state, jnp.asarray(shift), cfg)
_ = np.asarray(o)  # fence chain + one 14.7MB fetch (~0.55s per above)
dt = time.perf_counter() - t0
up = 4 * host_chunk.nbytes / 1e6
print(f"4x(h2d {host_chunk.nbytes/1e6:.1f}MB + compute) + 1 fetch: "
      f"{dt*1e3:.0f} ms -> upload+compute leg ~{dt - 0.55:.2f}s "
      f"({up/max(dt-0.55,1e-3):.1f} MB/s eff)", flush=True)
print("done", flush=True)
