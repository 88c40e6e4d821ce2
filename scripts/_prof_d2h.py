import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine, scan_chunk
from farms_tpu.state.surfaces import init_state

m, spc = 65536, 8
cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True)
ev = synthetic_random_events(m*spc, width=320, height=320, rate_hz=5e6, seed=0)
eng = FlowEngine(cfg)
packed, _ = eng.pack(ev, steps_per_call=spc, compact=True)
chunk = jax.device_put(jnp.asarray(packed[0]))
state = init_state(cfg)
state, out = scan_chunk(state, chunk, cfg)
h = np.asarray(out)  # warm
for i in range(3):
    state, out = scan_chunk(state, chunk, cfg)
    t0=time.perf_counter(); h = np.asarray(out); dt=time.perf_counter()-t0
    print(f"fresh-out d2h {h.nbytes/1e6:.1f}MB: {dt:.3f}s  {h.nbytes/dt/1e6:.0f} MB/s")
# h2d of the compact chunk
for i in range(3):
    t0=time.perf_counter(); d=jax.device_put(packed[0]); _=float(d[0,1,0]); dt=time.perf_counter()-t0
    print(f"compact h2d {packed[0].nbytes/1e6:.1f}MB: {dt:.3f}s  {packed[0].nbytes/dt/1e6:.0f} MB/s")
