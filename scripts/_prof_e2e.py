import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine, scan_chunk

m, spc = 65536, 8
n = m*spc
cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True)
ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6, seed=0)
eng = FlowEngine(cfg)

t0=time.perf_counter(); packed, _ = eng.pack(ev, steps_per_call=spc); t_pack=time.perf_counter()-t0
print("pack:", t_pack, "shape", packed.shape, "bytes", packed.nbytes)

t0=time.perf_counter(); d = jax.device_put(packed[0]); d.block_until_ready(); _=float(jnp.sum(d[:, 2, :1])); t_h2d=time.perf_counter()-t0
print("h2d:", t_h2d, f"{packed[0].nbytes/t_h2d/1e6:.1f} MB/s")

state = eng.state
state, out = scan_chunk(state, d, cfg); _=float(jnp.sum(out[:,0,:1]))  # compile
t0=time.perf_counter(); state, out = scan_chunk(state, d, cfg); _=float(jnp.sum(out[:,0,:1])); t_disp=time.perf_counter()-t0
print("dispatch:", t_disp)
t0=time.perf_counter(); host = np.asarray(out); t_d2h=time.perf_counter()-t0
print("d2h:", t_d2h, "bytes", host.nbytes, f"{host.nbytes/t_d2h/1e6:.1f} MB/s")
t0=time.perf_counter(); o = eng._unpack_outputs([host], ev, n); t_un=time.perf_counter()-t0
print("unpack:", t_un)
