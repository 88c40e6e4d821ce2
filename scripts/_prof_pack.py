import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine

m, spc = 65536, 8
n = m*spc
cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True)
ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6, seed=0)
eng = FlowEngine(cfg)
packed, _ = eng.pack(ev, steps_per_call=spc)  # warm
eng.reset()
t0=time.perf_counter(); packed, _ = eng.pack(ev, steps_per_call=spc); print("pack total:", time.perf_counter()-t0)

# stage timings
t0=time.perf_counter()
x = np.clip(ev.x.astype(np.int32), 0, 319); y = np.clip(ev.y.astype(np.int32), 0, 319)
t = (ev.t.astype(np.uint32) - np.uint32(ev.t[0])).view(np.int32)
print("clip/norm:", time.perf_counter()-t0)
t0=time.perf_counter()
flat = x * np.int64(320) + y
flat = flat.reshape(-1, m)
print("flat:", time.perf_counter()-t0)
lanes = np.arange(m)
seen = np.empty(320*320+1, dtype=np.int64)
winner = np.empty((flat.shape[0], m), dtype=np.int32)
t0=time.perf_counter()
for b in range(flat.shape[0]):
    seen[flat[b]] = lanes
    winner[b] = seen[flat[b]] == lanes
print("winner loop:", time.perf_counter()-t0)
t0=time.perf_counter()
packed = np.empty((1, spc, 5, m), dtype=np.int32)
packed[:, :, 0, :] = x.reshape(1, spc, m)
packed[:, :, 1, :] = y.reshape(1, spc, m)
packed[:, :, 2, :] = t.reshape(1, spc, m)
packed[:, :, 3, :] = 1
packed[:, :, 4, :] = winner.reshape(1, spc, m)
print("layout writes:", time.perf_counter()-t0)

# unpack breakdown
out = np.random.rand(spc, 7, m).astype(np.float32)
t0=time.perf_counter(); cols = out.transpose(0,2,1).reshape(-1,7); cols = np.ascontiguousarray(cols); print("transpose copy:", time.perf_counter()-t0)
t0=time.perf_counter()
c0 = cols[:,0].astype(np.float64); c1=cols[:,1].astype(np.float64); c2=cols[:,2].astype(np.float64)
c3 = cols[:,3].astype(np.float64); c4=cols[:,4].astype(np.float64); c5=cols[:,5].astype(np.float64)
c6 = cols[:,6].astype(np.int32)
print("col casts:", time.perf_counter()-t0)
