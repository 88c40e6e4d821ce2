import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine, scan_chunk
import jax.numpy as jnp

ev = synthetic_translating_bar(width=64, height=64, bar_len=20, duration_us=30000,
                               speed_px_per_sec=1000, jitter_us=20, seed=1)[:600]
for dense in (True, False):
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=4, use_dense=dense)
    a = FlowEngine(cfg); a._compact_ok = False
    out5 = a.process(ev)
    b = FlowEngine(cfg)  # compact default
    out2 = b.process(ev)
    for f in ("r_true","theta_true","vx","vy","r_local","theta_local"):
        np.testing.assert_array_equal(getattr(out5,f), getattr(out2,f)), f
    np.testing.assert_array_equal(out5.scale, out2.scale)
    print("dense" if dense else "per-event", "compact == 5-row OK")
