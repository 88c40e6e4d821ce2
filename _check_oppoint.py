import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.oracle import run_oracle

ev = synthetic_translating_bar(width=64, height=64, bar_len=20, duration_us=30000,
                               speed_px_per_sec=1000, jitter_us=20, seed=1)[:600]
ref = run_oracle(ev, FlowConfig(width=64, height=64))
for chunk in (320, 512):
    cfg = FlowConfig(width=64, height=64, chunk_size=chunk, steps_per_scan=1, use_dense=True)
    got = FlowEngine(cfg).process(ev)
    rv, gv = ref.r_local > 0, got.r_local > 0
    m = rv & gv
    tv = lambda o: np.stack([o.r_true*np.cos(o.theta_true), o.r_true*np.sin(o.theta_true)],1)
    aee = np.linalg.norm(tv(ref)[m]-tv(got)[m],axis=1).mean()
    ang = np.degrees(np.abs(np.angle(np.exp(1j*(ref.theta_true[m]-got.theta_true[m])))))
    span_us = (int(ev.t[-1])-int(ev.t[0]))*chunk/len(ev)
    print(f"chunk {chunk}: span {span_us:.0f}us ({span_us/500:.0f} windows) agree {1-(rv!=gv).mean():.3f} aee {aee:.1f} px/s ang mean {ang.mean():.2f} p95 {np.percentile(ang,95):.2f}")
