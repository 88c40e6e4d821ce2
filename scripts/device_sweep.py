"""Device-lane rate sweep over operating-point configs (round 5).

Measures the single-chip device rate (bench.py methodology: pre-uploaded
distinct dict-batches continuing one timeline, full-buffer reduction
fences) for a list of (P, A, S, correction) configs, appending one JSON
line per config to the output file. One TPU job at a time (see
farms-tpu-tunnel-limits memory); run detached:

  setsid nohup python scripts/device_sweep.py >> _r5_device_sweep.out 2>&1 &
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import scan_chunk, FlowEngine
from farms_tpu.state.surfaces import init_state
from bench import device_batches, timed_lane

CONFIGS = [
    # (sub_phases, aperture_sub_phases, snapshots, correction)
    (2, 2, 1, 0),          # benchmark preset, epoch-less
    (2, 2, 4, 0),
    (2, 2, 4, 32768),
    (2, 2, 8, 32768),
    (4, 2, 2, 16384),
    (4, 2, 4, 16384),
    (8, 2, 2, 0),          # round-4 fidelity preset, epoch-less
    (8, 2, 2, 8192),
]


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    m = int(os.environ.get("SWEEP_CHUNK", 131072))
    spc = int(os.environ.get("SWEEP_STEPS", 8))
    n_calls = int(os.environ.get("SWEEP_CALLS", 6))
    ev = synthetic_random_events(m * spc, width=320, height=320,
                                 rate_hz=5e6, seed=0)
    span = np.int32(int(ev.t[-1]) + 1)
    for (P, A, S, C) in CONFIGS:
        cfg = FlowConfig(width=320, height=320, chunk_size=m, wire="f16",
                         sub_phases=P, aperture_sub_phases=A,
                         causal_snapshots=S, center_correction=C)
        eng = FlowEngine(cfg)
        t0 = time.time()
        batches, _ = device_batches(eng, cfg, ev, spc, n_calls, span)
        state = init_state(cfg)
        state, out = scan_chunk(state, batches[0], cfg)
        float(jnp.sum(out[0]))
        compile_s = time.time() - t0
        best, _ = timed_lane(cfg, batches)
        print(json.dumps({"P": P, "A": A, "S": S, "C": C,
                          "device_ev_per_s": round(best, 1),
                          "M": round(best / 1e6, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
