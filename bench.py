"""Throughput benchmark: prints one JSON line for the driver.

Methodology mirrors the reference's own measurement (vFlow.cpp:214-423,
main.cpp:201): the timed region covers event processing only - events start
in memory (reference: RAM vectors; here: device HBM) and outputs land in
memory. File I/O is outside the timer in both.

Metric: events/second on one chip for the 320x320 sensor config
(BASELINE.json config 2-style: millions of events, batched mode).
vs_baseline is measured against the driver's north-star per-chip share:
100 M events/s on a v5p-16 = 6.25 M events/s per chip (BASELINE.json:5);
the reference itself publishes no numbers (BASELINE.md).
"""
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine

BASELINE_PER_CHIP = 100e6 / 16  # north-star / v5p-16 chips


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    m = int(os.environ.get("FARMS_BENCH_CHUNK", 32768))
    spc = int(os.environ.get("FARMS_BENCH_STEPS", 8))
    n = m * spc  # exactly one resident scan call
    cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True)

    ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6,
                                 seed=0)

    eng = FlowEngine(cfg)
    fn, _ = eng.process_resident(ev)
    out = fn()
    # force full materialization (block_until_ready does not reliably
    # synchronize through the remote-execution tunnel)
    checksum = float(jnp.sum(out[:, 0, :]))

    best = 0.0
    for _ in range(2):
        eng.reset()
        fn, _ = eng.process_resident(ev)
        t0 = time.perf_counter()
        out = fn()
        checksum = float(jnp.sum(out[:, 0, :]))
        dt = time.perf_counter() - t0
        best = max(best, n / dt)

    print(json.dumps({
        "metric": "events_per_second_single_chip",
        "value": round(best, 1),
        "unit": "events/s",
        "vs_baseline": round(best / BASELINE_PER_CHIP, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
