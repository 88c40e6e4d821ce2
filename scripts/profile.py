"""Consolidated profiling tool (replaces the round 2-4 _prof_* one-offs).

Subcommands:

  wire      D2H / H2D / duplex tunnel bandwidth (fresh buffers each way)
  rtt       tiny-fetch round-trip latency distribution
  scatter   per-update scatter cost at the engine's formulation
  rate      device-lane rate for one operating point
              --phases/--aperture-phases/--snapshots/--correction/--coarse

Run ONE TPU job at a time (the axon tunnel serializes poorly) and never
concurrently with a CPU test run: the device lane is host-dispatch-driven
and CPU contention stalls it ~20x (measured round 5).

Conclusions from the retired one-off probes (full data in the git
history of scripts/_prof_*.py, removed round 5; summarized in
ROADMAP.md):
- tunnel: D2H ~27 MB/s one stream / ~50 MB/s on two; H2D ~47 MB/s;
  duplex ~53 MB/s aggregate; per-fetch latency 40-70 ms => the e2e lane
  is ROUND-TRIP-bound, not bandwidth-bound (_prof_wire, _prof_tunnel*).
- scatter: ~3.9 ns/update, per-update-serialization-bound; windowed
  variants 64x worse; index ORDER is irrelevant (pixel-sorted ==
  event-order to 0.5%), so host-side sorting buys nothing
  (_prof_scatter, _prof_scatter_order).
- dense local pass ~200 us per 320x320 sub-phase (VPU-bound), aperture
  pass ~25 us; isolated kernel microbenches overstate in-engine costs
  2-10x through the tunnel (dispatch overhead ~2 ms/call) - trust
  full-engine marginals only (_prof_kernel, _prof_phases).
- e2e: ~1 sparse fetch per scan call (counts + payload rider share one
  buffer); pipeline unit 2x131072 with 6 fetch threads measured best
  (_prof_e2e*, round-5 sweep).
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np


def cmd_wire(args):
    import jax
    import jax.numpy as jnp
    sizes = [1 << 20, 4 << 20, 16 << 20]
    for sz in sizes:
        n = sz // 4
        dev = [jnp.arange(n, dtype=jnp.int32) + i for i in range(args.reps)]
        for d in dev:
            float(jnp.sum(d))
        t0 = time.perf_counter()
        for d in dev:
            np.asarray(d)
        dt = time.perf_counter() - t0
        print(json.dumps({"dir": "d2h", "MB": sz >> 20,
                          "MBps": round(args.reps * sz / dt / 1e6, 1)}))
        host = [np.random.randint(0, 100, n).astype(np.int32)
                for _ in range(args.reps)]
        t0 = time.perf_counter()
        outs = [jax.device_put(h) for h in host]
        for o in outs:
            float(jnp.sum(o))
        dt = time.perf_counter() - t0
        print(json.dumps({"dir": "h2d", "MB": sz >> 20,
                          "MBps": round(args.reps * sz / dt / 1e6, 1)}))


def cmd_rtt(args):
    import jax
    import jax.numpy as jnp
    tiny = jax.device_put(jnp.zeros(8, jnp.int32))
    np.asarray(tiny)
    rtts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(tiny + 1)
        rtts.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"rtt_ms_median": round(statistics.median(rtts), 1),
                      "rtt_ms_min": round(min(rtts), 1),
                      "rtt_ms_max": round(max(rtts), 1)}))


def cmd_scatter(args):
    import functools
    import jax
    import jax.numpy as jnp
    W = H = 320
    m = args.m

    @jax.jit
    def pair(surf, ep, x, y, t):
        surf = surf.at[x, y].set(t, mode="drop", unique_indices=True)
        ep = ep.at[x, y].set(7, mode="drop", unique_indices=True)
        return surf, ep

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, W, m), jnp.int32)
    y = jnp.asarray(rng.integers(0, H, m), jnp.int32)
    t = jnp.asarray(rng.integers(1, 1 << 20, m), jnp.int32)
    surf = jnp.zeros((W, H), jnp.int32)
    ep = jnp.zeros((W, H), jnp.int32)
    surf, ep = pair(surf, ep, x, y, t)
    float(jnp.sum(surf))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        surf, ep = pair(surf, ep, x, y, t)
    float(jnp.sum(surf) + jnp.sum(ep))
    dt = time.perf_counter() - t0
    print(json.dumps({"ns_per_update":
                      round(dt / (args.reps * 2 * m) * 1e9, 2)}))


def cmd_rate(args):
    import jax
    import jax.numpy as jnp
    from farms_tpu.config import FlowConfig
    from farms_tpu.events.io import synthetic_random_events
    from farms_tpu.pipeline.engine import scan_chunk, FlowEngine
    from farms_tpu.state.surfaces import init_state
    from bench import device_batches, timed_lane
    m, spc = args.chunk, 8
    ev = synthetic_random_events(m * spc, width=320, height=320,
                                 rate_hz=5e6, seed=0)
    span = np.int32(int(ev.t[-1]) + 1)
    cfg = FlowConfig(width=320, height=320, chunk_size=m, wire="f16",
                     sub_phases=args.phases,
                     aperture_sub_phases=args.aperture_phases,
                     causal_snapshots=args.snapshots,
                     center_correction=args.correction,
                     correction_coarse_chain=args.coarse)
    eng = FlowEngine(cfg)
    batches, _ = device_batches(eng, cfg, ev, spc, args.calls, span)
    state = init_state(cfg)
    state, out = scan_chunk(state, batches[0], cfg)
    float(jnp.sum(out[0]))
    best, _ = timed_lane(cfg, batches, reps=3)
    print(json.dumps({"P": args.phases, "A": args.aperture_phases,
                      "S": args.snapshots, "C": args.correction,
                      "coarse": args.coarse,
                      "M_ev_per_s": round(best / 1e6, 2)}))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    w = sub.add_parser("wire")
    w.add_argument("--reps", type=int, default=4)
    r = sub.add_parser("rtt")
    r.add_argument("--reps", type=int, default=10)
    s = sub.add_parser("scatter")
    s.add_argument("--m", type=int, default=131072)
    s.add_argument("--reps", type=int, default=20)
    q = sub.add_parser("rate")
    q.add_argument("--chunk", type=int, default=131072)
    q.add_argument("--phases", type=int, default=2)
    q.add_argument("--aperture-phases", type=int, default=2)
    q.add_argument("--snapshots", type=int, default=1)
    q.add_argument("--correction", type=int, default=0)
    q.add_argument("--coarse", action="store_true")
    q.add_argument("--calls", type=int, default=6)
    args = ap.parse_args()
    {"wire": cmd_wire, "rtt": cmd_rtt, "scatter": cmd_scatter,
     "rate": cmd_rate}[args.cmd](args)


if __name__ == "__main__":
    main()
