"""Multi-device scaling-efficiency sweep (VERDICT.md r2 item 6).

Sweeps the explicit halo engine and the multi-host engine over
n in {1, 2, 4, 8} devices, measuring device-resident events/s and the
efficiency vs the 1-device rate, and writes SCALING.json.

On real multi-chip hardware the efficiency column is the BASELINE >=80%
scaling target; on the virtual CPU mesh (CI, this machine's single-TPU
tunnel) all "devices" share one physical host, so the numbers validate
the *plumbing* (sharding compiles, collectives execute, outputs match)
and the overhead trend, not real scaling - the artifact records which
backend produced it.

Run: [JAX_PLATFORMS=cpu] python scripts/scaling_sweep.py [--devices 1 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")
if os.environ.get("FARMS_SCALING_CPU", "1") == "1":
    # default to the virtual CPU mesh: the tunnel exposes one TPU chip,
    # so multi-device sweeps need the forced host platform
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("FARMS_SCALING_CPU", "1") == "1":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.pipeline.engine import FlowEngine


def time_resident(eng, ev, reps=3) -> float:
    import jax.numpy as jnp
    fn, n = eng.process_resident(ev)
    out = fn()
    float(jnp.sum(out[0]))
    best = 0.0
    for _ in range(reps):
        eng.reset()
        fn, n = eng.process_resident(ev)
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out[0]))
        best = max(best, n / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--max-window", type=int, default=20,
                    help="aperture half-window; sets the halo width and "
                         "thus the stencil-replication ceiling")
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    n_avail = len(jax.devices())
    devices = [d for d in args.devices if d <= n_avail]
    cfg = FlowConfig(width=args.width, height=args.height,
                     max_window=args.max_window,
                     chunk_size=args.chunk, steps_per_scan=4,
                     use_pallas=False)
    n = args.chunk * 4 * args.calls
    ev = synthetic_random_events(n, width=args.width, height=args.height,
                                 rate_hz=5e6)

    results = {"backend": jax.default_backend(),
               "n_devices_available": n_avail,
               "note": ("virtual single-process CPU mesh: all n 'devices' "
                        "share one host's cores (XLA CPU already "
                        "parallelizes n=1 across them), so events/s-vs-1-"
                        "device validates sharding plumbing and relative "
                        "engine overhead, not real scaling; on real chips "
                        "halo_replication_ceiling is the algorithmic bound"
                        if jax.default_backend() == "cpu" else
                        "real devices"),
               "config": {"width": args.width, "height": args.height,
                          "chunk_size": args.chunk, "events": n},
               "engines": {}}

    from farms_tpu.parallel.halo import HaloFlowEngine
    from farms_tpu.parallel.multihost import MultiHostFlowEngine, \
        make_global_mesh
    from jax.sharding import Mesh

    for name in ("halo", "multihost"):
        rows = []
        base = None
        for nd in devices:
            if name == "halo":
                eng = (FlowEngine(cfg) if nd == 1
                       else HaloFlowEngine(cfg, num_devices=nd))
            else:
                if nd == 1:
                    eng = FlowEngine(cfg)
                else:
                    tx = max(1, nd // 2)
                    mesh = Mesh(
                        np.array(jax.devices()[:nd]).reshape(tx, nd // tx),
                        axis_names=("tx", "ev"))
                    eng = MultiHostFlowEngine(cfg, mesh=mesh)
            t0 = time.time()
            rate = time_resident(eng, ev)
            if base is None:
                base = rate
            # stencil-replication ceiling. The aperture stage no longer
            # replicates ANY halo work: shards exchange integral
            # partials (parallel/halo.py assemble_integral_band), so its
            # ceiling is 1. The plane-fit stage still recomputes a
            # support_radius-row band (R = 2*f_rad = 2 for k=3) - the
            # only remaining by-construction replication
            core = args.width / nd
            R = 2 * ((args.filter_size if hasattr(args, "filter_size")
                      else 3) // 2)
            ceiling = 1.0 if nd == 1 else core / (core + 2 * R)
            eff = rate / (base * nd)
            rows.append({
                "devices": nd,
                "engine": type(eng).__name__,
                "events_per_sec": round(rate, 1),
                "efficiency_vs_1dev": round(eff, 4),
                "halo_replication_ceiling": round(ceiling, 4),
                "efficiency_vs_ceiling": round(eff / ceiling, 4),
            })
            print(f"[{name} n={nd}] {json.dumps(rows[-1])} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        results["engines"][name] = rows

    out = os.path.join(REPO, args.out)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
