"""Accuracy-vs-chunk-size frontier (VERDICT.md round-1 item 2).

Measures the batched-semantics error of the chunked engine against the
float64 event-serial oracle (pipeline/oracle.py) on >=100K-event 320x320
streams, across chunk sizes up to the benchmark's operating point, and
writes the frontier to ACCURACY.json / ACCURACY.md at the repo root.

Two streams:
- "random": the benchmark's own distribution (synthetic_random_events at
  5 M events/s) - validates the headline throughput number's operating
  point directly.
- "bar": four stacked translating bars + background noise (structured,
  physically meaningful flow) - interpretable AEE in px/ms.

Error budget (BASELINE.json): AEE < 0.5 px/ms and angular error < 5 deg
vs the event-serial semantics. Flow units are px/s (speed = 1/dtdp with
dtdp in s/px); AEE is reported in px/ms (divide by 1000).

Run: python scripts/accuracy_sweep.py [--stream random bar] [--n 120000]
Writes oracle outputs to a cache dir so re-runs only sweep the engine.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import (EventBatch, synthetic_random_events,
                                 synthetic_translating_bar)
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.oracle import run_oracle

CACHE_DIR = os.environ.get("FARMS_ORACLE_CACHE", "/tmp/farms_oracle_cache")
CHUNKS = (256, 2048, 16384, 65536, 131072)


def make_stream(kind: str, n: int) -> EventBatch:
    if kind == "random":
        return synthetic_random_events(n, width=320, height=320,
                                       rate_hz=5e6, seed=0)
    # "bar": four stacked bars sweeping +x at 10_000 px/s (~2.4 M ev/s)
    # plus ~30% random background, merged chronologically
    parts = []
    for i, y0 in enumerate((40, 120, 200, 280)):
        b = synthetic_translating_bar(width=320, height=320, bar_len=60,
                                      speed_px_per_sec=10000.0,
                                      duration_us=30000, jitter_us=30,
                                      seed=i)
        # recenter each bar's y band (generator centers at height/2)
        parts.append((b.x, b.y - (160 - y0), b.t, b.pol))
    n_bar = sum(len(p[0]) for p in parts)
    n_bg = max(0, n - n_bar)
    t_end = max(int(p[2][-1]) for p in parts)
    rng = np.random.default_rng(9)
    bg = (rng.integers(0, 320, n_bg).astype(np.int32),
          rng.integers(0, 320, n_bg).astype(np.int32),
          np.sort(rng.integers(1000, t_end, n_bg)).astype(np.uint32),
          np.ones(n_bg, dtype=np.int32))
    parts.append(bg)
    x = np.concatenate([p[0] for p in parts])
    y = np.concatenate([np.clip(p[1], 0, 319) for p in parts]).astype(np.int32)
    t = np.concatenate([p[2] for p in parts])
    pol = np.concatenate([p[3] for p in parts])
    order = np.argsort(t, kind="stable")
    return EventBatch(x[order].astype(np.int32), y[order],
                      t[order].astype(np.uint32), pol[order])


def oracle_cached(ev: EventBatch, cfg: FlowConfig, tag: str):
    os.makedirs(CACHE_DIR, exist_ok=True)
    key = hashlib.sha1(
        (tag + repr((len(ev), cfg.width, cfg.height, cfg.filter_size,
                     cfg.min_evts_on_plane, cfg.max_window, cfg.window_jump,
                     cfg.kill_old_flow_time_us))
         ).encode() + ev.t[:64].tobytes()).hexdigest()[:16]
    path = os.path.join(CACHE_DIR, f"oracle_{tag}_{key}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return {k: d[k] for k in d.files}
    t0 = time.time()
    o = run_oracle(ev, cfg)
    print(f"[oracle {tag}] {len(ev)} events in {time.time()-t0:.0f}s",
          flush=True)
    d = {"r_true": o.r_true, "theta_true": o.theta_true, "vx": o.vx,
         "vy": o.vy, "r_local": o.r_local, "theta_local": o.theta_local,
         "scale": o.scale.astype(np.int32)}
    np.savez_compressed(path, **d)
    return d


def metrics(got, orc) -> dict:
    """Error metrics on rows both sides consider flow-valid."""
    ov = orc["r_local"] > 0
    gv = np.asarray(got.r_local) > 0
    both = ov & gv
    n_both = int(both.sum())
    # true (aperture-corrected) flow vectors, px/s
    gtx = np.asarray(got.r_true)[both] * np.cos(np.asarray(got.theta_true)[both])
    gty = np.asarray(got.r_true)[both] * np.sin(np.asarray(got.theta_true)[both])
    otx = orc["r_true"][both] * np.cos(orc["theta_true"][both])
    oty = orc["r_true"][both] * np.sin(orc["theta_true"][both])
    aee_px_ms = float(np.mean(np.hypot(gtx - otx, gty - oty)) / 1e3)
    dot = gtx * otx + gty * oty
    den = np.hypot(gtx, gty) * np.hypot(otx, oty)
    ang = np.degrees(np.arccos(np.clip(dot / np.maximum(den, 1e-30), -1, 1)))
    return {
        "n_valid_oracle": int(ov.sum()),
        "valid_agreement": float((ov == gv).mean()),
        "n_compared": n_both,
        "aee_true_px_per_ms": round(aee_px_ms, 4),
        "ang_err_mean_deg": round(float(ang.mean()), 3),
        "ang_err_p95_deg": round(float(np.percentile(ang, 95)), 3),
        "scale_match": float((np.asarray(got.scale)[both]
                              == orc["scale"][both]).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", nargs="+", default=["bar", "random"])
    ap.add_argument("--n", type=int, default=120_000)
    ap.add_argument("--chunks", nargs="+", type=int, default=list(CHUNKS))
    ap.add_argument("--phases", nargs="+", type=int, default=[1],
                    help="sub_phases values to cross with --chunks "
                         "(FlowConfig.sub_phases)")
    ap.add_argument("--aperture-phases", nargs="+", type=int, default=[0],
                    help="aperture_sub_phases values to cross in "
                         "(0 = coupled to sub_phases)")
    ap.add_argument("--snapshots", nargs="+", type=int, default=[1],
                    help="causal_snapshots values to cross in")
    ap.add_argument("--correction", nargs="+", type=int, default=[0],
                    help="center_correction budgets to cross in "
                         "(0 = off; rank-2 lanes per chunk)")
    ap.add_argument("--coarse-chain", action="store_true",
                    help="correction pass folds phase boundaries only "
                         "(FlowConfig.correction_coarse_chain)")
    ap.add_argument("--wire", default="f16",
                    help="wire format for the engine (bench ships f16)")
    ap.add_argument("--out", default="ACCURACY.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process (the axon env "
                         "var re-registers itself, tests/conftest.py)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    results = {"backend": backend, "n_events": args.n, "streams": {}}
    for kind in args.stream:
        ev = make_stream(kind, args.n)
        rate = len(ev) / max(1, int(ev.t[-1]) - int(ev.t[0])) * 1e6
        print(f"[{kind}] {len(ev)} events, {rate/1e6:.2f} M ev/s", flush=True)
        cfg0 = FlowConfig(width=320, height=320)
        orc = oracle_cached(ev, cfg0, kind)
        rows = []
        for m in args.chunks:
          for P in args.phases:
            for AP in args.aperture_phases:
              for S in args.snapshots:
                for C in args.correction:
                    if m % (P * S) or (AP and ((AP % P and P % AP)
                                               or m % AP)):
                        continue
                    cfg = FlowConfig(width=320, height=320, chunk_size=m,
                                     steps_per_scan=8, sub_phases=P,
                                     aperture_sub_phases=AP,
                                     causal_snapshots=S,
                                     center_correction=C,
                                     correction_coarse_chain=args.coarse_chain,
                                     wire=args.wire)
                    eng = FlowEngine(cfg)
                    t0 = time.time()
                    got = eng.process(ev)
                    dt = time.time() - t0
                    row = {"chunk_size": m, "sub_phases": P,
                           "aperture_sub_phases": AP,
                           "causal_snapshots": S, "correction": C,
                           "coarse_chain": args.coarse_chain,
                           "span_us_per_chunk": round(m / rate * 1e6),
                           **metrics(got, orc)}
                    rows.append(row)
                    print(f"[{kind} m={m} P={P} AP={AP} S={S} C={C}] "
                          f"{json.dumps(row)} ({dt:.0f}s)", flush=True)
        results["streams"][kind] = {"rate_ev_per_s": round(rate), "rows": rows}

    out_json = os.path.join(REPO, args.out)
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
