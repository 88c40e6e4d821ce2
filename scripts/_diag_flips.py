"""Classify validity-flip causes at the operating-point chunk ratio.

Runs the 96x96 staggered-bar fixture at chunk-span ~30x the freshness
window, diffs engine vs oracle validity, and attributes each flipped event
to a chunking-error mechanism:
  nonwinner   - pixel fires again later in the same chunk (event inherits
                the winner's plane fit)
  tie         - some support-neighborhood pixel's visible stamp equals the
                center stamp (batched view can't order equal stamps; serial
                order is file order)
  interm      - a support neighbor was written multiple times in-chunk with
                at least one write between chunk start and the center event
                (the intermediate stamp is lost to last-write-wins)
  other       - none of the above
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache_cpu")

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.oracle import run_oracle

W = H = 96

def stream():
    parts = []
    for k, t0 in enumerate((1000, 23000, 45000)):
        b = synthetic_translating_bar(width=W, height=H, bar_len=32,
                                      speed_px_per_sec=3000.0,
                                      duration_us=30000, jitter_us=30,
                                      seed=k, t0_us=t0)
        parts.append((b.x, b.y, b.t, b.pol))
    n_bar = sum(len(p[0]) for p in parts)
    n_bg = int(n_bar * 0.4)
    t_end = max(int(p[2][-1]) for p in parts)
    rng = np.random.default_rng(7)
    parts.append((rng.integers(0, W, n_bg).astype(np.int32),
                  rng.integers(0, H, n_bg).astype(np.int32),
                  np.sort(rng.integers(1000, t_end, n_bg)).astype(np.uint32),
                  np.ones(n_bg, dtype=np.int32)))
    x = np.concatenate([p[0] for p in parts]).astype(np.int32)
    y = np.concatenate([p[1] for p in parts]).astype(np.int32)
    t = np.concatenate([p[2] for p in parts])
    pol = np.concatenate([p[3] for p in parts]).astype(np.int32)
    o = np.argsort(t, kind="stable")
    return EventBatch(x[o], y[o], t[o].astype(np.uint32), pol[o])

ev = stream()
n = len(ev)
m = 2048
cfg = FlowConfig(width=W, height=H, chunk_size=m, steps_per_scan=4)
orc = run_oracle(ev, cfg)
t0 = time.time()
got = FlowEngine(cfg).process(ev)
print(f"engine: {time.time()-t0:.0f}s", flush=True)

ov = orc.r_local > 0
gv = np.asarray(got.r_local) > 0
flip = ov != gv
print(f"n={n} flips={int(flip.sum())} agreement={(~flip).mean():.4f}")

# --- classify ---
t_norm = (ev.t - ev.t[0]).astype(np.int64)
chunk_id = np.arange(n) // m
flat = ev.x.astype(np.int64) * H + ev.y
R = cfg.support_radius

# last lane per (chunk, pixel)
last_lane = {}
writes = {}   # (chunk, pixel) -> list of lanes
for i in range(n):
    key = (chunk_id[i], int(flat[i]))
    last_lane[key] = i
    writes.setdefault(key, []).append(i)

cnt = {"nonwinner": 0, "tie": 0, "interm": 0, "other": 0}
for i in np.nonzero(flip)[0]:
    c = chunk_id[i]
    if last_lane[(c, int(flat[i]))] != i:
        cnt["nonwinner"] += 1
        continue
    # support neighborhood pixels
    tie = interm = False
    for dx in range(-R, R + 1):
        for dy in range(-R, R + 1):
            px, py = int(ev.x[i]) + dx, int(ev.y[i]) + dy
            if not (0 <= px < W and 0 <= py < H):
                continue
            key = (c, px * H + py)
            ws = writes.get(key)
            if not ws:
                continue
            for j in ws:
                if j != i and t_norm[j] == t_norm[i]:
                    tie = True
            if len(ws) > 1:
                # any non-final write at/before center's time is lost
                for j in ws[:-1]:
                    if t_norm[j] <= t_norm[i]:
                        interm = True
    if tie:
        cnt["tie"] += 1
    elif interm:
        cnt["interm"] += 1
    else:
        cnt["other"] += 1
print(cnt, flush=True)

# scale-mismatch attribution: how much does sub-phasing stand to win?
both = ov & gv
sm = (np.asarray(got.scale)[both] == orc.scale[both])
print(f"scale match {sm.mean():.3f} on {int(both.sum())}")
