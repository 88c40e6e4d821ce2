"""Per-phase cost breakdown at the operating point (real TPU).

Answers: where does the extra time go when sub_phases rises (P=1..8)?
Isolates, per chunk of 131072 events on the 320x320 bench sensor:
  - full micro_step scan at each P (the engine as shipped, pallas auto)
  - scatter pair alone (t_surf + epoch), P scatters per step
  - local stage alone (pallas local_flow) x P
  - aperture stage alone (integral + pallas scales) x P
  - onehot output gather alone x P

Timing fence: full-buffer reduction fetch (block_until_ready is unreliable
through the tunnel). Results print as JSON lines.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/farms_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events
from farms_tpu.ops.dense_flow import dense_aperture, dense_local_flow, onehot_gather
from farms_tpu.ops.pallas import kernels as pk
from farms_tpu.pipeline.engine import scan_chunk
from farms_tpu.state.surfaces import init_state

M = 131072
SPC = 8
W = H = 320


def fence(x):
    return float(jnp.sum(x))


AMORT = 8   # calls dispatched per timed region; one fence at the end
            # (the ~3 ms tunnel dispatch+fence latency otherwise swamps
            # millisecond-scale kernels - first profile run's lesson)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    fence(out[0] if isinstance(out, (tuple, list)) else out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(AMORT):
            out = fn(*args)
        fence(out[0] if isinstance(out, (tuple, list)) else out)
        best = min(best, (time.perf_counter() - t0) / AMORT)
    return best


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    ev = synthetic_random_events(M * SPC, width=W, height=H, rate_hz=5e6,
                                 seed=0)

    for P in (1, 2, 4, 8):
        cfg = FlowConfig(width=W, height=H, chunk_size=M, use_dense=True,
                         wire="f16", sub_phases=P)
        from farms_tpu.pipeline.engine import FlowEngine
        eng = FlowEngine(cfg)
        packed, _ = eng.pack(ev, steps_per_call=SPC, compact=True)
        chunk = jax.device_put(jnp.asarray(packed[0]))

        def full(ch):
            # scan_chunk donates its state arg: make a fresh one per call
            st, out = scan_chunk(init_state(cfg), ch, cfg)
            return out

        dt = timeit(full, chunk)
        print(json.dumps({"stage": "full", "P": P,
                          "us_per_chunk": round(dt / SPC * 1e6, 1),
                          "Mev_s": round(M * SPC / dt / 1e6, 2)}), flush=True)

    # ---- isolated stages at the chunk granularity --------------------------
    cfg = FlowConfig(width=W, height=H, chunk_size=M, use_dense=True,
                     wire="f16", sub_phases=1)
    Wa, Ha = cfg.array_width, cfg.array_height
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, W, size=(SPC, M), dtype=np.int32))
    ys = jnp.asarray(rng.integers(0, H, size=(SPC, M), dtype=np.int32))
    ts = jnp.asarray(np.sort(rng.integers(1, 1 << 20, size=(SPC, M))
                             .astype(np.int32), axis=1))
    t_surf0 = jnp.asarray(rng.integers(1, 1 << 20, size=(Wa, Ha),
                                       dtype=np.int32))
    fl0 = jnp.asarray(rng.random((Wa, Ha), dtype=np.float32))
    fv0 = jnp.asarray(rng.standard_normal((Wa, Ha), dtype=np.float32))

    for P in (1, 2, 4, 8):
        mp = M // P

        @jax.jit
        def scatter_only(t_surf, epoch, xs, ys, ts):
            def body(carry, xs_):
                t_surf, epoch = carry
                x, y, t = xs_
                for p in range(P):
                    sl = slice(p * mp, (p + 1) * mp)
                    t_surf = t_surf.at[x[sl], y[sl]].set(
                        t[sl], mode="drop", unique_indices=True)
                    epoch = epoch.at[x[sl], y[sl]].set(
                        jnp.int32(p), mode="drop", unique_indices=True)
                return (t_surf, epoch), t_surf[0, 0]
            (t_surf, epoch), o = jax.lax.scan(body, (t_surf, epoch),
                                              (xs, ys, ts))
            return t_surf, o

        ep0 = jnp.full((Wa, Ha), -1, jnp.int32)
        dt = timeit(scatter_only, t_surf0, ep0, xs, ys, ts)
        print(json.dumps({"stage": "scatter_pair", "P": P,
                          "us_per_chunk": round(dt / SPC * 1e6, 1),
                          "ns_per_event": round(dt / (SPC * M) * 1e9, 2)}),
              flush=True)

        @jax.jit
        def local_only(tq, tp):
            def body(carry, _):
                tq, tp = carry
                acc = jnp.float32(0)
                for p in range(P):
                    vx, vy, gate, ln, th = pk.local_flow_pallas(tq, tp, cfg)
                    acc = acc + vx[0, 0]
                return (tq, tp + 1), acc
            _, o = jax.lax.scan(body, (tq, tp), None, length=SPC)
            return o

        dt = timeit(local_only, t_surf0, t_surf0 + 7)
        print(json.dumps({"stage": "local_pallas", "P": P,
                          "us_per_chunk": round(dt / SPC * 1e6, 1)}),
              flush=True)

        @jax.jit
        def apert_only(fl, fvx, fvy):
            def body(carry, _):
                fl, fvx, fvy = carry
                acc = jnp.float32(0)
                for p in range(P):
                    tvx, tvy, sc = pk.aperture_pallas(fl, fvx, fvy, cfg)
                    acc = acc + tvx[0, 0]
                return (fl + 1, fvx, fvy), acc
            _, o = jax.lax.scan(body, (fl, fvx, fvy), None, length=SPC)
            return o

        dt = timeit(apert_only, fl0, fv0, fv0)
        print(json.dumps({"stage": "aperture_pallas", "P": P,
                          "us_per_chunk": round(dt / SPC * 1e6, 1)}),
              flush=True)

        @jax.jit
        def gather_only(maps, xs, ys):
            def body(carry, xs_):
                maps = carry
                x, y = xs_
                outs = []
                for p in range(P):
                    sl = slice(p * mp, (p + 1) * mp)
                    outs.append(onehot_gather(maps, x[sl], y[sl], Wa, Ha))
                return maps + 1, jnp.concatenate(outs, axis=1)[0, 0]
            _, o = jax.lax.scan(body, maps, (xs, ys))
            return o

        maps0 = jnp.stack([fl0] * 5, 0)
        dt = timeit(gather_only, maps0, xs, ys)
        print(json.dumps({"stage": "onehot_gather", "P": P,
                          "us_per_chunk": round(dt / SPC * 1e6, 1)}),
              flush=True)

    print(json.dumps({"done": True}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
