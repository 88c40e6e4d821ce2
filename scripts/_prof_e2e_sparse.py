"""Stage-level timing of the sparse-wire e2e lane on the real chip.

Breaks one process() call's cost into: host pack2, H2D dispatch+compute
(fenced), aux fetch, payload fetch, host decode. Identifies whether the
lane is upload-, compute-, latency- or decode-bound.
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
from farms_tpu.events.io import EventBatch, synthetic_random_events
from farms_tpu.pipeline.engine import (FlowEngine, scan_chunk2_sparse)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    m = 131072
    spc = 4
    n = m * spc * 2
    cfg = FlowConfig(width=320, height=320, chunk_size=m, wire="sparse",
                     sub_phases=2)
    ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6,
                                 seed=0)
    eng = FlowEngine(cfg)
    # warmup/compile
    eng.process(ev)
    eng.reset()

    # ---- pack ----
    t0 = time.perf_counter()
    packed, aux2, _ = eng.pack2(ev, steps_per_call=spc)
    t_pack = time.perf_counter() - t0
    bases, escapes = aux2
    print(json.dumps({"stage": "pack2", "ms": round(t_pack * 1e3, 1),
                      "calls": int(packed.shape[0])}), flush=True)

    # ---- dispatch + compute (fence via aux fetch of last call) ----
    t0 = time.perf_counter()
    outs = []
    for c in range(packed.shape[0]):
        eng.state, out = scan_chunk2_sparse(
            eng.state, jnp.asarray(packed[c]), jnp.asarray(bases[c]),
            jnp.asarray(escapes[c]), cfg)
        outs.append(out)
    t_disp = time.perf_counter() - t0
    print(json.dumps({"stage": "dispatch_async", "ms": round(t_disp * 1e3, 1)}),
          flush=True)

    t0 = time.perf_counter()
    a_last = np.asarray(outs[-1][0])
    t_fence = time.perf_counter() - t0
    print(json.dumps({"stage": "compute+aux_fetch_last",
                      "ms": round(t_fence * 1e3, 1),
                      "aux_MB": round(a_last.nbytes / 1e6, 2)}), flush=True)

    # ---- per-call fetch timings (now that compute is done) ----
    for c, out in enumerate(outs):
        t0 = time.perf_counter()
        a = np.asarray(out[0])
        t_aux = time.perf_counter() - t0
        cp, cv = (int(v) for v in a[-8:].view(np.int32))
        k = cp + cv
        b = 4096
        while b < k:
            b *= 2
        t0 = time.perf_counter()
        pay = np.asarray(out[1][:min(b, out[1].shape[0])])
        t_pay = time.perf_counter() - t0
        print(json.dumps({"stage": f"fetch_call{c}",
                          "aux_ms": round(t_aux * 1e3, 1),
                          "pay_ms": round(t_pay * 1e3, 1),
                          "cp": cp, "cv": cv,
                          "pay_kB": round(pay.nbytes / 1e3, 1)}), flush=True)
    print(json.dumps({"done": True}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
