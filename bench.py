"""Throughput benchmark: prints one JSON line for the driver.

Three lanes, mirroring the reference's own methodology and an honest
end-to-end number (VERDICT.md round-1 item 6); `fidelity_*` fields add
the `--preset fidelity` device-lane rate (P=8, A=2, S=2 - 95.3%
validity agreement vs the event-serial oracle, ACCURACY.md):

- **device lane** (the headline `value`): events start in device HBM and
  outputs land in device HBM — the analog of the reference's timed region
  (vFlow.cpp:214-423, main.cpp:201), which also starts from events already
  in RAM vectors and appends to RAM vectors with file I/O outside the
  timer. Each timed call processes a *distinct* chunk whose stamps continue
  the stream's timeline (per-call stamp offset), so the surface-state chain
  is a genuine continuation: staleness kills, causal gating, and epoch
  rollover all run in the regime a real stream hits.
- **e2e lane** (`e2e_events_per_second`): fresh host events each call —
  includes host packing, H2D upload, dispatch, and D2H output unpack
  (`FlowEngine.process`). The gap between the two numbers is host pack +
  PCIe/tunnel transfer cost.

Config: 320x320 sensor (BASELINE.json config 2-style: millions of events,
batched mode) at the *validated* operating point `chunk_size=131072,
sub_phases=2` — the highest-throughput measured point meeting the
accuracy budget (AEE < 0.5 px/ms, ang p95 < 5 deg) against the float64
event-serial oracle at granularity 65536; see ACCURACY.md (which also
lists the high-fidelity sub_phases=8 point). vs_baseline is measured
against the driver's north-star per-chip share: 100 M events/s on a
v5p-16 = 6.25 M events/s per chip (BASELINE.json:5); the reference
itself publishes no numbers (BASELINE.md).
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
from farms_tpu.events.io import EventBatch, synthetic_random_events
from farms_tpu.pipeline.engine import scan_chunk
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.state.surfaces import init_state

BASELINE_PER_CHIP = 100e6 / 16  # north-star / v5p-16 chips


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    # validated operating point (ACCURACY.md): highest-throughput
    # (chunk, sub_phases) point within the accuracy budget vs the
    # event-serial oracle (granularity = chunk/phases = 65536)
    m = int(os.environ.get("FARMS_BENCH_CHUNK", 131072))
    spc = int(os.environ.get("FARMS_BENCH_STEPS", 8))
    n_calls = int(os.environ.get("FARMS_BENCH_CALLS", 16))
    e2e_calls = int(os.environ.get("FARMS_BENCH_E2E_CALLS", 4))
    n = m * spc  # events per scan call
    # f16 wire: 9 B/event D2H (both component pairs f16-packed + aux
    # byte); validated at the operating point by
    # tests/test_golden.py::test_chunked_accuracy_operating_point[f16]
    wire = os.environ.get("FARMS_BENCH_WIRE", "f16")
    phases = int(os.environ.get("FARMS_BENCH_PHASES", 2))
    aphases = int(os.environ.get("FARMS_BENCH_APHASES", 0))
    backend = os.environ.get("FARMS_BENCH_BACKEND", "auto")
    use_pallas = {"auto": None, "pallas": True, "dense": False}[backend]
    snapshots = int(os.environ.get("FARMS_BENCH_SNAPSHOTS", 1))
    cfg = FlowConfig(width=320, height=320, chunk_size=m, use_dense=True,
                     wire=wire, sub_phases=phases,
                     aperture_sub_phases=aphases, use_pallas=use_pallas,
                     causal_snapshots=snapshots)

    ev = synthetic_random_events(n, width=320, height=320, rate_hz=5e6,
                                 seed=0)
    # timeline span of one call's worth of events (plus one mean gap), so
    # call i's stamps continue where call i-1 ended
    span = np.int32(int(ev.t[-1]) + max(1, int(ev.t[-1]) // max(1, n)))

    # ---- device lane -------------------------------------------------------
    # n_calls chunks of genuinely DISTINCT events (seeded per call, stamps
    # continuing the shared timeline), so the measured rate cannot benefit
    # from the compiler or the surfaces reaching a steady state on a
    # repeated spatial pattern (VERDICT.md r3 item 10)
    eng = FlowEngine(cfg)
    chunks = []
    for i in range(n_calls):
        evi = (ev if i == 0 else
               synthetic_random_events(n, width=320, height=320,
                                       rate_hz=5e6, seed=i))
        evi = EventBatch(evi.x, evi.y,
                         (evi.t.astype(np.int64) + i * int(span))
                         .astype(np.uint32), evi.pol)
        # pack() latches t0 from call 0 and keeps the one timeline after
        packed, _ = eng.pack(evi, steps_per_call=spc, compact=True)
        chunks.append(jax.device_put(jnp.asarray(packed[0])))

    # warmup / compile. NOTE: block_until_ready does not reliably wait
    # through the remote-execution tunnel; a scalar materialization of the
    # last output (which depends on the whole state chain) is the fence.
    state = init_state(cfg)
    state, out = scan_chunk(state, chunks[0], cfg)
    checksum = float(jnp.sum(out[0]))
    for c in chunks:  # materialize every shifted chunk before timing: a
        # full-buffer reduction (not a one-element fetch) is the fence,
        # since block_until_ready is unreliable through the remote tunnel
        checksum += float(jnp.sum(c))

    best = 0.0
    for _ in range(2):
        state = init_state(cfg)
        checksum = float(jnp.sum(state.t_surf))
        outs = []
        t0 = time.perf_counter()
        for c in chunks:
            state, out = scan_chunk(state, c, cfg)
            outs.append(out)
        checksum = float(jnp.sum(outs[-1][0]))
        dt = time.perf_counter() - t0
        best = max(best, n_calls * n / dt)

    # ---- fidelity lane: the `--preset fidelity` operating point ----------
    # (chunk 131072, P=8, aperture A=2, snapshots S=2): validity
    # agreement 95.3% vs the event-serial oracle on the structured
    # stream / 97.0% on this random stream (ACCURACY.md round-4
    # frontier). Same device-lane methodology, fewer calls.
    fidelity = 0.0
    if int(os.environ.get("FARMS_BENCH_FIDELITY", 1)):
        import dataclasses
        cfg_f = dataclasses.replace(cfg, sub_phases=8,
                                    aperture_sub_phases=2,
                                    causal_snapshots=2)
        eng_f = FlowEngine(cfg_f)
        packs = []
        for i in range(4):
            evi = synthetic_random_events(n, width=320, height=320,
                                          rate_hz=5e6, seed=100 + i)
            evi = EventBatch(evi.x, evi.y,
                             (evi.t.astype(np.int64) + i * int(span))
                             .astype(np.uint32), evi.pol)
            packed, _ = eng_f.pack(evi, steps_per_call=spc, compact=True)
            packs.append(jax.device_put(jnp.asarray(packed[0])))
        state = init_state(cfg_f)
        state, out = scan_chunk(state, packs[0], cfg_f)
        checksum = float(jnp.sum(out[0]))
        for _ in range(2):
            state = init_state(cfg_f)
            checksum = float(jnp.sum(state.t_surf))
            outs = []
            t0 = time.perf_counter()
            for c in packs:
                state, out = scan_chunk(state, c, cfg_f)
                outs.append(out)
            checksum = float(jnp.sum(outs[-1][0]))
            dt = time.perf_counter() - t0
            fidelity = max(fidelity, len(packs) * n / dt)

    # ---- e2e lane: fresh host events, pack + H2D + D2H included -----------
    # the e2e lane defaults to the sparse wire (validity-sparse f16: exact
    # re-encoding of the f16 wire, tests/test_wire.py) - the lane is
    # transport-bound and this stream is ~2.4% valid
    e2e_wire = os.environ.get("FARMS_BENCH_E2E_WIRE", "sparse")
    e2e = 0.0
    frac_present = frac_valid = 1.0
    if e2e_calls:
        import dataclasses
        cfg_e2e = (cfg if e2e_wire == wire
                   else dataclasses.replace(cfg, wire=e2e_wire))
        eng2 = FlowEngine(cfg_e2e)
        # warmup (compile shares the cache with the device lane)
        eng2.process(EventBatch(ev.x, ev.y, ev.t, ev.pol))
        # best of two passes: the remote transport's round-trip latency
        # varies several-fold run to run (scripts/_prof_e2e_sparse.py),
        # and a single unlucky pass would misrepresent the lane
        for rep in range(2):
            eng2.reset()
            t0 = time.perf_counter()
            for i in range(e2e_calls):
                evi = EventBatch(ev.x, ev.y,
                                 (ev.t.astype(np.int64)
                                  + i * int(span)).astype(np.uint32),
                                 ev.pol)
                out = eng2.process(evi)
            checksum = float(np.sum(out.r_true))  # host arrays
            dt = time.perf_counter() - t0
            e2e = max(e2e, e2e_calls * n / dt)
        frac_present = float(np.mean((out.vx != 0) | (out.vy != 0)
                                     | np.isnan(out.vx)))
        frac_valid = float(np.mean(out.r_local != 0))

    # e2e wire context: the remote-execution tunnel sustains ~27 MB/s per
    # stream / ~50 MB/s on two (scripts/_prof_wire.py), so the e2e lane is
    # transport-bound; report the achieved wire rate so the bound is
    # visible next to the number. Upload is 4 B/event when the compact2
    # delta layout applied to this stream (pack2), else 8
    up_bytes = 8
    if e2e_calls:
        probe = FlowEngine(cfg)
        _, aux2, _ = probe.pack2(ev[: 4 * m])
        if aux2 is not None:
            up_bytes = 4
    if e2e_wire == "sparse":
        # dense aux byte + f16 pairs only for present/valid lanes
        # (measured fractions of this stream)
        down_bytes = 1 + 4 * (frac_present + frac_valid)
    else:
        down_bytes = 9 if e2e_wire == "f16" else 17
    wire_bytes = up_bytes + down_bytes
    print(json.dumps({
        "metric": "events_per_second_single_chip",
        "value": round(best, 1),
        "unit": "events/s",
        "vs_baseline": round(best / BASELINE_PER_CHIP, 3),
        "chunk_size": m,
        "sub_phases": phases,
        "e2e_events_per_second": round(e2e, 1),
        "e2e_vs_baseline": round(e2e / BASELINE_PER_CHIP, 3),
        "e2e_wire_MBps": round(e2e * wire_bytes / 1e6, 1),
        # `--preset fidelity` point (P=8, A=2, S=2): validity agreement
        # 95.3% structured / 97.0% random vs the event-serial oracle
        # (ACCURACY.md)
        "fidelity_events_per_second": round(fidelity, 1),
        "fidelity_vs_baseline": round(fidelity / BASELINE_PER_CHIP, 3),
        "fidelity_validity_agreement": 0.953,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
