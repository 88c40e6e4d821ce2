"""Command-line interface mirroring the reference FARMS_Flow executable.

All reference flags are supported with identical spellings and defaults
(main.cpp:36-47: --filename --height --width --filtersize --inlierCheck
--numEvents/--numevents/--NUMEVENTS --SERIAL --v), plus TPU-specific
batching/sharding flags the reference has no counterpart for. Output and
the closing benchmark line match the reference formats
(vFlow.cpp:433-442, main.cpp:201-209).

Modes, matching the reference dispatch (main.cpp:193-209):

Deliberate deviation: the reference defaults `Serial_ = true` (main.cpp:31)
so a bare invocation streams per-event timings and writes no output file.
Here the default is `--SERIAL 0` (batch) because batch is the only mode
that produces the `_FARMSOut_batch.txt` artifact the MATLAB pipeline (and
any downstream consumer) expects; serial mode remains available and
identical in behavior via `--SERIAL 1`.

- `--SERIAL 0` (default): batch processing - the chunked engine; writes
  `<filename>_FARMSOut_batch.txt` and times the whole processing loop.
- `--SERIAL 1`: event-serial streaming - per-event `Local <us> <cum>` /
  `true <us> <cum>` phase prints, NO output file (the reference's writes
  are commented out, vFlow.cpp:488-489, 730-737), and a compute-only
  benchmark duration (vFlow.cpp:645, 723).

Every shipped engine is reachable: `--engine single|dp|spatial|halo`
selects the sharding strategy (parallel/), `--backend auto|pallas|dense|
perevent` the compute formulation, and `--multihost` initializes
jax.distributed before any device use.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import load_events_txt, write_flow_txt


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="farms-flow",
        description="TPU-native aperture-robust multi-scale event optical flow",
    )
    # reference flags (main.cpp:36-47)
    p.add_argument("--filename", type=str, required=True,
                   help="events file name without extension (.txt)")
    p.add_argument("--height", type=int, default=320, help="sensor height")
    p.add_argument("--width", type=int, default=320, help="sensor width")
    p.add_argument("--filtersize", type=int, default=3,
                   help="neighborhood size for plane fitting")
    p.add_argument("--inlierCheck", type=int, default=5,
                   help="minimum inliers to validate a plane")
    p.add_argument("--numEvents", "--numevents", "--NUMEVENTS",
                   dest="num_events", type=int, default=None,
                   help="max number of events to process")
    p.add_argument("--SERIAL", type=int, default=0,
                   help="1 = event-serial streaming mode with per-event "
                        "phase timing, no output file (reference run()); "
                        "0 = batched processing (default, runFileCopy)")
    p.add_argument("--v", type=int, default=0, help="verbose mode")
    # TPU-native flags
    p.add_argument("--preset", type=str, default=None,
                   choices=["benchmark", "fidelity", "exact"],
                   help="validated (chunk-size, sub-phases, wire) bundles "
                        "(ACCURACY.md): benchmark = the BENCH operating "
                        "point (131072 @ P=2, f16 wire - highest measured "
                        "throughput inside the accuracy budget); fidelity = "
                        "131072 @ P=8 (>=95%% validity agreement vs the "
                        "event-serial semantics); exact = chunk 1 "
                        "(bit-exact reference semantics). Explicit "
                        "--chunk-size/--sub-phases/--wire flags override "
                        "preset members")
    p.add_argument("--chunk-size", type=int, default=None,
                   help="events per micro-batch (1 = exact serial "
                        "semantics; default: the benchmark preset's 131072 "
                        "on a TPU backend, 4096 elsewhere)")
    p.add_argument("--steps-per-scan", type=int, default=8,
                   help="micro-steps fused per device dispatch")
    p.add_argument("--window-jump", type=int, default=5,
                   help="aperture scale stride")
    p.add_argument("--max-window", type=int, default=50,
                   help="largest aperture half-window")
    p.add_argument("--kill-old-flow-us", type=int, default=500,
                   help="freshness gate for aperture pooling (us)")
    p.add_argument("--sub-phases", type=int, default=None,
                   help="causal groups per micro-batch: the accuracy "
                        "granularity is chunk-size/sub-phases (ACCURACY.md; "
                        "default: the benchmark preset's 2 on a TPU "
                        "backend, 1 elsewhere)")
    p.add_argument("--aperture-sub-phases", type=int, default=None,
                   help="aperture pooling phases per chunk: a multiple "
                        "of --sub-phases pools on finer groups, a "
                        "divisor pools once per sub-phases/A plane-fit "
                        "groups (the fidelity preset's lever); 0 = "
                        "coupled (default outside presets)")
    p.add_argument("--correction", type=int, default=None,
                   help="center-correction budget: rank-2 lanes re-fit "
                        "per chunk (FlowConfig.center_correction; 0 = "
                        "off)")
    p.add_argument("--correction-chain", type=str, default=None,
                   choices=("full", "coarse"),
                   help="correction-pass visibility chain: every "
                        "sub-group boundary ('full') or plane-fit phase "
                        "boundaries only ('coarse'; cheaper, the "
                        "fidelity preset's choice)")
    p.add_argument("--snapshots", type=int, default=None,
                   help="causal visibility snapshots per sub-phase "
                        "(FlowConfig.causal_snapshots; the fidelity "
                        "preset uses 2; default 1 outside presets)")
    p.add_argument("--wire", type=str, default=None,
                   choices=["f32", "f16", "sparse"],
                   help="device->host output precision: f16 = 9 B/event "
                        "(~0.05%% component quantization), f32 = 17 B/event, "
                        "sparse = validity-sparse f16 (~4.6 B/event + 5 B "
                        "per valid event). Default: f16 on a TPU backend "
                        "(the benchmark preset), f32 elsewhere")
    p.add_argument("--layout", type=str, default="xytp",
                   choices=["xytp", "txyp"],
                   help="input column order: xytp = reference layout, "
                        "txyp = Event Camera Dataset / DAVIS events.txt")
    p.add_argument("--time-unit", type=str, default="us",
                   choices=["us", "s"],
                   help="input timestamp unit (DAVIS txyp files use "
                        "float seconds)")
    p.add_argument("--y-clamp-quirk", action="store_true",
                   help="replicate the reference's y-clamped-by-width bug")
    p.add_argument("--no-output", action="store_true",
                   help="skip writing the output txt (benchmarking)")
    p.add_argument("--engine", type=str, default="single",
                   choices=["single", "dp", "spatial", "halo", "multihost"],
                   help="sharding strategy: single device, event-batch data "
                        "parallel, GSPMD spatial tiling, explicit "
                        "halo-exchange tiling, or the global multi-host "
                        "('tx','ev') mesh (parallel/)")
    p.add_argument("--devices", type=int, default=0,
                   help="number of devices for the selected engine "
                        "(0 = all visible; with --engine single, >1 "
                        "implies --engine dp for back-compat)")
    p.add_argument("--backend", type=str, default="auto",
                   choices=["auto", "pallas", "dense", "perevent"],
                   help="compute formulation: auto = Pallas kernels when "
                        "the geometry fits their VMEM budget, else the XLA "
                        "dense path; perevent = gather-based reference "
                        "formulation")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host) before "
                        "any device use; coordinator/process env per "
                        "JAX_COORDINATOR_ADDRESS etc.")
    return p


def make_engine(cfg: FlowConfig, engine: str, devices: int):
    """Instantiate the selected engine (every shipped strategy reachable)."""
    ndev = devices if devices > 0 else None
    if engine == "dp" or (engine == "single" and devices > 1):
        from farms_tpu.parallel.dp import ShardedFlowEngine
        return ShardedFlowEngine(cfg, num_devices=ndev)
    if engine == "spatial":
        from farms_tpu.parallel.tiling import SpatialFlowEngine
        return SpatialFlowEngine(cfg, num_devices=ndev)
    if engine == "halo":
        from farms_tpu.parallel.halo import HaloFlowEngine
        return HaloFlowEngine(cfg, num_devices=ndev)
    if engine == "multihost":
        from farms_tpu.parallel.multihost import MultiHostFlowEngine
        return MultiHostFlowEngine(cfg)
    from farms_tpu.pipeline.engine import FlowEngine
    return FlowEngine(cfg)


# validated (chunk_size, sub_phases, aperture_sub_phases,
# causal_snapshots, center_correction, coarse_chain, wire) bundles -
# ACCURACY.md / BENCHMARKS.jsonl document the measured throughput/error
# rows for each
_PRESETS = {
    # highest throughput inside the AEE/angular budget: ~60-68 M ev/s
    # on one v5e chip (epoch-less derived-written path)
    "benchmark": (131072, 2, 0, 1, 0, False, "f16"),
    # >= 95% validity agreement vs the event-serial semantics at
    # ~45-48 M ev/s: plane fit at granularity 65536 with visibility
    # snapshots at 8192 and the rank-2 center-correction pass
    # (phase-boundary visibility chain) - 96.3% bar-stream agreement
    # (ACCURACY.md round-5 frontier)
    "fidelity": (131072, 2, 2, 8, 32768, True, "f16"),
    # >= 80% scale-column match for consumers of output column 11
    # (vFlow.cpp:438): the scale argmax needs the WHOLE pipeline at fine
    # granularity - 81.9% match / 99.7% validity agreement at
    # granularity 256 (measured round 5; pooling-only refinement
    # saturates at ~60%, chunk 2048 at ~65% - the round-3 "82% at 2048"
    # figure did not reproduce)
    "scale-faithful": (256, 1, 0, 1, 0, False, "f16"),
    "exact": (1, 1, 0, 1, 0, False, "f32"),
}


def _resolve_operating_point(args):
    """Fill unset operating-point flags from the preset.

    With no --preset either, the default preset is `benchmark` on a TPU
    backend - so a bare `farms-flow --filename X` on the chip reproduces
    the validated BENCH operating point (VERDICT.md r3 item 7) - and a
    small CPU-friendly point (4096, 1, f32) elsewhere, where the 131072
    chunk would swamp host compile/execute times.
    """
    preset = args.preset
    if preset is None:
        import jax
        preset = "benchmark" if jax.default_backend() == "tpu" else None
    chunk, phases, ap, snaps, corr, cchain, wire = _PRESETS.get(
        preset, (4096, 1, 0, 1, 0, False, "f32"))
    user_p = args.sub_phases is not None
    user_ap = args.aperture_sub_phases is not None
    user_s = args.snapshots is not None
    chunk = args.chunk_size if args.chunk_size is not None else chunk
    phases = args.sub_phases if user_p else phases
    ap = args.aperture_sub_phases if user_ap else ap
    snaps = args.snapshots if user_s else snaps
    corr = args.correction if args.correction is not None else corr
    if args.correction_chain is not None:
        cchain = args.correction_chain == "coarse"
    wire = args.wire if args.wire is not None else wire
    # explicit flags always win; PRESET-sourced members that conflict
    # with them reset to neutral instead of crashing FlowConfig
    # validation (e.g. `--chunk-size 1` on a TPU backend must give exact
    # serial semantics, not "sub_phases 2 must divide chunk_size 1")
    if chunk % max(1, phases * snaps):
        if not user_p:
            phases = 1
        if not user_s:
            snaps = 1
    if ap and not user_ap and (
            (ap % phases and phases % ap) or chunk % ap):
        ap = 0
    return chunk, phases, ap, snaps, corr, cchain, wire


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    serial = args.SERIAL == 1
    (chunk_size, sub_phases, ap_phases, snapshots, correction,
     coarse_chain, wire) = _resolve_operating_point(args)
    if args.preset is None and not serial:
        # the implicit default differs by backend (TPU -> the `benchmark`
        # preset's chunked f16 semantics; elsewhere a small f32 point), so
        # say which operating point was resolved (ADVICE.md r4)
        print(
            f"[farms-flow] operating point: chunk_size={chunk_size} "
            f"sub_phases={sub_phases} aperture_sub_phases={ap_phases} "
            f"snapshots={snapshots} correction={correction} wire={wire} "
            "(implicit; pin with --preset or explicit flags)",
            file=sys.stderr)

    if args.multihost:
        from farms_tpu.parallel.multihost import init_distributed
        init_distributed()

    backend = {"auto": (True, None), "pallas": (True, True),
               "dense": (True, False), "perevent": (False, None)}
    use_dense, use_pallas = backend[args.backend]

    cfg = FlowConfig(
        width=args.width,
        height=args.height,
        filter_size=args.filtersize,
        min_evts_on_plane=args.inlierCheck,
        window_jump=args.window_jump,
        max_window=args.max_window,
        kill_old_flow_time_us=args.kill_old_flow_us,
        chunk_size=1 if serial else chunk_size,
        steps_per_scan=args.steps_per_scan,
        sub_phases=1 if serial else sub_phases,
        aperture_sub_phases=0 if serial else ap_phases,
        causal_snapshots=1 if serial else snapshots,
        center_correction=0 if serial else correction,
        correction_coarse_chain=coarse_chain,
        wire=wire,
        use_dense=use_dense,
        use_pallas=use_pallas,
        replicate_y_clamp_quirk=args.y_clamp_quirk,
    )

    print(args.filename + ".txt")
    print("Reading input file ")
    max_events = args.num_events
    if serial:
        # serial mode caps the event count at filesize / 18 bytes - the
        # reference's rough ~18-bytes-per-line heuristic (vFlow.cpp:511);
        # batch mode does not (the equivalent cap is commented out,
        # vFlow.cpp:164)
        import os as _os
        path = args.filename if args.filename.endswith(".txt") \
            else args.filename + ".txt"
        try:
            cap = _os.path.getsize(path) // 18
            max_events = cap if max_events is None else min(max_events, cap)
        except OSError:
            pass
    ev = load_events_txt(args.filename, max_events,
                         layout=args.layout, time_unit=args.time_unit)
    print(f"Done reading {len(ev)} Events.")
    if len(ev) == 0:
        print("Unable to open file")  # vFlow.cpp:802
        return 1
    print(f"First time = {int(ev.t[0])}")

    if serial:
        # reference serial mode (main.cpp:159-161, vFlow.cpp:465-826)
        print("Running serially ")
        from farms_tpu.pipeline.serial import SerialFlowEngine
        engine = SerialFlowEngine(cfg)
        print("Processing events ")
        out, duration_us = engine.run(ev)
        print()
        print("Done processing!")
        # no output file in serial mode (writes commented out in the
        # reference, vFlow.cpp:488-489, 730-737)
    else:
        print("Running batch ")
        engine = make_engine(cfg, args.engine, args.devices)
        print("Processing events ")
        t_start = time.perf_counter()
        out = engine.process(ev)
        duration_us = int((time.perf_counter() - t_start) * 1e6)
        print()
        print("Done processing!")
        if not args.no_output:
            print()
            print("Writing output file.")
            write_flow_txt(out, args.filename)

    duration_sec = duration_us / 1e6
    n = len(ev)
    rate = (n - 1) / duration_sec if duration_sec > 0 else float("inf")
    # benchmark line format follows main.cpp:201
    print(
        f"[Benchmark Main] : Processing time   : {duration_us} usec "
        f"{duration_sec} sec  with rate of : {rate} events/sec"
    )
    if args.v:
        valid = np.asarray(out.r_local) > 0
        print(f"[debug Main] : valid flow fraction {valid.mean():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
