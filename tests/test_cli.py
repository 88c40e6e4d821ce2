"""End-to-end CLI test: mirror of the reference executable's contract."""
import numpy as np
import pytest

from farms_tpu.cli import build_parser, main
from farms_tpu.events.io import (
    read_flow_txt,
    synthetic_translating_bar,
    write_events_txt,
)


def test_parser_defaults_match_reference():
    # reference defaults: main.cpp:21-31
    args = build_parser().parse_args(["--filename", "f"])
    assert args.height == 320 and args.width == 320
    assert args.filtersize == 3
    assert args.inlierCheck == 5
    assert args.num_events is None


def test_numevents_spellings():
    # three accepted spellings (main.cpp:43-45)
    for flag in ("--numEvents", "--numevents", "--NUMEVENTS"):
        args = build_parser().parse_args(["--filename", "f", flag, "7"])
        assert args.num_events == 7


def test_cli_end_to_end(tmp_path, capsys):
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=20000, jitter_us=10)[:300]
    base = str(tmp_path / "events")
    write_events_txt(ev, base)

    rc = main([
        "--filename", base, "--width", "64", "--height", "64",
        "--chunk-size", "64", "--steps-per-scan", "2",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "[Benchmark Main] : Processing time" in captured  # main.cpp:201
    assert "events/sec" in captured

    out = read_flow_txt(base + "_FARMSOut_batch.txt")
    assert len(out) == 300
    valid = out.r_local > 0
    assert valid.mean() > 0.3
    # flow direction of a +x-translating bar is +y (reference convention)
    med = np.degrees(np.median(out.theta_local[valid]))
    assert abs(med - 90) < 20


def test_cli_serial_mode(tmp_path, capsys):
    """--SERIAL 1 reproduces the reference streaming mode's observable
    contract: 'Running serially', per-event 'Local <us> <cum>' lines,
    'true <us> <cum>' lines for valid flow, compute-only benchmark
    duration, and NO output file (vFlow.cpp:488-489, 641, 719, 730-737)."""
    import os
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:80]
    base = str(tmp_path / "small")
    write_events_txt(ev, base)
    rc = main([
        "--filename", base, "--width", "48", "--height", "48",
        "--SERIAL", "1", "--numEvents", "50",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Running serially " in captured            # main.cpp:160
    local_lines = [ln for ln in captured.splitlines()
                   if ln.startswith("Local ")]
    true_lines = [ln for ln in captured.splitlines()
                  if ln.startswith("true ")]
    assert len(local_lines) == 50                     # one per event
    assert 0 < len(true_lines) <= 50                  # valid events only
    # running totals are cumulative sums of the per-event column
    deltas = [int(ln.split()[1]) for ln in local_lines]
    cums = [int(ln.split()[2]) for ln in local_lines]
    assert cums == list(np.cumsum(deltas))
    assert "[Benchmark Main] : Processing time" in captured
    assert not os.path.exists(base + "_FARMSOut_batch.txt")


def test_cli_engine_selection(tmp_path, capsys):
    """Every shipped engine is reachable from the CLI (VERDICT round-1
    item 8); each produces the full output file on the 8-device mesh."""
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:96]
    base = str(tmp_path / "eng")
    write_events_txt(ev, base)
    outs = {}
    for engine, ndev in [("single", 0), ("dp", 4), ("spatial", 2),
                         ("halo", 2)]:
        rc = main([
            "--filename", base, "--width", "48", "--height", "48",
            "--chunk-size", "32", "--engine", engine,
            "--devices", str(ndev), "--max-window", "10",
        ])
        assert rc == 0, engine
        outs[engine] = read_flow_txt(base + "_FARMSOut_batch.txt")
        assert len(outs[engine]) == len(ev)
    ref = outs["single"].as_matrix()
    for engine in ("dp", "spatial", "halo"):
        np.testing.assert_allclose(outs[engine].as_matrix(), ref,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=engine)


def test_cli_backend_selection(tmp_path):
    """--backend reaches the per-event and forced-dense formulations."""
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:64]
    base = str(tmp_path / "bk")
    write_events_txt(ev, base)
    mats = {}
    for bk in ("dense", "perevent"):
        rc = main([
            "--filename", base, "--width", "48", "--height", "48",
            "--chunk-size", "32", "--backend", bk, "--max-window", "10",
        ])
        assert rc == 0, bk
        mats[bk] = read_flow_txt(base + "_FARMSOut_batch.txt").as_matrix()
    # cross-formulation bound: dense and per-event differ by FMA
    # contraction (~1e-3 relative on a fraction of a percent of values;
    # characterized by the sweep tests)
    np.testing.assert_allclose(mats["perevent"], mats["dense"],
                               rtol=5e-3, atol=1e-4)


def test_cli_new_knobs_reachable(tmp_path, capsys):
    """--sub-phases/--wire/--layout/--time-unit flow through to the engine
    and the DAVIS layout parses end-to-end."""
    import numpy as np

    from farms_tpu.events.io import (read_flow_txt,
                                     synthetic_translating_bar,
                                     write_events_davis_txt)

    ev = synthetic_translating_bar(width=48, height=48, bar_len=14,
                                   duration_us=12000, jitter_us=10)[:200]
    base = str(tmp_path / "dv")
    write_events_davis_txt(ev, base + ".txt")
    rc = main(["--filename", base, "--width", "48", "--height", "48",
                   "--layout", "txyp", "--time-unit", "s",
                   "--sub-phases", "2", "--aperture-sub-phases", "4",
                   "--wire", "f16", "--chunk-size", "32",
                   "--numEvents", str(len(ev))])
    assert rc == 0
    out = read_flow_txt(base + "_FARMSOut_batch.txt")
    assert len(out) == len(ev)
    np.testing.assert_array_equal(out.x, ev.x)
    assert (out.r_true != 0).sum() > 20


def test_preset_members_yield_to_explicit_flags(tmp_path):
    """Explicit flags always win over preset members: `--preset benchmark
    --chunk-size 1` must give exact serial semantics, not a sub_phases
    divisibility crash (code-review r4 finding)."""
    from farms_tpu.cli import _resolve_operating_point
    from farms_tpu.config import FlowConfig

    p = build_parser()
    args = p.parse_args(["--filename", "x", "--preset", "benchmark",
                         "--chunk-size", "1"])
    chunk, phases, ap, snaps, corr, cchain, wire = _resolve_operating_point(args)
    assert (chunk, phases, ap, snaps) == (1, 1, 0, 1)
    assert wire == "f16"          # non-conflicting members still apply
    # FlowConfig must accept the resolved bundle
    FlowConfig(chunk_size=chunk, sub_phases=phases,
               aperture_sub_phases=ap, causal_snapshots=snaps, wire=wire)

    # explicit sub-phases conflicting with an explicit chunk still raise
    args = p.parse_args(["--filename", "x", "--preset", "benchmark",
                         "--chunk-size", "9", "--sub-phases", "2"])
    chunk, phases, ap, snaps, corr, cchain, wire = _resolve_operating_point(args)
    import pytest
    with pytest.raises(ValueError):
        FlowConfig(chunk_size=chunk, sub_phases=phases,
                   aperture_sub_phases=ap, causal_snapshots=snaps)
