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
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:80]
    base = str(tmp_path / "small")
    write_events_txt(ev, base)
    rc = main([
        "--filename", base, "--width", "48", "--height", "48",
        "--SERIAL", "1", "--steps-per-scan", "16", "--numEvents", "50",
    ])
    assert rc == 0
    out = read_flow_txt(base + "_FARMSOut_batch.txt")
    assert len(out) == 50
