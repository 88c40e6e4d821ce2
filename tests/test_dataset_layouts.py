"""Real-dataset ingestion: Event Camera Dataset / DAVIS240 layout support.

BASELINE config 4 names DAVIS240 sequences whose `events.txt` ships
`t x y p` rows with t in float seconds - a different column order and
time unit than the reference's `x y t p` integer microseconds
(vFlow.cpp:173-188). These tests pin the layout/units handling, the
converter to the reference layout, and the config-4 style generator.
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import (EventBatch, convert_events_txt,
                                 load_events_txt, synthetic_rotating_shapes,
                                 write_events_davis_txt, write_events_txt)
from farms_tpu.pipeline.engine import FlowEngine


def _sample_batch():
    rng = np.random.default_rng(0)
    n = 500
    return EventBatch(
        x=rng.integers(0, 240, n).astype(np.int32),
        y=rng.integers(0, 180, n).astype(np.int32),
        t=np.sort(rng.integers(1000, 2_000_000, n)).astype(np.uint32),
        pol=rng.integers(0, 2, n).astype(np.int32),
    )


def test_davis_layout_roundtrip(tmp_path):
    ev = _sample_batch()
    path = str(tmp_path / "davis.txt")
    write_events_davis_txt(ev, path)
    got = load_events_txt(path, layout="txyp", time_unit="s")
    np.testing.assert_array_equal(got.x, ev.x)
    np.testing.assert_array_equal(got.y, ev.y)
    np.testing.assert_array_equal(got.pol, ev.pol)
    # float-second write keeps 9 decimals -> exact microsecond roundtrip
    np.testing.assert_array_equal(got.t, ev.t)


def test_davis_layout_would_misparse_as_reference(tmp_path):
    """The guard this feature exists for: reading a DAVIS file with the
    reference layout misparses columns (t-as-x), so the loader must not
    silently default."""
    ev = _sample_batch()
    path = str(tmp_path / "davis.txt")
    write_events_davis_txt(ev, path)
    wrong = load_events_txt(path)  # reference layout, microseconds
    assert not np.array_equal(wrong.x, ev.x)


def test_converter_to_reference_layout(tmp_path):
    ev = _sample_batch()
    src = str(tmp_path / "davis.txt")
    dst = str(tmp_path / "converted.txt")
    write_events_davis_txt(ev, src)
    convert_events_txt(src, dst, layout="txyp", time_unit="s")
    got = load_events_txt(dst)       # native/reference path reads it
    np.testing.assert_array_equal(got.x, ev.x)
    np.testing.assert_array_equal(got.t, ev.t)


def test_negative_polarity_clamped(tmp_path):
    path = str(tmp_path / "neg.txt")
    with open(path, "w") as fh:
        fh.write("0.001000000 3 4 -1\n0.002000000 5 6 1\n")
    got = load_events_txt(path, layout="txyp", time_unit="s")
    np.testing.assert_array_equal(got.pol, [0, 1])
    np.testing.assert_array_equal(got.t, [1000, 2000])


def test_unknown_layout_rejected():
    with pytest.raises(ValueError):
        load_events_txt("x.txt", layout="ptyx")
    with pytest.raises(ValueError):
        load_events_txt("x.txt", time_unit="ms")


def test_rotating_shapes_regime():
    """Generator produces a chronological 240x180 stream whose valid flow
    is tangential (|v| = omega * r) - the config-4 regime."""
    ev = synthetic_rotating_shapes(duration_us=150_000,
                                   omega_rad_s=2 * np.pi, seed=1)
    assert len(ev) > 3000
    assert (np.diff(ev.t.astype(np.int64)) >= 0).all()
    assert ev.x.min() >= 0 and ev.x.max() < 240
    assert ev.y.min() >= 0 and ev.y.max() < 180

    cfg = FlowConfig(width=240, height=180, chunk_size=1024,
                     steps_per_scan=4)
    out = FlowEngine(cfg).process(ev[:8192])
    valid = out.r_local > 0
    assert valid.sum() > 100
    # ground truth: tangential motion, |v| = omega * r. The reference's
    # atan2(a, b) argument order rotates reported flow 90 degrees
    # (vFlow.cpp:1374; cf. a +x bar carrying its speed in Vy), so the
    # *reported* vectors for a rotating scene are radial.
    cx, cy = 120.0, 90.0
    rx = out.x[valid] - cx
    ry = out.y[valid] - cy
    r = np.hypot(rx, ry)
    vx = out.r_true[valid] * np.cos(out.theta_true[valid])
    vy = out.r_true[valid] * np.sin(out.theta_true[valid])
    speed = np.hypot(vx, vy)
    ok = (r > 10) & (speed > 0)
    radial = np.abs(vx * rx + vy * ry) / np.maximum(r * speed, 1e-9)
    assert np.median(radial[ok]) > 0.7     # 90-degree convention: radial
    assert 0.7 < np.median(speed[ok] / (2 * np.pi * r[ok])) < 1.5
