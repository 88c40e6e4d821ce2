"""Event/flow text I/O round trips and synthetic generators."""
import numpy as np

from farms_tpu.events.io import (
    EventBatch,
    FlowOutput,
    load_events_txt,
    read_flow_txt,
    synthetic_random_events,
    synthetic_translating_bar,
    write_events_txt,
    write_flow_txt,
)


def test_events_txt_roundtrip(tmp_path):
    ev = synthetic_random_events(500, width=100, height=80, seed=3)
    path = write_events_txt(ev, str(tmp_path / "events"))
    back = load_events_txt(path)
    np.testing.assert_array_equal(ev.x, back.x)
    np.testing.assert_array_equal(ev.y, back.y)
    np.testing.assert_array_equal(ev.t, back.t)
    np.testing.assert_array_equal(ev.pol, back.pol)


def test_load_clamps_negative_polarity(tmp_path):
    p = tmp_path / "neg.txt"
    p.write_text("3 4 100 -1\n5 6 200 1\n")
    ev = load_events_txt(str(p))
    assert list(ev.pol) == [0, 1]  # vFlow.cpp:246-247


def test_load_max_events(tmp_path):
    p = tmp_path / "cap.txt"
    p.write_text("".join(f"{i} {i} {i * 10} 1\n" for i in range(50)))
    ev = load_events_txt(str(p), max_events=7)
    assert len(ev) == 7


def test_flow_txt_roundtrip(tmp_path):
    n = 64
    rng = np.random.default_rng(0)
    out = FlowOutput(
        x=rng.integers(0, 320, n).astype(np.int32),
        y=rng.integers(0, 320, n).astype(np.int32),
        t=rng.integers(0, 10**6, n).astype(np.uint32),
        pol=rng.integers(0, 2, n).astype(np.int32),
        r_true=rng.normal(size=n) ** 2,
        theta_true=rng.uniform(-np.pi, np.pi, n),
        vx=rng.normal(size=n),
        vy=rng.normal(size=n),
        r_local=rng.normal(size=n) ** 2,
        theta_local=rng.uniform(-np.pi, np.pi, n),
        scale=(rng.integers(0, 11, n) * 5).astype(np.int32),
    )
    path = write_flow_txt(out, str(tmp_path / "run"))
    assert path.endswith("_FARMSOut_batch.txt")  # vFlow.cpp:131
    back = read_flow_txt(path)
    np.testing.assert_array_equal(out.x, back.x)
    np.testing.assert_array_equal(out.scale, back.scale)
    # text format carries 6 significant digits
    np.testing.assert_allclose(out.r_true, back.r_true, rtol=1e-4)
    np.testing.assert_allclose(out.vx, back.vx, rtol=1e-4)


def test_synthetic_bar_is_sorted_and_in_bounds():
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=20000)
    assert np.all(np.diff(ev.t.astype(np.int64)) >= 0)
    assert ev.x.min() >= 0 and ev.x.max() < 64
    assert ev.y.min() >= 0 and ev.y.max() < 64


def test_synthetic_random_sorted():
    ev = synthetic_random_events(1000, width=64, height=64)
    assert np.all(np.diff(ev.t.astype(np.int64)) >= 0)
