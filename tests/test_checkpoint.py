"""Checkpoint/resume: an interrupted+resumed run equals an uninterrupted one."""
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.checkpoint import load_engine, save_engine
from farms_tpu.pipeline.engine import FlowEngine


def test_checkpoint_resume_equals_oneshot(tmp_path):
    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   duration_us=30000, jitter_us=20)[:512]
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)

    one = FlowEngine(cfg).process(ev)

    eng = FlowEngine(cfg)
    first = eng.process(ev[:256])
    path = save_engine(eng, str(tmp_path / "ckpt"))

    resumed = load_engine(FlowEngine(cfg), path)
    second = resumed.process(ev[256:])

    np.testing.assert_allclose(one.r_true[:256], first.r_true, rtol=1e-6)
    np.testing.assert_allclose(one.r_true[256:], second.r_true, rtol=1e-6)
    np.testing.assert_array_equal(one.scale[256:], second.scale)
    np.testing.assert_array_equal(one.t[256:], second.t)


def test_checkpoint_halo_engine_roundtrip(tmp_path):
    """Save a sharded HaloFlowEngine mid-stream, restore into a fresh one,
    continue: equals the uninterrupted sharded run, and the restored state
    carries the engine's mesh sharding (VERDICT.md round-1 item 9)."""
    from farms_tpu.parallel.halo import HaloFlowEngine

    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   duration_us=30000, jitter_us=20)[:512]
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=10, use_pallas=False)

    one = HaloFlowEngine(cfg, num_devices=4).process(ev)

    eng = HaloFlowEngine(cfg, num_devices=4)
    eng.process(ev[:256])
    path = save_engine(eng, str(tmp_path / "halo_ckpt"))

    resumed = load_engine(HaloFlowEngine(cfg, num_devices=4), path)
    assert (resumed.state.t_surf.sharding
            == resumed._state_shardings.t_surf), "sharding not re-applied"
    second = resumed.process(ev[256:])

    np.testing.assert_allclose(one.r_true[256:], second.r_true, rtol=1e-6)
    np.testing.assert_array_equal(one.scale[256:], second.scale)


def test_checkpoint_portable_across_engines(tmp_path):
    """A single-device checkpoint restores into a sharded halo engine
    (and the continuation matches the single-device continuation)."""
    from farms_tpu.parallel.halo import HaloFlowEngine

    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   duration_us=30000, jitter_us=20)[:512]
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=10, use_pallas=False)

    single = FlowEngine(cfg)
    single.process(ev[:256])
    path = save_engine(single, str(tmp_path / "port_ckpt"))
    want = single.process(ev[256:])

    halo = load_engine(HaloFlowEngine(cfg, num_devices=4), path)
    got = halo.process(ev[256:])
    np.testing.assert_allclose(want.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(want.scale, got.scale)


def test_checkpoint_rejects_wrong_geometry(tmp_path):
    import pytest

    cfg = FlowConfig(width=64, height=64)
    eng = FlowEngine(cfg)
    path = save_engine(eng, str(tmp_path / "geo"))
    other = FlowEngine(FlowConfig(width=32, height=32))
    with pytest.raises(ValueError):
        load_engine(other, path)


def test_checkpoint_across_sub_phase_settings(tmp_path):
    """A state saved under one sub_phases setting must restore cleanly
    into an engine with another: epoch values are step*P + p, strictly
    monotone across steps for any P, so the restored engine's next write
    epochs can never collide with saved ones."""
    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   duration_us=30000, jitter_us=20)[:512]
    cfg1 = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                      sub_phases=1)
    cfg4 = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                      sub_phases=4)

    # continuation under P=4 of a P=1-saved state == P=1 first half then
    # P=4 second half run without the checkpoint round-trip
    eng = FlowEngine(cfg1)
    eng.process(ev[:256])
    path = save_engine(eng, str(tmp_path / "xp"))

    direct = FlowEngine(cfg1)
    direct.process(ev[:256])
    direct.cfg = cfg4            # continue with phased steps
    want = FlowEngine(cfg4)
    want.state, want._t0 = direct.state, direct._t0
    expected = want.process(ev[256:])

    resumed = load_engine(FlowEngine(cfg4), path)
    got = resumed.process(ev[256:])
    np.testing.assert_array_equal(expected.scale, got.scale)
    np.testing.assert_allclose(expected.r_true, got.r_true, rtol=1e-6)
    np.testing.assert_array_equal(expected.r_local > 0, got.r_local > 0)
