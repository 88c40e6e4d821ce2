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


def _sub_phase_portability(tmp_path, p_save, p_resume, tag):
    """A state saved under sub_phases=p_save must resume exactly under
    sub_phases=p_resume. Write epochs are step*P + p; load_engine
    neutralizes the saved epoch history (maps it below every possible
    future ep_val) because resuming into a SMALLER P shrinks the per-step
    epoch stride and future ep_vals would otherwise collide with saved
    ones, spuriously marking untouched pixels written (ADVICE.md r3)."""
    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   duration_us=30000, jitter_us=20)[:512]
    cfg_a = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                       sub_phases=p_save)
    cfg_b = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                       sub_phases=p_resume)

    # continuation under p_resume of a p_save-saved state == p_save first
    # half then p_resume second half run without the checkpoint round-trip
    eng = FlowEngine(cfg_a)
    eng.process(ev[:256])
    path = save_engine(eng, str(tmp_path / f"xp_{tag}"))

    direct = FlowEngine(cfg_a)
    direct.process(ev[:256])
    want = FlowEngine(cfg_b)
    # collision-free continuation oracle: carry the surfaces over but
    # restart the epoch history the same way load_engine does
    import jax.numpy as jnp
    st = direct.state
    want.state = st._replace(
        epoch=jnp.where(st.epoch >= 0, jnp.int32(-2), st.epoch))
    want._t0 = direct._t0
    expected = want.process(ev[256:])

    resumed = load_engine(FlowEngine(cfg_b), path)
    got = resumed.process(ev[256:])
    np.testing.assert_array_equal(expected.scale, got.scale)
    np.testing.assert_allclose(expected.r_true, got.r_true, rtol=1e-6)
    np.testing.assert_array_equal(expected.r_local > 0, got.r_local > 0)


def test_checkpoint_sub_phases_increasing(tmp_path):
    _sub_phase_portability(tmp_path, p_save=1, p_resume=4, tag="up")


def test_checkpoint_sub_phases_decreasing(tmp_path):
    # the direction that used to corrupt state: P=4-saved epochs (stride
    # 4 per step) collide with P=1 future ep_vals unless neutralized
    _sub_phase_portability(tmp_path, p_save=4, p_resume=1, tag="down")
