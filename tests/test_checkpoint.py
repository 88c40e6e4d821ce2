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


def test_checkpoint_rejects_wrong_geometry(tmp_path):
    import pytest

    cfg = FlowConfig(width=64, height=64)
    eng = FlowEngine(cfg)
    path = save_engine(eng, str(tmp_path / "geo"))
    other = FlowEngine(FlowConfig(width=32, height=32))
    with pytest.raises(ValueError):
        load_engine(other, path)
