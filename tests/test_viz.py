"""Visualization smoke test: figures are produced for a real flow run."""
import os

import pytest

matplotlib = pytest.importorskip("matplotlib")

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.viz import render_flow_windows


def test_render_flow_windows(tmp_path):
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=25000, jitter_us=10)[:400]
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)
    out = FlowEngine(cfg).process(ev)
    paths = render_flow_windows(ev, out, str(tmp_path / "viz"),
                                width=64, height=64, max_windows=2)
    assert len(paths) >= 1
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 10_000
