"""SerialFlowEngine (streaming mode) vs the chunk_size=1 engine.

The serial driver must produce the same flow results as the golden-tested
chunked engine at chunk_size=1 (both reproduce the reference's strictly
event-serial semantics, vFlow.cpp:465-826 vs 111-460 - same inner math,
different skeleton)."""
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.serial import SerialFlowEngine


def test_serial_matches_chunk1():
    # use_dense=False: the serial driver is built from the same per-event
    # ops as the engine's per-event path, so agreement is tight; the dense
    # formulation differs only by FMA contraction (covered by the sweep
    # tests) and would need a looser bound here.
    cfg = FlowConfig(width=48, height=48, chunk_size=1, steps_per_scan=1,
                     max_window=10, use_dense=False)
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:60]
    ref = FlowEngine(cfg).process(ev)
    got, compute_us = SerialFlowEngine(cfg).run(ev, quiet=True)
    assert compute_us > 0
    np.testing.assert_allclose(got.as_matrix(), ref.as_matrix(),
                               rtol=1e-4, atol=1e-5)


def test_serial_continuation():
    """Feeding a stream in two calls equals one call (t0 latch carries)."""
    cfg = FlowConfig(width=48, height=48, chunk_size=1, steps_per_scan=1,
                     max_window=10)
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=8000, jitter_us=10)[:40]
    one, _ = SerialFlowEngine(cfg).run(ev, quiet=True)
    eng = SerialFlowEngine(cfg)
    a, _ = eng.run(ev[:17], quiet=True)
    b, _ = eng.run(ev[17:], quiet=True)
    both = np.concatenate([a.as_matrix(), b.as_matrix()])
    np.testing.assert_allclose(both, one.as_matrix(), rtol=1e-5, atol=1e-6)
