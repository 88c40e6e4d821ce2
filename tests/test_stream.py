"""Streaming ingestion equals one-shot processing on aligned boundaries."""
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar, write_events_txt
from farms_tpu.events.stream import (
    iter_file_chunks,
    process_file_streaming,
    stream_flow,
)
from farms_tpu.pipeline.engine import FlowEngine


def test_stream_equals_oneshot(tmp_path):
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=25000, jitter_us=15)[:512]
    path = write_events_txt(ev, str(tmp_path / "s"))
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)

    one = FlowEngine(cfg).process(ev)
    streamed = process_file_streaming(FlowEngine(cfg), path,
                                      chunk_events=128)
    assert len(streamed) == len(one)
    np.testing.assert_allclose(one.r_true, streamed.r_true, rtol=1e-6)
    np.testing.assert_array_equal(one.scale, streamed.scale)
    np.testing.assert_array_equal(one.t, streamed.t)


def test_iter_file_chunks(tmp_path):
    ev = synthetic_translating_bar(width=48, height=48, bar_len=10,
                                   duration_us=10000)[:100]
    path = write_events_txt(ev, str(tmp_path / "c"))
    chunks = list(iter_file_chunks(path, 30))
    assert [len(c) for c in chunks] == [30, 30, 30, 10]
    np.testing.assert_array_equal(
        np.concatenate([c.x for c in chunks]), ev.x)


def test_stream_equals_oneshot_with_phases_and_f16_wire(tmp_path):
    """Streaming continuation through the full current operating-point
    stack: sub_phases causal groups, f16 wire, compact2 upload. A
    non-phase-aligned continuation boundary must not change outputs
    (the carried SurfaceState is the only cross-call state)."""
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=25000, jitter_us=15)[:512]
    path = write_events_txt(ev, str(tmp_path / "p"))
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     sub_phases=4, wire="f16")

    one = FlowEngine(cfg).process(ev)
    streamed = process_file_streaming(FlowEngine(cfg), path,
                                      chunk_events=192)
    assert len(streamed) == len(one)
    np.testing.assert_array_equal(one.scale, streamed.scale)
    np.testing.assert_allclose(one.r_true, streamed.r_true, rtol=1e-6)
    np.testing.assert_allclose(one.vx, streamed.vx, rtol=1e-6)


def test_stream_prefetch_and_meter(tmp_path):
    """Prefetching producer thread + running events/sec meter: outputs
    identical to the unprefetched stream; the meter sees every chunk and
    a monotone running total."""
    from farms_tpu.events.io import FlowOutput

    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=25000, jitter_us=15)[:512]
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)

    def chunks():
        for s in range(0, 512, 128):
            yield ev[s:s + 128]

    seen = []
    outs = list(stream_flow(FlowEngine(cfg), chunks(), prefetch=2,
                            meter=lambda n, dt, nt, tt: seen.append(
                                (n, nt))))
    got = FlowOutput.concatenate(outs)
    want = FlowEngine(cfg).process(ev)
    np.testing.assert_allclose(want.r_true, got.r_true, rtol=1e-6)
    np.testing.assert_array_equal(want.scale, got.scale)
    sizes = [min(128, len(ev) - s) for s in range(0, len(ev), 128)]
    assert [n for n, _ in seen] == sizes
    assert [nt for _, nt in seen] == list(np.cumsum(sizes))

    # prefetch=0: same results, no producer thread
    outs0 = list(stream_flow(FlowEngine(cfg), chunks(), prefetch=0))
    got0 = FlowOutput.concatenate(outs0)
    np.testing.assert_array_equal(got.scale, got0.scale)


def test_stream_prefetch_propagates_source_errors():
    """A source iterator that raises mid-stream must surface the error to
    the consumer, not truncate silently (code-review r4 finding)."""
    import pytest

    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=25000, jitter_us=15)[:256]

    def broken():
        yield ev[:128]
        raise IOError("disk went away")

    it = stream_flow(FlowEngine(cfg), broken(), prefetch=2)
    next(it)   # first chunk processes fine
    with pytest.raises(IOError, match="disk went away"):
        next(it)
