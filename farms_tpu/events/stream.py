"""Streaming ingestion: chunked iteration over unbounded event sources.

The reference's streaming mode (`run()`, vFlow.cpp:465-826) reads one text
line per event; this module provides the TPU-side analogue: an iterator of
`EventBatch` chunks (from a file, an array, or any generator of SoA blocks)
that the engine consumes with its state carried across chunks. Host-side
packing and winner resolution (engine.pack) overlap device compute because
dispatches are asynchronous.
"""
from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

from farms_tpu.events.io import EventBatch, FlowOutput, load_events_txt
from farms_tpu.pipeline.engine import FlowEngine


def iter_file_chunks(path: str, chunk_events: int,
                     max_events: int | None = None) -> Iterator[EventBatch]:
    """Yield successive chunks of an event file.

    The native parser loads the file once (mmap) and slices; this keeps the
    host memory footprint at SoA-array scale rather than text scale.
    """
    ev = load_events_txt(path, max_events)
    for start in range(0, len(ev), chunk_events):
        yield ev[start:start + chunk_events]


def stream_flow(engine: FlowEngine,
                chunks: Iterable[EventBatch]) -> Iterator[FlowOutput]:
    """Run the engine over a stream of chunks, yielding flow per chunk.

    State (time surfaces, flow surfaces, t0) carries across chunks, so the
    concatenated outputs equal a single `process()` call over the whole
    stream when chunk boundaries are micro-batch aligned.
    """
    for chunk in chunks:
        if len(chunk) == 0:
            continue
        yield engine.process(chunk)


def process_file_streaming(engine: FlowEngine, path: str,
                           chunk_events: int = 1 << 20,
                           max_events: int | None = None) -> FlowOutput:
    """Convenience: stream a file through the engine, return merged output."""
    outs = list(stream_flow(engine, iter_file_chunks(path, chunk_events,
                                                     max_events)))
    if not outs:
        return engine.process(EventBatch(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.uint32), np.zeros(0, np.int32)))
    return FlowOutput.concatenate(outs)
