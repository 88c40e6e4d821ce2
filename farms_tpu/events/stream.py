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
                chunks: Iterable[EventBatch],
                prefetch: int = 1,
                meter=None) -> Iterator[FlowOutput]:
    """Run the engine over a stream of chunks, yielding flow per chunk.

    State (time surfaces, flow surfaces, t0) carries across chunks, so the
    concatenated outputs equal a single `process()` call over the whole
    stream when chunk boundaries are micro-batch aligned.

    `prefetch` is the backpressure depth: up to that many source chunks
    are pulled ahead of the one being processed (a producer thread keeps
    slow sources - disk, sockets - overlapped with device compute; 0
    disables the thread). `meter`, if given, is called after every chunk
    with (events_in_chunk, seconds_for_chunk, events_total,
    seconds_total) - the streaming analogue of the reference serial
    mode's running per-phase timing prints (vFlow.cpp:641, 719); pass
    `print_meter` for a ready-made stderr line.
    """
    import queue
    import threading
    import time

    if prefetch > 0:
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def _put(tag, payload) -> bool:
            # bounded put that gives up once the consumer is gone, so an
            # abandoned generator cannot pin the producer thread (and the
            # buffered chunks + open source) forever
            while not stop.is_set():
                try:
                    q.put((tag, payload), timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def produce():
            err = None
            try:
                for c in chunks:
                    if not _put("chunk", c):
                        return
            except BaseException as e:   # noqa: BLE001 - re-raised below
                err = e
            # a source error must reach the CONSUMER, not stderr: an
            # end-of-stream that hides an IOError would return a
            # truncated output that looks like a complete run
            _put("end", err)

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        def pull():
            try:
                while True:
                    tag, payload = q.get()
                    if tag == "end":
                        if payload is not None:
                            raise payload
                        return
                    yield payload
            finally:
                stop.set()

        source = pull()
    else:
        source = chunks

    n_total = 0
    t_total = 0.0
    for chunk in source:
        if len(chunk) == 0:
            continue
        t0 = time.perf_counter()
        out = engine.process(chunk)
        dt = time.perf_counter() - t0
        n_total += len(chunk)
        t_total += dt
        if meter is not None:
            meter(len(chunk), dt, n_total, t_total)
        yield out


def print_meter(n, dt, n_total, t_total):
    """Running events/sec line for stream_flow's `meter` hook."""
    import sys

    rate = n / dt if dt > 0 else float("inf")
    avg = n_total / t_total if t_total > 0 else float("inf")
    print(f"[stream] {n} events in {dt*1e6:.0f} us "
          f"({rate:,.0f} ev/s; running avg {avg:,.0f} ev/s over "
          f"{n_total} events)", file=sys.stderr)


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
