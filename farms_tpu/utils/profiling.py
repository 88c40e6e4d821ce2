"""Timing and throughput reporting.

The reference self-reports a benchmark line per run (main.cpp:201,
`[Benchmark Main] : Processing time : <us> usec <s> sec with rate of :
<r> events/sec`); this module reproduces that metric and adds helpers for
timing device work correctly: remote-execution tunnels (and async dispatch
generally) can return from `block_until_ready` before results exist, so
synchronization is forced by materializing a small device-side reduction.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def force_sync(tree) -> float:
    """Materialize a tiny reduction of every leaf; returns a checksum.

    Unlike `jax.block_until_ready`, this provably waits for the computation
    because the host receives derived data.
    """
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            total += float(jnp.sum(leaf.astype(jnp.float32)))
    return total


class Timer:
    """Wall-clock timer with device synchronization."""

    def __init__(self):
        self.elapsed = 0.0

    @contextlib.contextmanager
    def measure(self, result_tree=None):
        t0 = time.perf_counter()
        yield
        if result_tree is not None:
            force_sync(result_tree)
        self.elapsed += time.perf_counter() - t0


def benchmark_line(num_events: int, duration_sec: float) -> str:
    """The reference's closing throughput line (main.cpp:201 format)."""
    duration_us = int(duration_sec * 1e6)
    rate = (num_events - 1) / duration_sec if duration_sec > 0 else float("inf")
    return (
        f"[Benchmark Main] : Processing time   : {duration_us} usec "
        f"{duration_sec} sec  with rate of : {rate} events/sec"
    )
