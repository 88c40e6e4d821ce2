"""Multi-host execution over DCN (jax.distributed).

The reference is a single process on one core (SURVEY.md C14). Multi-host
scaling here follows the standard JAX recipe: every host runs the same
program, `jax.distributed.initialize` wires the hosts into one system, and
the global mesh spans all devices - intra-slice traffic (halo exchanges,
event all-gathers, psum of pooled partials) rides ICI while host-level
stream distribution rides DCN.

Stream distribution model: the event stream is chronologically partitioned
across hosts in coarse segments; each host feeds its segment into the
globally-sharded engine via `jax.make_array_from_process_local_data`, and
the carried `SurfaceState` (replicated or spatially sharded over the global
mesh) keeps the surface timeline consistent.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX. No-op if already initialized or single."""
    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def make_global_mesh(tx: int | None = None, ev: int | None = None) -> Mesh:
    """A 2-D ('tx', 'ev') mesh over all global devices.

    'tx' shards the sensor plane (surfaces, dense stencil maps); 'ev'
    shards event micro-batches. Defaults: tx = devices per host (ICI-local
    tiles), ev = number of hosts.
    """
    devs = np.array(jax.devices())
    n = devs.size
    if tx is None:
        tx = max(1, jax.local_device_count())
        while n % tx:
            tx //= 2
    if ev is None:
        ev = n // tx
    if tx * ev != n:
        raise ValueError(f"mesh {tx}x{ev} != {n} devices")
    return Mesh(devs.reshape(tx, ev), axis_names=("tx", "ev"))


def shard_stream_segments(n_events: int) -> tuple[int, int]:
    """This host's [start, end) slice of a chronologically-split stream."""
    pc, pid = jax.process_count(), jax.process_index()
    per = -(-n_events // pc)
    return pid * per, min(n_events, (pid + 1) * per)
