"""Event-data-parallel flow engine over a device mesh.

Strategy: surfaces are replicated; each micro-batch's events are sharded
over the 'ev' mesh axis. The gather-heavy stages (candidate scoring, plane
fits, aperture corner lookups) partition cleanly along events; GSPMD keeps
the replicated surfaces consistent across the scatter updates (it lowers
them to all-gathers of the per-device updates, which ride ICI).

This is the TPU-native counterpart of "parallelism" for the reference's
workload: the reference processes one event at a time on one core
(SURVEY.md C14); here every device advances the same surface timeline while
fitting a disjoint slice of the event stream. Spatial tiling with halo
exchange (for sensors too large to replicate) is tracked in
parallel/tiling.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, FlowOutput
from farms_tpu.parallel.mesh import event_sharding, make_event_mesh, replicated
from farms_tpu.pipeline.engine import FlowEngine, micro_step


class ShardedFlowEngine(FlowEngine):
    """FlowEngine whose micro-batches are sharded over a 1-D event mesh."""

    def __init__(self, cfg: FlowConfig, num_devices: int | None = None,
                 mesh=None):
        super().__init__(cfg)
        self.mesh = mesh if mesh is not None else make_event_mesh(num_devices)
        n_dev = self.mesh.devices.size
        if cfg.chunk_size % n_dev != 0:
            raise ValueError(
                f"chunk_size {cfg.chunk_size} not divisible by mesh size {n_dev}"
            )
        self._state_sharding = replicated(self.mesh)
        self._batch_sharding = event_sharding(self.mesh)
        self.state = jax.device_put(self.state, self._state_sharding)

        @functools.partial(
            jax.jit,
            static_argnames=("cfg",),
            donate_argnums=(0,),
            out_shardings=(self._state_sharding, None),
        )
        def _scan(state, chunk, cfg):
            def body(st, batch):
                return micro_step(st, batch, cfg)
            return jax.lax.scan(body, state, chunk)

        self._scan = _scan

    def _dispatch(self, chunk):
        chunk = jax.device_put(chunk, self._batch_sharding)
        return self._scan(self.state, chunk, self.cfg)
