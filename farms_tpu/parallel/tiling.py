"""Spatially-tiled flow engine: sensor-plane sharding over a device mesh.

The second parallelism axis (SURVEY.md C14): the surface state and every
dense stencil map is sharded along the sensor's x dimension over a 1-D
('tx',) mesh. Because the dense formulation (ops/dense_flow.py) expresses
all neighborhood access as *static shifted slices*, GSPMD partitions the
stencils automatically and inserts the halo exchanges (collective-permutes
of the border bands) over ICI - the idiomatic TPU equivalent of the
hand-written MPI halo codes the reference never had.

The aperture stage's integral images need a prefix sum along the sharded
axis (a log-depth associative scan over ICI) and windows reaching up to
2*max_window = 100 px across tile borders; both are handled by the XLA
partitioner from the same sharding annotations.

Event batches stay replicated here (they are tiny compared to the maps at
large sensor sizes, which is exactly when spatial tiling pays). For
event-axis sharding see parallel/dp.py; the two compose on a 2-D
('tx','ev') mesh.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from farms_tpu.config import FlowConfig
from farms_tpu.pipeline.engine import FlowEngine, micro_step
from farms_tpu.state.surfaces import SurfaceState


def make_spatial_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=("tx",))


def state_sharding(mesh: Mesh) -> SurfaceState:
    """Shard every [W, H] surface along the sensor x axis."""
    sh = NamedSharding(mesh, P("tx", None))
    repl = NamedSharding(mesh, P())
    return SurfaceState(sh, sh, sh, sh, sh, repl)   # step counter replicated


class SpatialFlowEngine(FlowEngine):
    """FlowEngine with surfaces sharded over a spatial ('tx',) mesh."""

    def __init__(self, cfg: FlowConfig, num_devices: int | None = None,
                 mesh: Mesh | None = None):
        if not cfg.use_dense:
            raise ValueError(
                "spatial tiling requires the dense compute path "
                "(use_dense=True): its stencils shard; per-event gathers "
                "do not"
            )
        super().__init__(cfg)
        self.mesh = mesh if mesh is not None else make_spatial_mesh(num_devices)
        n_dev = self.mesh.devices.size
        if cfg.width % n_dev != 0:
            raise ValueError(
                f"sensor width {cfg.width} not divisible by mesh size {n_dev}"
            )
        self._state_shardings = state_sharding(self.mesh)
        self._repl = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, self._state_shardings)

        @functools.partial(
            jax.jit,
            static_argnames=("cfg",),
            donate_argnums=(0,),
            out_shardings=(self._state_shardings, None),
        )
        def _scan(state, chunk, cfg):
            def body(st, batch):
                return micro_step(st, batch, cfg)
            return jax.lax.scan(body, state, chunk)

        self._scan = _scan

    def reset(self):
        super().reset()
        self.state = jax.device_put(self.state, self._state_shardings)

    def _dispatch(self, chunk):
        chunk = jax.device_put(chunk, self._repl)
        return self._scan(self.state, chunk, self.cfg)
