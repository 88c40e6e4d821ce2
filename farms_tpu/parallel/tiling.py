"""Spatially-tiled flow engine: sensor-plane sharding over a device mesh.

The second parallelism axis (SURVEY.md C14): the surface state and every
dense stencil map is sharded over the sensor plane - 1-D along x by
default, or over a 2-D ('tx', 'ty') mesh (SURVEY.md section 7 sketch 2).
Because the dense formulation (ops/dense_flow.py) expresses all
neighborhood access as *static shifted slices*, GSPMD partitions the
stencils automatically and inserts the halo exchanges (collective-permutes
of the border bands) over ICI - the idiomatic TPU equivalent of the
hand-written MPI halo codes the reference never had.

The aperture stage's integral images need a prefix sum along each sharded
axis (a log-depth associative scan over ICI) and windows reaching up to
2*max_window = 100 px across tile borders; both are handled by the XLA
partitioner from the same sharding annotations.

Sensor dims that do not divide the mesh are padded up to the next multiple
(`FlowConfig.padded_to`); pad cells are never written, all border rules use
the semantic sensor bounds, and outputs equal the unpadded single-device
engine's exactly (tests/test_tiling.py).

Event batches stay replicated here (they are tiny compared to the maps at
large sensor sizes, which is exactly when spatial tiling pays). For
event-axis sharding see parallel/dp.py; the two compose on a 2-D
('tx','ev') mesh (parallel/multihost.py).
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


def make_spatial_mesh_2d(tx: int, ty: int) -> Mesh:
    """A 2-D ('tx', 'ty') mesh tiling the sensor plane in both axes."""
    devs = np.array(jax.devices()[: tx * ty])
    if devs.size != tx * ty:
        raise ValueError(f"need {tx * ty} devices, have {devs.size}")
    return Mesh(devs.reshape(tx, ty), axis_names=("tx", "ty"))


def state_sharding(mesh: Mesh) -> SurfaceState:
    """Shard every [W, H] surface over the mesh's spatial axes."""
    ty = "ty" if "ty" in mesh.axis_names else None
    sh = NamedSharding(mesh, P("tx", ty))
    repl = NamedSharding(mesh, P())
    return SurfaceState(sh, sh, sh, sh, sh, repl)   # step counter replicated


class SpatialFlowEngine(FlowEngine):
    """FlowEngine with surfaces sharded over a ('tx',) or ('tx','ty') mesh.

    Pass `mesh_shape=(tx, ty)` for 2-D sensor-plane tiling; the default is
    1-D x-axis sharding over all (or `num_devices`) visible devices.
    """

    def __init__(self, cfg: FlowConfig, num_devices: int | None = None,
                 mesh: Mesh | None = None,
                 mesh_shape: tuple[int, int] | None = None):
        if not cfg.use_dense:
            raise ValueError(
                "spatial tiling requires the dense compute path "
                "(use_dense=True): its stencils shard; per-event gathers "
                "do not"
            )
        if mesh is None:
            mesh = (make_spatial_mesh_2d(*mesh_shape) if mesh_shape
                    else make_spatial_mesh(num_devices))
        n_tx = mesh.shape["tx"]
        n_ty = mesh.shape.get("ty", 1)
        # pad array dims up to the mesh extents; the Pallas support gates
        # (ops/pallas/kernels.py) already exclude padded configs, so auto
        # backend selection falls back to the XLA dense path here
        cfg = cfg.padded_to(n_tx, n_ty)
        super().__init__(cfg)
        self.mesh = mesh
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
