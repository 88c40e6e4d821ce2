"""Multi-device execution strategies (SURVEY.md C14 — none in the reference).

Three composable sharding axes over `jax.sharding` meshes:

- `dp.ShardedFlowEngine` — event-data parallelism: surfaces replicated,
  micro-batches sharded over a 1-D ('ev',) mesh.
- `tiling.SpatialFlowEngine` — spatial tiling: surfaces sharded
  P('tx', None); GSPMD inserts the stencil halo exchanges.
- `halo.HaloFlowEngine` — explicit halo exchange: shard_map + ppermute
  ring bands, psum-combined per-event outputs.

Multi-host (DCN) setup lives in `multihost`.
"""
from farms_tpu.parallel.dp import ShardedFlowEngine
from farms_tpu.parallel.halo import HaloFlowEngine
from farms_tpu.parallel.tiling import SpatialFlowEngine

__all__ = ["ShardedFlowEngine", "SpatialFlowEngine", "HaloFlowEngine"]
