"""Multi-host execution over DCN (jax.distributed).

The reference is a single process on one core (SURVEY.md C14). Multi-host
scaling here follows the standard JAX recipe: every host runs the same
program, `jax.distributed.initialize` wires the hosts into one system, and
the global mesh spans all devices - intra-slice traffic (halo exchanges,
event all-gathers, psum of pooled partials) rides ICI while host-level
coordination rides DCN.

Event-ordering model: **replicated chronological feed**. The surface
timeline is global, strictly ordered state - event i's flow depends on the
surfaces written by all events j < i (vFlow.cpp:223-414) - so the stream
CANNOT be chronologically segmented across hosts (two hosts feeding
different time segments into one shared timeline is not event-serial; an
earlier draft of this module sketched that model and it was wrong). Instead
every process reads the same chronological chunk stream, and each process
materializes only the lanes its local devices own: micro-batch lanes shard
over the mesh's 'ev' axis and surfaces shard over 'tx', both via
`jax.make_array_from_callback`, so per-process HBM holds 1/(tx*ev) of the
surface state and 1/ev of each micro-batch. Host-side file reading is
cheap relative to compute (native mmap parser, utils/nativeio.py) and can
also be staged by rank 0 + broadcast if the filesystem is not shared.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from farms_tpu.config import FlowConfig
from farms_tpu.pipeline.engine import FlowEngine, micro_step
from farms_tpu.state.surfaces import SurfaceState


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
    tiles, so halo exchange rides ICI), ev = number of hosts.
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


class MultiHostFlowEngine(FlowEngine):
    """FlowEngine over a global multi-process ('tx','ev') mesh.

    Every participating process constructs the engine with the same config
    and calls `process()` with the SAME chronological event stream
    (replicated feed, see module docstring). Surfaces live sharded
    P('tx', None) across all hosts' devices; each packed micro-batch is
    assembled as a global array with lanes sharded P('ev') - each process
    uploads only its local devices' lane slices. Outputs are produced
    fully replicated (one cross-host all-gather per scan call) so every
    process returns the complete FlowOutput.

    Degenerates cleanly to a single-process engine when
    jax.process_count() == 1, which is how the dryrun and the single-host
    tests exercise it.
    """

    def __init__(self, cfg: FlowConfig, mesh: Mesh | None = None):
        if not cfg.use_dense:
            raise ValueError(
                "multi-host sharding requires the dense compute path "
                "(use_dense=True): its stencils shard over 'tx'")
        self.mesh = mesh if mesh is not None else make_global_mesh()
        tx = self.mesh.shape["tx"]
        ev = self.mesh.shape["ev"]
        if cfg.chunk_size % ev != 0:
            raise ValueError(
                f"chunk_size {cfg.chunk_size} not divisible by ev={ev}")
        # non-divisible widths pad up (pad rows are never written)
        cfg = cfg.padded_to(tx)
        super().__init__(cfg)

        surf = NamedSharding(self.mesh, P("tx", None))
        repl = NamedSharding(self.mesh, P())
        self._state_shardings = SurfaceState(surf, surf, surf, surf, surf,
                                             repl)
        self._batch_sharding = NamedSharding(self.mesh, P(None, None, "ev"))
        self._repl = repl
        self.state = self._put_state(self.state)
        # outputs stay lane-sharded over 'ev': per-call cross-device
        # output traffic is 1/ev per process instead of a full replicating
        # all-gather of every [steps, C, m] block over DCN (VERDICT.md r2
        # weak 3); host-side assembly happens once per process() via
        # _fetch, and only when the caller wants the full output
        out_sh = (NamedSharding(self.mesh, P(None, None, "ev")),
                  NamedSharding(self.mesh, P(None, "ev")))
        # multi-process collectives must be issued in the same order on
        # every process: _fetch's process_allgather is itself a
        # collective, and even one FIFO fetch worker orders fetches only
        # against each other, not against the main thread's scan
        # dispatches - two processes can interleave them differently and
        # deadlock (ADVICE.md r3). 0 selects the base engine's inline
        # mode: dispatch every scan first, then fetch in order on the
        # main thread, one deterministic global collective order.
        self._FETCH_THREADS = (0 if jax.process_count() > 1
                               else FlowEngine._FETCH_THREADS)
        self._aux_queue = []

        @functools.partial(
            jax.jit,
            static_argnames=("cfg",),
            donate_argnums=(0,),
            out_shardings=(self._state_shardings, out_sh),
        )
        def _scan(state, chunk, cfg):
            def body(st, batch):
                return micro_step(st, batch, cfg)
            return jax.lax.scan(body, state, chunk)

        self._scan = _scan

    def _fetch(self, o):
        """Device->host fetch of one output array.

        Single-process: plain fetch of the (fully addressable) sharded
        array. Multi-process: assemble the full array across hosts - the
        only point where output bytes cross DCN, and only when the caller
        asked for the complete FlowOutput.
        """
        if jax.process_count() == 1:
            return np.asarray(o)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(o, tiled=True))

    # ---- global-array plumbing ------------------------------------------
    def _put_state(self, state: SurfaceState) -> SurfaceState:
        """Host pytree -> globally-sharded device pytree.

        Every process holds the full host arrays (they are identical by
        construction), so each shard is sliced locally - no DCN traffic.
        """
        def put(arr, sharding):
            arr = np.asarray(arr)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx])
        return jax.tree.map(put, state, self._state_shardings)

    def place_state(self, state: SurfaceState) -> SurfaceState:
        # multi-process placement cannot device_put host arrays directly;
        # route through the per-process shard construction. Re-seed the
        # pack_wesc host stamp mirror from the incoming host state (the
        # globally-sharded device state is not host-addressable).
        self._last_stamp = np.ascontiguousarray(
            np.asarray(state.t_surf)[:self.cfg.width, :self.cfg.height]
        ).reshape(-1).astype(np.int32).copy()
        return self._put_state(state)

    def reset(self):
        from farms_tpu.state.surfaces import init_state
        self.state = self._put_state(init_state(self.cfg))
        self._t0 = None
        self._last_stamp = np.zeros(
            self.cfg.width * self.cfg.height, np.int32)
        self._aux_queue = []

    def pack(self, ev, steps_per_call=None, compact=False):
        """Base pack + per-call aux dicts (derived-written escapes and
        the rank-2 correction data), queued for _dispatch.

        The aux arrays become leaves of the global dict batch: escapes
        replicated, corrected-lane flags sharded over 'ev' with the
        lanes, the center surface sharded over 'tx' with the state.
        """
        packed, n = super().pack(ev, steps_per_call=steps_per_call,
                                 compact=compact)
        cfg = self.cfg
        self._aux_queue = []
        wesc, ok = self.pack_wesc(ev, steps_per_call=steps_per_call)
        r2 = None
        if cfg.center_correction:
            r2 = self.pack_r2(ev, steps_per_call=steps_per_call)
        for c in range(packed.shape[0]):
            d = {}
            if ok[c]:
                d["wesc"] = wesc[c]
            if r2 is not None:
                d["r2f"] = r2[0][c]
                ctr = np.pad(
                    r2[1][c],
                    ((0, 0), (0, cfg.array_width - cfg.width),
                     (0, cfg.array_height - cfg.height)))
                d["r2c"] = ctr
            self._aux_queue.append(d)
        return packed, n

    def _global(self, arr, spec):
        arr = np.asarray(arr)
        sh = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    def _dispatch(self, chunk):
        batch = {"ev": self._global(chunk, P(None, None, "ev"))}
        aux = self._aux_queue.pop(0) if self._aux_queue else {}
        if "wesc" in aux:
            batch["wesc"] = self._global(aux["wesc"], P())
        if "r2f" in aux:
            batch["r2f"] = self._global(aux["r2f"], P(None, "ev"))
            batch["r2c"] = self._global(aux["r2c"], P(None, "tx", None))
        return self._scan(self.state, batch, self.cfg)

    # ---- rank-distributed output writing --------------------------------
    def write_flow_distributed(self, ev, base_path: str) -> str:
        """Batch-mode file contract without the output allgather.

        `process()` + `write_flow_txt` ships every output byte over DCN
        (process_allgather in _fetch) before rank 0 writes the file.
        Here each process instead fetches only the lane shards its OWN
        devices hold (outputs are sharded P('ev'); copies along 'tx'
        dedupe by shard index), decodes them to the 7 wire columns, and
        stages them to `<base_path>.part<k>.npz` on the shared
        filesystem; after a barrier, process 0 assembles the parts in
        lane order and writes the reference 11-column txt
        (vFlow.cpp:433-442). Output data never crosses DCN - only the
        barrier does. Returns the txt path (all processes).

        With 'ev' spanning processes the parts are disjoint; with 'ev'
        process-local every process stages the same lanes and assembly
        is idempotent.
        """
        import os

        from jax.experimental import multihost_utils

        from farms_tpu.events.io import write_flow_txt
        from farms_tpu.pipeline.engine import (FlowOutput,
                                               decode_wire_columns,
                                               wire_n_main_rows)

        n = len(ev)
        steps_per_call = max(1, min(
            self.cfg.steps_per_scan,
            -(-self._PIPELINE_EVENTS // self.cfg.chunk_size)))
        packed, n = self.pack(ev, steps_per_call=steps_per_call,
                              compact=self._compact_ok)
        spc, m = packed.shape[1], packed.shape[3]
        outs = []
        for c in range(packed.shape[0]):
            self.state, out = self._dispatch(jnp.asarray(packed[c]))
            outs.append(out)

        rows_l, cols_l = [], []
        C = wire_n_main_rows(self.cfg)
        for c, (mo, ao) in enumerate(outs):
            mains = {}
            for sh in mo.addressable_shards:
                lo = sh.index[2].start or 0
                mains.setdefault(lo, np.asarray(sh.data))
            auxs = {}
            for sh in ao.addressable_shards:
                lo = sh.index[1].start or 0
                auxs.setdefault(lo, np.asarray(sh.data))
            for lo, mb in sorted(mains.items()):
                ab = auxs[lo]
                bm = mb.shape[2]
                main2 = mb.transpose(1, 0, 2).reshape(C, -1)
                aux1 = ab.reshape(-1)
                g = ((c * spc + np.arange(spc))[:, None] * m
                     + lo + np.arange(bm)[None, :]).reshape(-1)
                keep = g < n
                if not keep.any():
                    continue
                rows_l.append(g[keep])
                cols_l.append({k: v[keep] for k, v in
                               decode_wire_columns(main2, aux1,
                                                   self.cfg).items()})

        part = f"{base_path}.part{jax.process_index()}.npz"
        payload = {"rows": (np.concatenate(rows_l) if rows_l
                            else np.zeros(0, np.int64))}
        for key in ("r_true", "theta_true", "vx", "vy", "r_local",
                    "theta_local", "scale"):
            payload[key] = (np.concatenate([c[key] for c in cols_l])
                            if cols_l else np.zeros(0))
        np.savez(part, **payload)
        multihost_utils.sync_global_devices("farms-dist-write-parts")

        from farms_tpu.events.io import OUTPUT_SUFFIX
        path = base_path + OUTPUT_SUFFIX
        if jax.process_index() == 0:
            full = {k: np.zeros(n, payload[k].dtype)
                    for k in payload if k != "rows"}
            covered = np.zeros(n, bool)
            for p in range(jax.process_count()):
                pf = f"{base_path}.part{p}.npz"
                with np.load(pf) as d:
                    r = d["rows"]
                    for k in full:
                        full[k][r] = d[k]
                    covered[r] = True
            assert covered.all(), "distributed parts left lanes uncovered"
            t = (ev.t.astype(np.uint32)
                 - (self._t0 or np.uint32(0))).astype(np.uint32)
            out = FlowOutput(x=ev.x.astype(np.int32),
                             y=ev.y.astype(np.int32), t=t,
                             pol=ev.pol.astype(np.int32), **full)
            path = write_flow_txt(out, base_path)
            for p in range(jax.process_count()):
                try:
                    os.remove(f"{base_path}.part{p}.npz")
                except OSError:
                    pass
        multihost_utils.sync_global_devices("farms-dist-write-done")
        return path
