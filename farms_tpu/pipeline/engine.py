"""Chunked streaming flow engine.

TPU-native replacement for the reference's per-event hot loop
(runFileCopy, vFlow.cpp:223-414). Events are processed in fixed-size
micro-batches; each micro-step is a pure function over the SurfaceState
pytree, micro-steps are fused with `lax.scan`, and the host driver streams
chunks to the device carrying the state across calls (which doubles as the
checkpoint/resume mechanism: the surface pytree *is* the whole state).

Host<->device traffic is packed: one int32 [steps, rows, m] upload per
call — rows=5 (x, y, t, lane_valid, winner) or the compact rows=2 layout
(flat index | winner<<30, t; 8 bytes/event) — and one f32 [steps, 7, m]
download (the computed output columns), so throughput is bounded by
bandwidth rather than per-array dispatch latency. The device-resident path (`process` with the
default settings uploads everything first, runs every micro-step, then
downloads once) mirrors the reference's measurement methodology: its timed
loop also starts from events already in RAM vectors and appends outputs to
RAM vectors (vFlow.cpp:214-423), with file I/O outside the timer.

Sequential-semantics note: the reference is strictly event-serial - event i
sees surfaces updated by all events j < i. A micro-batch instead scatters
all its events first, then computes all its flows against a causal view of
that surface (ops/local_flow.py), so residual error comes only from
aperture-stage co-batch visibility and is bounded by the micro-batch's time
span; chunk_size=1 reproduces the reference bit-for-bit and is what the
golden tests compare against the float64 oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, FlowOutput
from farms_tpu.ops.aperture import aperture_batch, build_integral
from farms_tpu.ops.dense_flow import (
    dense_aperture,
    dense_local_flow,
    onehot_gather,
)
from farms_tpu.ops.local_flow import local_flow_batch
from farms_tpu.ops.pallas import kernels as pallas_kernels
from farms_tpu.state.surfaces import SurfaceState, init_state, kill_stale_flow
from farms_tpu.utils import nativeio

N_OUT_COLS = 7  # r_true, theta_true, vx, vy, r_local, theta_local, scale


def micro_step(state: SurfaceState, batch, cfg: FlowConfig):
    """Process one micro-batch of events against the carried surfaces.

    `batch` is either an int32 [m, 4] packed array with columns
    (x, y, t, lane_valid) or an (x, y, t, lane_valid) tuple. Returns the
    updated state and an f32 [m, 7] packed output block.
    """
    is_winner = None
    if isinstance(batch, (tuple, list)):
        x, y, t, lane_valid = batch
        lane_valid = lane_valid.astype(jnp.bool_)
    elif batch.shape[0] == 2:
        # compact packed int32 [2, m]: row 0 = flat pixel index x*H+y with
        # the host-resolved winner flag in bit 30 (W*H < 2^30 for every
        # supported sensor; invalid/padded lanes carry the out-of-range
        # sentinel W*H and are never winners), row 1 = normalized stamp.
        # 8 bytes/event upload instead of 20 - H2D bandwidth is the e2e
        # bottleneck (bench.py). The divide-by-constant decode is a couple
        # of VPU multiply-shifts, invisible next to the scatters.
        word, t = batch[0], batch[1]
        is_winner = ((word >> 30) & 1).astype(jnp.bool_)
        xy = word & jnp.int32(0x3FFFFFFF)
        x = xy // jnp.int32(cfg.height)
        y = xy - x * jnp.int32(cfg.height)
        lane_valid = None  # only the device-winner path below needs it
    else:
        # packed int32 [5, m]: the component axis is major so each row is a
        # well-tiled [m] vector (a minor axis of 5 would be padded to 128
        # lanes on TPU - a 25x memory blowup). Channel 4 marks batch
        # winners (the last event at each pixel), resolved on the host
        # during packing so every device scatter has unique indices.
        x, y, t = batch[0], batch[1], batch[2]
        lane_valid = batch[3].astype(jnp.bool_)
        if batch.shape[0] > 4:
            is_winner = batch[4].astype(jnp.bool_)
    # scatter sentinels and gather extents follow the (possibly padded)
    # device arrays; semantic border rules live in the dense ops
    W, H = cfg.array_width, cfg.array_height
    m = x.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    t1 = t + 1     # stamp1 encoding (see state/surfaces.py)

    # ---- permanent staleness kill (exact; see state/surfaces.py) ----
    state = kill_stale_flow(state, t[0], cfg)

    # ---- scatter events into the time surface ----
    # Only batch winners write (non-winners would be overwritten anyway:
    # last-write-wins, vFlow.cpp:264-273); invalid lanes are redirected out
    # of bounds and dropped. With host-resolved winners all indices are
    # unique, which lets XLA skip scatter conflict handling. Two scatters
    # per chunk: stamp1 (which doubles as the touched mask) and the write
    # epoch (from which `written` is derived); scatters are the dominant
    # per-event cost (~7.5 ns each measured), so fewer is faster.
    if is_winner is not None:
        wsx = jnp.where(is_winner, x, W)
        t_surf = state.t_surf.at[wsx, y].set(t1, mode="drop",
                                             unique_indices=True)
        epoch = state.epoch.at[wsx, y].set(state.step, mode="drop",
                                           unique_indices=True)
        written = epoch == state.step
    else:
        # device-side winner resolution (tuple-batch callers): the winner
        # at each pixel is the *latest lane* (lanes are chronological), so
        # resolve by lane index, never by a stamp max - stamp1 is
        # uint32-in-int32 and a signed max picks wrong once stamps >= 2^31
        sx = jnp.where(lane_valid, x, W)
        slot = jnp.full((W, H), -1, dtype=jnp.int32)
        slot = slot.at[sx, y].max(idx, mode="drop")
        written = slot >= 0
        is_winner = (slot[x, y] == idx) & lane_valid
        wsx = jnp.where(is_winner, x, W)
        t_surf = state.t_surf.at[wsx, y].set(t1, mode="drop",
                                             unique_indices=True)
        epoch = jnp.where(written, state.step, state.epoch)

    if cfg.use_dense:
        # ---- dense per-pixel path (ops/dense_flow.py), with the two hot
        # stages optionally fused into Pallas kernels ----
        if cfg.use_pallas is None:
            # auto: real TPU only - on CPU the kernels would run in the
            # (slow) interpreter, so tests opt in explicitly instead
            on_tpu = jax.default_backend() == "tpu"
            pk_local = on_tpu and pallas_kernels.local_flow_supported(cfg)
            pk_apert = on_tpu and pallas_kernels.aperture_supported(cfg)
        else:
            pk_local = pk_apert = cfg.use_pallas
        if pk_local:
            vx_map, vy_map, gate_map, len_map, theta_map = (
                pallas_kernels.local_flow_pallas(state.t_surf, t_surf, cfg))
        else:
            vx_map, vy_map, gate_map, len_map, theta_map = dense_local_flow(
                state.t_surf, t_surf, cfg)

        # flow-surface writes for every pixel written this batch
        # (vFlow.cpp:349-356 valid / 398-402 invalid)
        flow_len = jnp.where(
            written, jnp.where(gate_map, len_map, 0.0), state.flow_len)
        flow_vx = jnp.where(
            written, jnp.where(gate_map, vx_map, 0.0), state.flow_vx)
        flow_vy = jnp.where(
            written, jnp.where(gate_map, vy_map, 0.0), state.flow_vy)

        if pk_apert:
            tvx_map, tvy_map, scale_map = pallas_kernels.aperture_pallas(
                flow_len, flow_vx, flow_vy, cfg)
        else:
            tvx_map, tvy_map, scale_map = dense_aperture(
                flow_len, flow_vx, flow_vy, cfg)

        r_true_map = jnp.sqrt(tvx_map * tvx_map + tvy_map * tvy_map)
        theta_true_map = jnp.arctan2(tvy_map, tvx_map)
        out_maps = jnp.stack(
            [
                jnp.where(gate_map, r_true_map, 0.0),
                jnp.where(gate_map, theta_true_map, 0.0),
                vx_map,
                vy_map,
                jnp.where(gate_map, len_map, 0.0),
                jnp.where(gate_map, theta_map, 0.0),
                jnp.where(gate_map, scale_map, 0).astype(jnp.float32),
            ],
            axis=0,
        )
        # non-finite values only arise with min_evts_on_plane <= 0
        # (dtdp == 0 planes); scrub them so outputs stay finite
        out_maps = jnp.nan_to_num(out_maps, nan=0.0, posinf=0.0, neginf=0.0)
        out = onehot_gather(out_maps, x, y, W, H)            # [7, m]
        new_state = SurfaceState(t_surf, epoch, flow_len, flow_vx, flow_vy,
                                 state.step + 1)
        return new_state, out

    # ---- per-event reference path ----
    raw_vx, raw_vy, gate_valid, length, theta = local_flow_batch(
        state.t_surf, t_surf, x, y, t1, cfg
    )

    # ---- flow-surface writes (vFlow.cpp:349-356 valid / 398-402 invalid) ----
    wx = jnp.where(is_winner, x, W)
    flow_len = state.flow_len.at[wx, y].set(
        jnp.where(gate_valid, length, 0.0), mode="drop")
    flow_vx = state.flow_vx.at[wx, y].set(
        jnp.where(gate_valid, raw_vx, 0.0), mode="drop")
    flow_vy = state.flow_vy.at[wx, y].set(
        jnp.where(gate_valid, raw_vy, 0.0), mode="drop")

    # ---- multi-scale aperture correction ----
    integral = build_integral(flow_len, flow_vx, flow_vy)
    true_vx, true_vy, scale = aperture_batch(
        integral, flow_vx, flow_vy, x, y, cfg
    )

    # ---- output columns (vFlow.cpp:370-396) ----
    r_true = jnp.sqrt(true_vx * true_vx + true_vy * true_vy)
    theta_true = jnp.arctan2(true_vy, true_vx)
    # packed [7, m]: component axis major (see input packing note)
    out = jnp.stack(
        [
            jnp.where(gate_valid, r_true, 0.0),
            jnp.where(gate_valid, theta_true, 0.0),
            raw_vx,
            raw_vy,
            jnp.where(gate_valid, length, 0.0),
            jnp.where(gate_valid, theta, 0.0),
            jnp.where(gate_valid, scale, 0).astype(jnp.float32),
        ],
        axis=0,
    )
    new_state = SurfaceState(t_surf, epoch, flow_len, flow_vx, flow_vy,
                             state.step + 1)
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def scan_chunk(state: SurfaceState, chunk, cfg: FlowConfig):
    """Run several micro-steps under one jit via lax.scan.

    `chunk` is int32 [n_steps, rows, m] with rows=5 (x, y, t, lane_valid,
    winner) or the compact rows=2 layout (see micro_step); output is
    f32 [n_steps, 7, m].
    """
    def body(st, batch):
        return micro_step(st, batch, cfg)

    return jax.lax.scan(body, state, chunk)


class FlowEngine:
    """Host-side streaming driver carrying device state across chunks."""

    # subclasses whose step fn can't decode the 2-row compact pack opt out
    _compact_ok = True

    def __init__(self, cfg: FlowConfig):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._t0 = None

    def reset(self):
        self.state = init_state(self.cfg)
        self._t0 = None

    def place_state(self, state: SurfaceState) -> SurfaceState:
        """Apply this engine's device/sharding placement to a state pytree.

        Sharded subclasses expose their placement via `_state_shardings`
        (a SurfaceState of NamedShardings) or `_state_sharding` (one
        sharding for every leaf); checkpoint restore uses this so a saved
        state re-enters the engine's mesh layout (VERDICT.md item 9).
        """
        sh = (getattr(self, "_state_shardings", None)
              or getattr(self, "_state_sharding", None))
        return jax.device_put(state, sh) if sh is not None else state

    def _dispatch(self, chunk):
        """Run one scan call; subclasses override to add shardings."""
        return scan_chunk(self.state, chunk, self.cfg)

    # ---- host-side packing -------------------------------------------------
    def pack(self, ev: EventBatch, steps_per_call: int | None = None,
             compact: bool = False):
        """Normalize, pad, and pack an event stream for the device.

        Returns (packed int32 [n_calls, steps, rows, m] host array, n)
        where n is the real event count; rows is 5 (x, y, t, lane_valid,
        winner) or, with `compact=True`, 2 (x*H+y | winner<<30, t) —
        8 bytes/event on the H2D wire instead of 20 (micro_step decodes).
        The first call latches t0 = first stamp (vFlow.cpp:194, 241);
        later calls continue the same timeline.
        """
        cfg = self.cfg
        if compact and cfg.width * cfg.height >= 1 << 30:
            # the compact layout keeps the winner flag in bit 30 of the
            # flat pixel index; a sensor with W*H >= 2^30 would alias it,
            # so fall back to the explicit 5-row layout (ADVICE.md r2)
            compact = False
        n = len(ev)
        if self._t0 is None and n:
            self._t0 = np.uint32(ev.t[0])

        m = cfg.chunk_size
        spc = steps_per_call or cfg.steps_per_scan
        per_call = m * spc
        n_calls = max(1, -(-n // per_call))
        total = n_calls * per_call
        pad_total = total - n

        if compact:
            # native single-pass pack (clip + normalize + winner bits);
            # None (library absent) falls through to the NumPy path
            nat = nativeio.pack_compact(
                ev.x, ev.y, ev.t, int(self._t0 or 0), cfg.width, cfg.height,
                m, n_calls * spc)
            if nat is not None:
                return nat.reshape(n_calls, spc, 2, m), n

        x = np.clip(ev.x.astype(np.int32), 0, cfg.width - 1)
        y = np.clip(ev.y.astype(np.int32), 0, cfg.height - 1)
        t = (ev.t.astype(np.uint32) - (self._t0 or np.uint32(0))).view(np.int32)

        def padded(arr, fill):
            if not pad_total:
                return arr
            out = np.empty(total, dtype=np.int32)
            out[:n] = arr
            out[n:] = fill
            return out

        xp = padded(x, 0)
        yp = padded(y, 0)
        tp = padded(t, t[-1] if n else 0)

        # host-side winner resolution per micro-batch: the last event at
        # each pixel wins (vFlow.cpp:264-273). NumPy fancy-index assignment
        # keeps the last write, giving an O(m) resolution; device scatters
        # then have unique indices. Padded (invalid) lanes sit at x=y=0;
        # route them to a sentinel bucket so they cannot steal pixel (0,0)
        # from a real event.
        flat = xp * np.int64(cfg.height) + yp
        flat[n:] = cfg.width * cfg.height
        flat = flat.reshape(-1, m)
        lanes = np.arange(m)
        seen = np.empty(cfg.width * cfg.height + 1, dtype=np.int64)
        winner = np.empty((flat.shape[0], m), dtype=np.int32)
        for b in range(flat.shape[0]):
            seen[flat[b]] = lanes
            winner[b] = seen[flat[b]] == lanes
        winner = winner.reshape(-1)
        winner[n:] = 0

        if compact:
            # row 0: flat pixel index (sentinel W*H on padded lanes, which
            # also marks them invalid) with the winner flag in bit 30
            word = flat.reshape(-1).astype(np.int32)
            word |= winner << 30
            packed = np.empty((n_calls, spc, 2, m), dtype=np.int32)
            packed[:, :, 0, :] = word.reshape(n_calls, spc, m)
            packed[:, :, 1, :] = tp.reshape(n_calls, spc, m)
            return packed, n

        lane_valid = np.empty(total, dtype=np.int32)
        lane_valid[:n] = 1
        lane_valid[n:] = 0

        # write straight into the final [n_calls, spc, 5, m] layout
        # (strided component writes; no transpose copy afterwards)
        packed = np.empty((n_calls, spc, 5, m), dtype=np.int32)
        packed[:, :, 0, :] = xp.reshape(n_calls, spc, m)
        packed[:, :, 1, :] = yp.reshape(n_calls, spc, m)
        packed[:, :, 2, :] = tp.reshape(n_calls, spc, m)
        packed[:, :, 3, :] = lane_valid.reshape(n_calls, spc, m)
        packed[:, :, 4, :] = winner.reshape(n_calls, spc, m)
        return packed, n

    def _unpack_outputs(self, out_blocks, ev: EventBatch, n: int) -> FlowOutput:
        # blocks are [steps, 7, m] -> rows of (event, column); one
        # transpose copy, then zero-copy f32 column views (the previous
        # whole-matrix f64 cast was ~40% of host unpack time on the e2e
        # lane; FlowOutput consumers upcast on demand, e.g. as_matrix)
        cols = np.concatenate(
            [
                np.asarray(o).transpose(0, 2, 1).reshape(-1, N_OUT_COLS)
                for o in out_blocks
            ]
        )[:n]
        t = (ev.t.astype(np.uint32) - self._t0).astype(np.uint32)
        return FlowOutput(
            x=ev.x.astype(np.int32),
            y=ev.y.astype(np.int32),
            t=t,
            pol=ev.pol.astype(np.int32),
            r_true=cols[:, 0],
            theta_true=cols[:, 1],
            vx=cols[:, 2],
            vy=cols[:, 3],
            r_local=cols[:, 4],
            theta_local=cols[:, 5],
            scale=cols[:, 6].astype(np.int32),
        )

    # ---- drivers -----------------------------------------------------------
    def process(self, ev: EventBatch) -> FlowOutput:
        """Process an event stream (or a continuation of one).

        All calls are dispatched asynchronously; outputs stay on device
        until every chunk is in flight, so transfers overlap compute.
        """
        n = len(ev)
        if n == 0:
            return _empty_output()
        packed, n = self.pack(ev, compact=self._compact_ok)
        outs = []
        for c in range(packed.shape[0]):
            self.state, out = self._dispatch(jnp.asarray(packed[c]))
            outs.append(out)
        return self._unpack_outputs(outs, ev, n)

    def process_resident(self, ev: EventBatch):
        """Upload the whole stream once and run it as one device program.

        Returns (fn, device_chunk): `fn()` executes every micro-step in a
        single dispatch and returns the device-resident outputs. Used by the
        benchmark to time pure processing, matching the reference's timed
        region (vFlow.cpp:214-423), which also excludes file I/O.
        """
        packed, n = self.pack(ev, steps_per_call=max(
            1, -(-len(ev) // self.cfg.chunk_size)))
        chunk = jax.device_put(jnp.asarray(packed[0]))

        def fn():
            new_state, out = self._dispatch(chunk)
            self.state = new_state
            return out

        return fn, n


def _empty_output() -> FlowOutput:
    z = np.zeros(0)
    zi = np.zeros(0, dtype=np.int32)
    return FlowOutput(zi, zi, np.zeros(0, dtype=np.uint32), zi,
                      z, z, z, z, z, z, zi)
