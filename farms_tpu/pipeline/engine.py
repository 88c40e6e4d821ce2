"""Chunked streaming flow engine.

TPU-native replacement for the reference's per-event hot loop
(runFileCopy, vFlow.cpp:223-414). Events are processed in fixed-size
micro-batches; each micro-step is a pure function over the SurfaceState
pytree, micro-steps are fused with `lax.scan`, and the host driver streams
chunks to the device carrying the state across calls (which doubles as the
checkpoint/resume mechanism: the surface pytree *is* the whole state).

Sequential-semantics note: the reference is strictly event-serial - event i
sees surfaces updated by all events j < i. A micro-batch instead scatters
all its events first, then computes all its flows against that surface, so
events also see co-batch neighbors (including slightly-future ones). The
approximation error is bounded by the micro-batch's time span and vanishes
at chunk_size=1, which reproduces the reference bit-for-bit and is what the
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
from farms_tpu.ops.local_flow import local_flow_batch
from farms_tpu.state.surfaces import SurfaceState, init_state, kill_stale_flow


def micro_step(state: SurfaceState, batch, cfg: FlowConfig):
    """Process one micro-batch of events against the carried surfaces.

    `batch` is (x, y, t, lane_valid) with static length m. Returns the
    updated state and the per-event output columns.
    """
    x, y, t, lane_valid = batch
    W, H = cfg.width, cfg.height
    m = x.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)

    # ---- permanent staleness kill (exact; see state/surfaces.py) ----
    state = kill_stale_flow(state, t[0], cfg)

    # ---- scatter events into the time surface ----
    # invalid lanes are redirected out of bounds and dropped
    sx = jnp.where(lane_valid, x, W)
    t_surf = state.t_surf.at[sx, y].max(t, mode="drop")
    touched = state.touched.at[sx, y].set(True, mode="drop")

    # last-write-wins resolution for duplicate pixels within the batch
    # (reference semantics: later events overwrite, vFlow.cpp:264-273)
    slot = jnp.full((W, H), -1, dtype=jnp.int32)
    slot = slot.at[sx, y].max(idx, mode="drop")
    is_winner = (slot[jnp.clip(x, 0, W - 1), y] == idx) & lane_valid

    # ---- local plane-fit flow (causal view over pre/post surfaces) ----
    raw_vx, raw_vy, gate_valid, length, theta = local_flow_batch(
        state.t_surf, state.touched, t_surf, touched, x, y, t, cfg
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
        integral, flow_vx, flow_vy, jnp.clip(x, 0, W - 1), y, cfg
    )

    # ---- output columns (vFlow.cpp:370-396) ----
    r_true = jnp.where(gate_valid, jnp.sqrt(true_vx**2 + true_vy**2), 0.0)
    theta_true = jnp.where(gate_valid, jnp.arctan2(true_vy, true_vx), 0.0)
    outputs = (
        jnp.where(gate_valid, r_true, 0.0),
        theta_true,
        raw_vx,
        raw_vy,
        jnp.where(gate_valid, length, 0.0),
        jnp.where(gate_valid, theta, 0.0),
        jnp.where(gate_valid, scale, 0),
    )
    new_state = SurfaceState(t_surf, touched, flow_len, flow_vx, flow_vy)
    return new_state, outputs


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def scan_chunk(state: SurfaceState, chunk, cfg: FlowConfig):
    """Run several micro-steps under one jit via lax.scan.

    `chunk` arrays are shaped [n_steps, m(, ...)].
    """
    def body(st, batch):
        return micro_step(st, batch, cfg)

    return jax.lax.scan(body, state, chunk)


class FlowEngine:
    """Host-side streaming driver carrying device state across chunks."""

    def __init__(self, cfg: FlowConfig):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._t0 = None

    def reset(self):
        self.state = init_state(self.cfg)
        self._t0 = None

    def process(self, ev: EventBatch) -> FlowOutput:
        """Process an event stream (or a continuation of one).

        The first call latches t0 = first stamp (vFlow.cpp:194, 241);
        subsequent calls continue the same normalized timeline, so a long
        recording can be streamed through repeated calls.
        """
        cfg = self.cfg
        n = len(ev)
        if n == 0:
            return _empty_output()
        if self._t0 is None:
            self._t0 = np.uint32(ev.t[0])

        x = np.clip(ev.x.astype(np.int32), 0, cfg.width - 1)
        y = np.clip(ev.y.astype(np.int32), 0, cfg.height - 1)
        t = (ev.t.astype(np.uint32) - self._t0).astype(np.uint32)
        t_i32 = t.view(np.int32)

        m = cfg.chunk_size
        spc = cfg.steps_per_scan
        per_call = m * spc
        n_calls = -(-n // per_call)
        pad_total = n_calls * per_call - n

        xp = np.pad(x, (0, pad_total))
        yp = np.pad(y, (0, pad_total))
        tp = np.pad(t_i32, (0, pad_total), mode="edge")
        lv = np.pad(np.ones(n, dtype=bool), (0, pad_total))

        outs = []
        for c in range(n_calls):
            sl = slice(c * per_call, (c + 1) * per_call)
            chunk = (
                jnp.asarray(xp[sl].reshape(spc, m)),
                jnp.asarray(yp[sl].reshape(spc, m)),
                jnp.asarray(tp[sl].reshape(spc, m)),
                jnp.asarray(lv[sl].reshape(spc, m)),
            )
            self.state, out = scan_chunk(self.state, chunk, cfg)
            outs.append(out)

        cols = [
            np.concatenate([np.asarray(o[i]).reshape(-1) for o in outs])[:n]
            for i in range(7)
        ]
        r_true, theta_true, vx, vy, r_local, theta_local, scale = cols
        return FlowOutput(
            x=ev.x.astype(np.int32),
            y=ev.y.astype(np.int32),
            t=t,
            pol=ev.pol.astype(np.int32),
            r_true=r_true.astype(np.float64),
            theta_true=theta_true.astype(np.float64),
            vx=vx.astype(np.float64),
            vy=vy.astype(np.float64),
            r_local=r_local.astype(np.float64),
            theta_local=theta_local.astype(np.float64),
            scale=scale.astype(np.int32),
        )


def _empty_output() -> FlowOutput:
    z = np.zeros(0)
    zi = np.zeros(0, dtype=np.int32)
    return FlowOutput(zi, zi, np.zeros(0, dtype=np.uint32), zi,
                      z, z, z, z, z, z, zi)
