"""Event-serial streaming driver with per-event phase timing.

TPU-native counterpart of the reference's serial/streaming mode `run()`
(vFlow.cpp:465-826): each event is processed individually against the
surfaces every prior event built, with the two compute phases timed
separately and printed as running totals -

    Local <us> <cumulative us>      (every event, vFlow.cpp:641)
    true  <us> <cumulative us>      (valid local flow only, vFlow.cpp:719)

- and *no output file is written* (the reference's writes are commented
out, vFlow.cpp:488-489, 730-737). The returned duration is compute-only
microseconds (sum of the phase brackets), which is what the reference's
`run()` returns to main's benchmark line (main.cpp:197-200), as opposed to
runFileCopy's whole-loop wall clock.

Semantics are identical to the chunked engine at chunk_size=1 (the
golden-tested configuration): same kill-stale, scatter, local-fit and
aperture ops, one event per dispatch. Flow results are still accumulated
in memory and returned so callers can inspect them (the reference discards
them; returning costs nothing).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, FlowOutput
from farms_tpu.ops.aperture import aperture_batch, build_integral
from farms_tpu.ops.local_flow import local_flow_batch
from farms_tpu.state.surfaces import SurfaceState, init_state, kill_stale_flow


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _local_phase(state: SurfaceState, x, y, t, cfg: FlowConfig):
    """Surface update + local plane fit for ONE event (computeLocalFlow,
    vFlow.cpp:841-949). Mirrors micro_step's per-event path at m=1."""
    t1 = t + 1                                  # stamp1 encoding
    state = kill_stale_flow(state, t, cfg)
    t_surf = state.t_surf.at[x, y].set(t1)
    epoch = state.epoch.at[x, y].set(state.step)
    raw_vx, raw_vy, gate_valid, length, theta = local_flow_batch(
        state.t_surf, t_surf, x[None], y[None], t1[None], cfg)
    state = state._replace(t_surf=t_surf, epoch=epoch)
    return state, (raw_vx[0], raw_vy[0], gate_valid[0], length[0], theta[0])


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _true_phase(state: SurfaceState, x, y, vx, vy, length, theta,
                cfg: FlowConfig):
    """Flow-surface write + multi-scale aperture correction for one valid
    event (the reference's timed true-flow bracket, vFlow.cpp:652-719)."""
    flow_len = state.flow_len.at[x, y].set(length)
    flow_vx = state.flow_vx.at[x, y].set(vx)
    flow_vy = state.flow_vy.at[x, y].set(vy)
    integral = build_integral(flow_len, flow_vx, flow_vy)
    tvx, tvy, scale = aperture_batch(
        integral, flow_vx, flow_vy, x[None], y[None], cfg)
    state = SurfaceState(state.t_surf, state.epoch, flow_len, flow_vx,
                         flow_vy, state.step + 1)
    return state, (tvx[0], tvy[0], scale[0])


@functools.partial(jax.jit, donate_argnums=(0,))
def _invalid_phase(state: SurfaceState, x, y):
    """Invalid local flow: zero the pixel's flow surfaces
    (vFlow.cpp:771-775)."""
    return SurfaceState(
        state.t_surf,
        state.epoch,
        state.flow_len.at[x, y].set(0.0),
        state.flow_vx.at[x, y].set(0.0),
        state.flow_vy.at[x, y].set(0.0),
        state.step + 1,
    )


class SerialFlowEngine:
    """Streaming per-event driver (reference `--SERIAL 1` mode)."""

    def __init__(self, cfg: FlowConfig, print_fn=print):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._t0 = None
        self._print = print_fn

    def run(self, ev: EventBatch, quiet: bool = False):
        """Process events one by one with per-phase timing prints.

        Returns (FlowOutput, compute_us): the flow results and the summed
        compute-only microseconds (the reference run()'s return value).
        """
        cfg = self.cfg
        n = len(ev)
        if n == 0:
            return _empty_output(), 0
        if self._t0 is None:
            self._t0 = np.uint32(ev.t[0])
        xs = np.clip(ev.x.astype(np.int32), 0, cfg.width - 1)
        ys = np.clip(ev.y.astype(np.int32), 0, cfg.height - 1)
        ts = (ev.t.astype(np.uint32) - self._t0).view(np.int32)

        cols = np.zeros((n, 7), dtype=np.float64)
        local_cum = 0     # durationEventsLocalShow, vFlow.cpp:640
        true_cum = 0      # durationEventsTrueShow, vFlow.cpp:718
        compute_us = 0    # durationEvents (returned), vFlow.cpp:645, 723
        for i in range(n):
            x = jnp.int32(xs[i])
            y = jnp.int32(ys[i])
            t = jnp.int32(ts[i])

            t_a = time.perf_counter()
            self.state, (vx, vy, gate, length, theta) = _local_phase(
                self.state, x, y, t, cfg)
            gate = bool(gate)           # device sync: phase is complete
            d_local = int((time.perf_counter() - t_a) * 1e6)
            local_cum += d_local
            compute_us += d_local
            if not quiet:
                self._print(f"Local {d_local} {local_cum}")

            if gate:
                vxf, vyf = float(vx), float(vy)
                lf, thf = float(length), float(theta)
                t_b = time.perf_counter()
                self.state, (tvx, tvy, scale) = _true_phase(
                    self.state, x, y, vx, vy, length, theta, cfg)
                tvxf, tvyf = float(tvx), float(tvy)   # device sync
                d_true = int((time.perf_counter() - t_b) * 1e6)
                true_cum += d_true
                compute_us += d_true
                if not quiet:
                    self._print(f"true {d_true} {true_cum}")
                # f32 math to match the on-device chunked engine exactly
                a32, b32 = np.float32(tvxf), np.float32(tvyf)
                r_true = float(np.sqrt(a32 * a32 + b32 * b32,
                                       dtype=np.float32))
                th_true = float(np.arctan2(b32, a32, dtype=np.float32))
                cols[i] = (r_true, th_true, vxf, vyf, lf, thf,
                           float(int(scale)))
            else:
                self.state = _invalid_phase(self.state, x, y)
                # invalid rows keep raw (possibly NaN) vx/vy, zeros
                # elsewhere (vFlow.cpp:390-395)
                cols[i] = (0.0, 0.0, float(vx), float(vy), 0.0, 0.0, 0.0)

        out = FlowOutput(
            x=xs, y=ys,
            t=(ev.t.astype(np.uint32) - self._t0).astype(np.uint32),
            pol=ev.pol.astype(np.int32),
            r_true=cols[:, 0], theta_true=cols[:, 1],
            vx=cols[:, 2], vy=cols[:, 3],
            r_local=cols[:, 4], theta_local=cols[:, 5],
            scale=cols[:, 6].astype(np.int32),
        )
        return out, compute_us


def _empty_output() -> FlowOutput:
    z = np.zeros(0)
    zi = np.zeros(0, dtype=np.int32)
    return FlowOutput(zi, zi, np.zeros(0, dtype=np.uint32), zi,
                      z, z, z, z, z, z, zi)
