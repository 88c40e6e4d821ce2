"""Device-resident surface state of the flow engine.

TPU-native reformulation of the reference's seven W x H EventMatrix surfaces
(vFlow.cpp:47-93). Collapsed to four maps + a step counter:

- `t_surf` replaces cSurf stamps, `lastEventTime`, AND the touched mask:
  it stores **stamp + 1** ("stamp1" encoding), so 0 means "never written"
  (the Event(0,0,0,0) initializer, vFlow.cpp:80-93), 1 means "written at
  normalized stamp 0", and any other value v means "written at stamp
  v - 1" (mod 2^32; values are uint32 bit patterns stored in int32, so
  consumers MUST compare in the unsigned domain: equality tests against
  0/1 and int32 *differences* are exact, signed </>/max are not once
  stamps pass 2^31). All stamp *differences* are unchanged by the shift,
  the reference's touched test becomes `v != 0`, and its
  inlier-eligibility `stamp > 0` becomes `v not in {0, 1}`. This removes
  one W x H array and, more importantly, one per-chunk scatter (measured
  ~7.5 ns/event each - the pipeline's dominant per-event cost).
  Known collision: a raw stamp of exactly 2^32 - 1 encodes to 0, i.e.
  that single value per 71.6-min wrap cycle reads back as "never
  written" for the one pixel holding it (until its next write).
- `epoch` records the micro-step counter of each pixel's last write; the
  engine derives "written this step" (which pixels receive flow-surface
  updates, vFlow.cpp:347-357) by comparing with `step`.
- `flow_len/vx/vy` replace flowSurfaceLength{On,Of}, flowSurfaceTheta{On,Of},
  flowSurfaceVx/Vy: the On/Off pairs always receive identical writes
  (vFlow.cpp:349-356), theta is only ever used through len*cos/len*sin
  which equal vx/vy exactly, and the Vx/Vy surfaces are never read by the
  algorithm.

Timestamps are int32 microseconds (bit-identical to the reference's
unsigned-with-mod-2^32 arithmetic for all differences; see ops/local_flow.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig


class SurfaceState(NamedTuple):
    t_surf: jax.Array    # int32 [W, H] stamp1: most-recent stamp (us) + 1
    epoch: jax.Array     # int32 [W, H] micro-step of last write (-1 = never)
    flow_len: jax.Array  # f32   [W, H] local flow magnitude of last valid event
    flow_vx: jax.Array   # f32   [W, H]
    flow_vy: jax.Array   # f32   [W, H]
    step: jax.Array      # int32 []    micro-step counter


def init_state(cfg: FlowConfig) -> SurfaceState:
    # arrays may be padded past the semantic sensor for sharding (pad
    # cells are never written; see FlowConfig.padded_to)
    W, H = cfg.array_width, cfg.array_height
    return SurfaceState(
        t_surf=jnp.zeros((W, H), dtype=jnp.int32),
        epoch=jnp.full((W, H), -1, dtype=jnp.int32),
        flow_len=jnp.zeros((W, H), dtype=jnp.float32),
        flow_vx=jnp.zeros((W, H), dtype=jnp.float32),
        flow_vy=jnp.zeros((W, H), dtype=jnp.float32),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def touched_map(t_surf1: jax.Array) -> jax.Array:
    """The reference's "pixel ever written" mask, from stamp1 encoding."""
    return t_surf1 != 0


def kill_stale_flow(state: SurfaceState, t_now: jax.Array,
                    cfg: FlowConfig) -> SurfaceState:
    """Zero flow entries that can never again pass the freshness gate.

    The reference gates pooling on |t_ev - last_t| < 500us per query
    (vFlow.cpp:1002). Since events are chronological, once
    t_now - last_t >= 500us the pixel is dead for every future query unless
    rewritten, so zeroing its length here is exact, not an approximation.
    """
    # both sides in stamp1 encoding, so the difference is the real age
    age = (t_now + 1) - state.t_surf  # int32 wrap math; negative => ancient
    stale = (age >= cfg.kill_old_flow_time_us) | (age < 0)
    return state._replace(
        flow_len=jnp.where(stale, 0.0, state.flow_len)
    )
