"""Device-resident surface state of the flow engine.

TPU-native reformulation of the reference's seven W x H EventMatrix surfaces
(vFlow.cpp:47-93). Collapsed to five arrays:

- `t_surf` replaces both `cSurf` stamps and `lastEventTime`: the reference
  writes them with the same value for every event (vFlow.cpp:264-267, 407),
  so they are always equal.
- `touched` captures the Event(0,0,0,0) initialization: untouched pixels
  contribute (0, 0, t=0) rows to plane fits (vFlow.cpp:80-93); a stored
  event's coordinates otherwise equal its pixel coordinates.
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
    t_surf: jax.Array    # int32 [W, H] most-recent event stamp (us)
    touched: jax.Array   # bool  [W, H]
    flow_len: jax.Array  # f32   [W, H] local flow magnitude of last valid event
    flow_vx: jax.Array   # f32   [W, H]
    flow_vy: jax.Array   # f32   [W, H]


def init_state(cfg: FlowConfig) -> SurfaceState:
    W, H = cfg.width, cfg.height
    return SurfaceState(
        t_surf=jnp.zeros((W, H), dtype=jnp.int32),
        touched=jnp.zeros((W, H), dtype=jnp.bool_),
        flow_len=jnp.zeros((W, H), dtype=jnp.float32),
        flow_vx=jnp.zeros((W, H), dtype=jnp.float32),
        flow_vy=jnp.zeros((W, H), dtype=jnp.float32),
    )


def kill_stale_flow(state: SurfaceState, t_now: jax.Array,
                    cfg: FlowConfig) -> SurfaceState:
    """Zero flow entries that can never again pass the freshness gate.

    The reference gates pooling on |t_ev - last_t| < 500us per query
    (vFlow.cpp:1002). Since events are chronological, once
    t_now - last_t >= 500us the pixel is dead for every future query unless
    rewritten, so zeroing its length here is exact, not an approximation.
    """
    age = t_now - state.t_surf  # int32 wrap math; negative => ancient/wrapped
    stale = (age >= cfg.kill_old_flow_time_us) | (age < 0)
    return state._replace(
        flow_len=jnp.where(stale, 0.0, state.flow_len)
    )
