"""Multi-scale aperture correction as an integral-image reduction.

The reference rescans up to (2s+1)^2 pixels per event per scale
(vFlow.cpp:987-1045), ~38k pixel visits per event at defaults - its dominant
cost. Here the pooled quantities are decomposed into prefix sums computed
once per micro-batch, so each (event, scale) needs only 4 corner lookups
per field.

Key identity making this exact: the reference pools
  sum(len), sum(len*cos(theta)), sum(len*sin(theta)), count
over gated pixels (vFlow.cpp:1005-1028), and since len = |(vx,vy)| and
theta = atan2(vy,vx) at write time, len*cos(theta) == vx and
len*sin(theta) == vy. The flow surfaces therefore store (len, vx, vy)
directly and the pools are plain box sums.

Freshness gate: the reference's per-event |t_ev - last_t| < 500us test
(vFlow.cpp:1002) is enforced in two parts: entries stale at micro-batch
start are zeroed permanently by the engine (exact: once a pixel is >=500us
old it can never pass the gate again - later events only have larger t),
and within a micro-batch all surviving entries are pooled (an approximation
whose error is bounded by the micro-batch's time span; exact for
chunk_size=1).

Scale selection: first strict maximum of mean length over the 11 scales
(vFlow.cpp:1052-1059) == argmax first-occurrence with a zero guard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig


def build_integral(flow_len, flow_vx, flow_vy):
    """Stack gated fields and build 2-D inclusive prefix sums.

    Returns f32 [4, W+1, H+1]: exclusive-padded integral images of
    (count, len, vx, vy), each gated by len > 0.
    """
    gate = (flow_len > 0).astype(jnp.float32)
    fields = jnp.stack(
        [gate, flow_len * gate, flow_vx * gate, flow_vy * gate], axis=0
    )
    integ = jnp.cumsum(jnp.cumsum(fields, axis=1), axis=2)
    return jnp.pad(integ, ((0, 0), (1, 0), (1, 0)))


def aperture_batch(
    integral: jax.Array,   # f32 [4, W+1, H+1] from build_integral
    flow_vx: jax.Array,    # f32 [W, H] (for the center fallback)
    flow_vy: jax.Array,
    x: jax.Array,          # int32 [m]
    y: jax.Array,          # int32 [m]
    cfg: FlowConfig,
):
    """Pool flow over the scale pyramid and pick the winning scale.

    Returns (true_vx, true_vy, scale) per event.
    """
    W, H = cfg.width, cfg.height
    scales = jnp.asarray(cfg.scales, dtype=jnp.int32)        # [S]
    y_clamp = (W if cfg.replicate_y_clamp_quirk else H) - 1  # vFlow.cpp:998

    x0 = jnp.maximum(x[:, None] - scales[None, :], 0)         # [m, S]
    x1 = jnp.minimum(x[:, None] + scales[None, :], W - 1)
    y0 = jnp.maximum(y[:, None] - scales[None, :], 0)
    y1 = jnp.minimum(y[:, None] + scales[None, :], y_clamp)

    # corner sums over all 4 fields at once: [4, m, S]
    def corner(ix, iy):
        return integral[:, ix, iy]

    box = (
        corner(x1 + 1, y1 + 1)
        - corner(x0, y1 + 1)
        - corner(x1 + 1, y0)
        + corner(x0, y0)
    )
    cnt, s_len, s_vx, s_vy = box[0], box[1], box[2], box[3]
    has = cnt > 0.5
    safe_cnt = jnp.where(has, cnt, 1.0)
    mean_len = jnp.where(has, s_len / safe_cnt, 0.0)          # [m, S]

    best = jnp.argmax(mean_len, axis=1)                       # first max
    max_val = jnp.take_along_axis(mean_len, best[:, None], 1)[:, 0]
    best_vx = jnp.take_along_axis(s_vx / safe_cnt, best[:, None], 1)[:, 0]
    best_vy = jnp.take_along_axis(s_vy / safe_cnt, best[:, None], 1)[:, 0]
    best_scale = scales[best]

    # fallback: center flow, scale 0 (vFlow.cpp:1086-1094; dead in practice
    # because a valid event always pools its own pixel at scale 0)
    center_vx = flow_vx[x, y]
    center_vy = flow_vy[x, y]
    pooled = max_val > 0
    true_vx = jnp.where(pooled, best_vx, center_vx)
    true_vy = jnp.where(pooled, best_vy, center_vy)
    scale = jnp.where(pooled, best_scale, 0)
    return true_vx, true_vy, scale
