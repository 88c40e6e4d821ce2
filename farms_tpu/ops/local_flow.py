"""Batched local plane-fit flow (JAX/XLA formulation).

Reimplements the reference's per-event `computeLocalFlow` + `computeGrads`
(vFlow.cpp:841-949, 1214-1381) as one vectorized computation over an event
micro-batch:

1. one support-patch gather of (4*f_rad+1)^2 time-surface cells per event
   covers all 9 candidate k x k windows at offsets {-f_rad, 0, +f_rad}^2;
2. candidate scoring = windowed means of (t_ev - t_cell), first strict
   minimum in the reference's scan order (x-offset outer, y inner);
3. the winning window feeds a closed-form 3x3 normal-equation solve.

Numerics: timestamps are int32 microseconds; all differences are exact
integer subtractions cast to f32, and plane-fit coordinates are centered on
the event before forming AtA, so the Gram determinant is computed from
small integers (translation leaves det(A^T A) invariant because the shift
matrix is unimodular). The reference computes the same quantities in f64
from absolute coordinates (vFlow.cpp:1307-1323), which is mathematically
identical but numerically far worse conditioned.

Timestamp wraparound: the reference adds MAXSTAMP=2^32 when a stored stamp
exceeds the current event's (vFlow.cpp:897-902, 1229-1233), i.e. interprets
stamp differences modulo 2^32. We take int32 differences, which agree with
that on all sorted streams (and additionally give small-magnitude values for
slightly-future co-batch neighbors, which only exist in batched mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig


def local_flow_batch(
    t_pre: jax.Array,     # int32 [W, H] stamp1 surface before this batch
    t_post: jax.Array,    # int32 [W, H] stamp1 surface after the scatter
    x: jax.Array,         # int32 [m]
    y: jax.Array,         # int32 [m]
    t_ev: jax.Array,      # int32 [m] stamp1 event stamps (us + 1)
    cfg: FlowConfig,
):
    """Compute local flow for a micro-batch of events.

    Returns (raw_vx, raw_vy, gate_valid, length, theta): raw_vx/raw_vy are
    the reference's FlowEvent values (zero when the fit is rejected, possibly
    inf/nan when dtdp == 0 with min_evts_on_plane == 0); gate_valid is the
    driver's validity gate (vFlow.cpp:315); length/theta are the local polar
    flow, meaningful only where gate_valid.
    """
    W, H = cfg.width, cfg.height
    k = cfg.filter_size
    f_rad = cfg.f_rad
    R = cfg.support_radius  # 2*f_rad
    S = 2 * R + 1

    m = x.shape[0]
    du = jnp.arange(-R, R + 1, dtype=jnp.int32)

    # ---- support gather: [m, S, S] ----
    gx = jnp.broadcast_to(x[:, None, None] + du[None, :, None], (m, S, S))
    gy = jnp.broadcast_to(y[:, None, None] + du[None, None, :], (m, S, S))
    cgx = jnp.clip(gx, 0, W - 1)
    cgy = jnp.clip(gy, 0, H - 1)

    # Causal patch view: the reference is event-serial, so event i must not
    # see writes from later events. Per cell, take the post-scatter value
    # when its stamp is <= the event's own stamp, otherwise fall back to the
    # pre-batch value (slightly stale only when one pixel receives multiple
    # co-batch events straddling t_ev, but never acausal). The event's own
    # pixel always shows the event itself (vFlow.cpp:267 writes cSurf
    # before computeLocalFlow reads it).
    post_t = t_post[cgx, cgy]
    # stamp1 values are uint32 stored in int32: order via the int32
    # *difference* (exact mod-2^32 for pairs < 2^31 apart), never a direct
    # signed compare (wrong once stamps >= 2^31, ~35.8 min of stream)
    causal = (t_ev[:, None, None] - post_t) >= 0
    own = (cgx == x[:, None, None]) & (cgy == y[:, None, None])
    t_patch = jnp.where(causal, post_t, t_pre[cgx, cgy])
    t_patch = jnp.where(own, t_ev[:, None, None], t_patch)
    # stamp1 encoding: 0 <=> never written (state/surfaces.py)
    touched_patch = (t_patch != 0) | own
    # untouched cells hold the t=0 initializer (= stamp1 value 1); map only
    # the 0 encoding - any other value, including wrapped-negative int32,
    # is a real stamp
    t_patch = jnp.where(t_patch == 0, 1, t_patch)

    # us difference modulo 2^32, exactly as the reference computes it:
    # signed int32 subtraction is exact, and stamps from the "future"
    # (stored > current) get +MAXSTAMP (vFlow.cpp:897-902), i.e. the
    # difference is interpreted as unsigned. Inside the engine the causal
    # gather guarantees d >= 0, so the correction only matters for direct
    # kernel calls on arbitrary surfaces.
    d_signed = (t_ev[:, None, None] - t_patch).astype(jnp.float32)
    d_patch = jnp.where(d_signed < 0, d_signed + jnp.float32(2.0**32), d_signed)

    # ---- 9 candidate windows + scores ----
    # All candidate windows are static slices of the support patch; the
    # winner is later selected with a one-hot contraction. No per-event
    # dynamic slices: vmapped dynamic_slice lowers to serialized gathers
    # on TPU and dominated the step cost (~40 ms for 4096 events).
    offsets = (-f_rad, 0, f_rad)
    d_wins, t_wins, tchd_wins = [], [], []
    scores = []
    cand_valid = []
    for a in offsets:          # x offset outer (vFlow.cpp:870)
        for b in offsets:      # y offset inner (vFlow.cpp:872)
            # window cells span du in [a-f_rad, a+f_rad]; support index du+R
            dw = d_patch[:, a + f_rad:a + f_rad + k, b + f_rad:b + f_rad + k]
            d_wins.append(dw)
            t_wins.append(
                t_patch[:, a + f_rad:a + f_rad + k, b + f_rad:b + f_rad + k])
            tchd_wins.append(
                touched_patch[:, a + f_rad:a + f_rad + k,
                              b + f_rad:b + f_rad + k])
            scores.append(jnp.mean(dw, axis=(1, 2)))
            ok = (
                (x + (a - f_rad) >= 0)
                & (x + (a + f_rad) <= W - 1)
                & (y + (b - f_rad) >= 0)
                & (y + (b + f_rad) <= H - 1)
            )  # full-window requirement (border skip, vFlow.cpp:889)
            cand_valid.append(ok)
    scores = jnp.stack(scores, axis=1)          # [m, 9]
    cand_valid = jnp.stack(cand_valid, axis=1)  # [m, 9]
    scores = jnp.where(cand_valid, scores, jnp.inf)
    best = jnp.argmin(scores, axis=1)           # first minimum = scan order
    local_ok = jnp.isfinite(jnp.take_along_axis(scores, best[:, None], 1))[:, 0]

    # ---- select the winning k x k window via one-hot contraction ----
    onehot = jax.nn.one_hot(best, 9, dtype=jnp.float32)        # [m, 9]
    d_stack = jnp.stack(d_wins, axis=1)                        # [m,9,k,k]
    t_stack = jnp.stack(t_wins, axis=1)
    tchd_stack = jnp.stack(tchd_wins, axis=1)

    def pick(stack_f32):
        return jnp.einsum("mc,mcij->mij", onehot, stack_f32)

    d_win = pick(d_stack)
    # reference inlier rule Y > 0 <=> raw stamp > 0 <=> stamp1 not in
    # {0 (never written), 1 (raw stamp 0)} - an unsigned-domain test, so
    # != not > (stamp1 wraps negative past 2^31)
    t_win_positive = pick(
        ((t_stack != 0) & (t_stack != 1)).astype(jnp.float32)) > 0.5
    tchd_win = pick(tchd_stack.astype(jnp.float32)) > 0.5

    # absolute coordinates of the winning window's cells (clamped like the
    # support gather): center offset da/db in {-f_rad,0,f_rad}
    da = (best // 3 - 1).astype(jnp.int32) * f_rad             # [m]
    db = (best % 3 - 1).astype(jnp.int32) * f_rad
    ki = jnp.arange(k, dtype=jnp.int32)
    px_win = jnp.clip(
        x[:, None, None] + da[:, None, None] - f_rad + ki[None, :, None],
        0, W - 1)
    py_win = jnp.clip(
        y[:, None, None] + db[:, None, None] - f_rad + ki[None, None, :],
        0, H - 1)
    px_win = jnp.broadcast_to(px_win, (m, k, k))
    py_win = jnp.broadcast_to(py_win, (m, k, k))

    # ---- plane fit (computeGrads, vFlow.cpp:1241-1381) ----
    # A rows are the *stored events'* coordinates: the pixel coordinate when
    # the pixel was ever written, or (0, 0) from the Event() initializer
    # otherwise (vFlow.cpp:80-93). Centered on the event for conditioning.
    u = jnp.where(tchd_win, px_win - x[:, None, None], -x[:, None, None])
    v = jnp.where(tchd_win, py_win - y[:, None, None], -y[:, None, None])
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    # Y' = Y - cz in seconds: stored stamp minus event stamp; the mod-2^32
    # correction in d_win matches the reference's -MAXSTAMP wrap of Y
    # (vFlow.cpp:1229-1233)
    yv = -d_win * jnp.float32(cfg.ts_to_sec)

    n = jnp.float32(k * k)
    su = jnp.sum(u, axis=(1, 2))
    sv = jnp.sum(v, axis=(1, 2))
    suu = jnp.sum(u * u, axis=(1, 2))
    svv = jnp.sum(v * v, axis=(1, 2))
    suv = jnp.sum(u * v, axis=(1, 2))
    b0 = jnp.sum(u * yv, axis=(1, 2))
    b1 = jnp.sum(v * yv, axis=(1, 2))
    b2 = jnp.sum(yv, axis=(1, 2))

    det = (
        suu * (svv * n - sv * sv)
        - suv * (suv * n - sv * su)
        + su * (suv * sv - svv * su)
    )
    det_ok = det >= jnp.float32(cfg.det_threshold)  # vFlow.cpp:1323
    safe_det = jnp.where(det_ok, det, 1.0)

    adj00 = svv * n - sv * sv
    adj01 = su * sv - suv * n
    adj02 = suv * sv - svv * su
    adj11 = suu * n - su * su
    adj12 = su * suv - suu * sv
    a_coef = (adj00 * b0 + adj01 * b1 + adj02 * b2) / safe_det
    b_coef = (adj01 * b0 + adj11 * b1 + adj12 * b2) / safe_det

    dtdp2 = a_coef * a_coef + b_coef * b_coef
    dtdp = jnp.sqrt(dtdp2)

    # inliers (vFlow.cpp:1352-1369): |planedt - actualdt| < dtdp/2 and Y > 0.
    # Y > 0 iff the stored stamp is a positive past stamp (t=0 init cells and
    # wrapped/future stamps are excluded).
    plane_dt = a_coef[:, None, None] * u + b_coef[:, None, None] * v
    # Y > 0 iff stored stamp positive and not wrap-corrected (d in [0, 2^31))
    eligible = t_win_positive & (d_win < jnp.float32(2.0**31))
    inlier = (jnp.abs(plane_dt - yv) < (dtdp / 2)[:, None, None]) & eligible
    inliers = jnp.sum(inlier, axis=(1, 2))

    accept = local_ok & det_ok & (inliers >= cfg.min_evts_on_plane)

    # velocity inversion (vFlow.cpp:1373-1377): speed = 1/dtdp,
    # angle = atan2(a, b), vx = speed*cos(angle), vy = speed*sin(angle).
    # The trig form is kept deliberately: for axis-aligned planes (a or b
    # exactly 0) the reference's validity gate `vx != 0 && vy != 0` passes
    # only because cos(atan2(...)) rounds to a tiny nonzero value; the
    # algebraically equivalent b/dtdp^2 would give an exact 0 and flip the
    # gate. dtdp == 0 also reproduces the reference's inf/nan pair
    # (speed = inf, angle = 0 => vx = inf, vy = inf*0 = nan).
    speed = 1.0 / dtdp
    angle = jnp.arctan2(a_coef, b_coef)
    vx_fit = speed * jnp.cos(angle)
    vy_fit = speed * jnp.sin(angle)

    raw_vx = jnp.where(accept, vx_fit, 0.0)
    raw_vy = jnp.where(accept, vy_fit, 0.0)

    # driver validity gate (vFlow.cpp:315)
    gate_valid = (
        ~jnp.isnan(raw_vx) & ~jnp.isnan(raw_vy) & (raw_vx != 0) & (raw_vy != 0)
    )
    length = jnp.sqrt(raw_vx * raw_vx + raw_vy * raw_vy)
    theta = jnp.arctan2(raw_vy, raw_vx)
    return raw_vx, raw_vy, gate_valid, length, theta
