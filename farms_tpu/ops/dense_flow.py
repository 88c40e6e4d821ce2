"""Dense (per-pixel) formulation of the flow pipeline - the TPU fast path.

Rationale: per-event gathers/scatters serialize on TPU (~0.3 us per random
access), capping the per-event formulation (ops/local_flow.py) at ~1 M
events/s. This module recomputes the reference's per-event quantities as
*dense stencil maps* over the whole sensor: all shifts are static slices of
padded arrays (pure VPU work, cost independent of the event count), and the
only per-event operations left are the initial scatter and a one-hot-matmul
result gather that runs on the MXU.

Semantics match ops/local_flow.py exactly for batch "winner" events (the
last event at each pixel within a micro-batch): the per-pixel center time is
the winner's stamp, the causal pre/post surface view is reproduced with
shifted `where`s, and every reference rule (candidate scan order, mod-2^32
future penalty, det>=1, inlier gate with Y>0, atan2(a,b) convention,
vx!=0 validity gate) is identical. Non-winner events (earlier co-batch
events at a pixel that fires again within the same micro-batch) inherit the
winner's result - part of the bounded chunking approximation, exact at
chunk_size=1.

Reference: computeLocalFlow vFlow.cpp:841-949, computeGrads
vFlow.cpp:1214-1381, computeTrueFlow vFlow.cpp:952-1210.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from farms_tpu.config import FlowConfig

_WRAP = jnp.float32(2.0 ** 32)
_HALF_WRAP = jnp.float32(2.0 ** 31)


def _shifted(arr, ox, oy, fill, halo: int = 0):
    """arr[p + (ox, oy)] with out-of-bounds cells = fill. Static slices.

    With `halo` > 0 the array already carries `halo` extra rows on each
    side (a sharded tile with exchanged neighbor bands), so x shifts are
    plain slices of the extension instead of pads; |ox| must be <= halo.
    """
    if halo:
        rows = arr.shape[0] - 2 * halo
        arr = arr[halo + ox:halo + ox + rows, :]
        W, H = arr.shape
        ph_lo, ph_hi = max(0, -oy), max(0, oy)
        padded = jnp.pad(arr, ((0, 0), (ph_lo, ph_hi)), constant_values=fill)
        return padded[:, ph_lo + oy:ph_lo + oy + H]
    W, H = arr.shape
    pw_lo, pw_hi = max(0, -ox), max(0, ox)
    ph_lo, ph_hi = max(0, -oy), max(0, oy)
    padded = jnp.pad(arr, ((pw_lo, pw_hi), (ph_lo, ph_hi)),
                     constant_values=fill)
    x0 = pw_lo + ox
    y0 = ph_lo + oy
    return padded[x0:x0 + W, y0:y0 + H]


def dense_local_flow(t_pre, t_post, cfg: FlowConfig, *,
                     halo: int = 0, row_offset=0, want_ids: bool = False,
                     t_center=None):
    """Local plane-fit flow for every pixel, against its causal surface view.

    `t_pre`/`t_post` are stamp1-encoded surfaces (stamp + 1, 0 = never
    written; see state/surfaces.py) before/after the micro-batch scatter.
    The per-pixel "event" is the most recent write at that pixel
    (t_post[p]); results are meaningful at pixels written this micro-batch
    and are gathered per event by the engine.

    Sharded-tile mode (parallel/halo.py): with `halo` > 0 the inputs carry
    `halo` exchanged neighbor rows on each side (zeros past the global
    sensor edge, matching the pad fill), outputs cover only the core rows,
    and `row_offset` (possibly traced: the shard's global first row) keeps
    coordinates and border checks global.

    Correction mode (`t_center` given): the per-pixel center stamp comes
    from `t_center` (stamp1; e.g. the rank-2 "runner-up" surface of
    FlowConfig.center_correction) instead of t_post, while the causal
    fold still runs over the snaps + t_post chain - each pixel's fit is
    evaluated at ITS center's stamp against the newest chain value not
    in that stamp's future. Pixels with t_center == 0 produce garbage
    (never gathered by the engine).

    Returns per-pixel maps (raw_vx, raw_vy, gate_valid, length, theta).
    """
    W, H = cfg.width, cfg.height      # SEMANTIC sensor bounds (border rules)
    k = cfg.filter_size
    f = cfg.f_rad
    R = cfg.support_radius
    n_cells = k * k
    # multi-snapshot causal visibility (FlowConfig.causal_snapshots):
    # t_pre may be a tuple of intra-batch boundary surfaces, oldest
    # first; the causal view folds over them plus t_post (newest value
    # not in the center's future), reproducing finer sub-phasing's
    # neighbor visibility from one pass
    snaps = tuple(t_pre) if isinstance(t_pre, (tuple, list)) else (t_pre,)
    rows = t_post.shape[0] - 2 * halo  # core rows this call computes
    Ha = t_post.shape[1]               # array height (>= H when padded)

    t_cs = t_post if t_center is None else t_center
    t_c = t_cs[halo:halo + rows, :] if halo else t_cs       # center stamp1
    px = jax.lax.broadcasted_iota(jnp.int32, (rows, Ha), 0) + row_offset
    py = jax.lax.broadcasted_iota(jnp.int32, (rows, Ha), 1)

    # ---- per-offset causal views over the support (2R+1)^2 ----
    offs = range(-R, R + 1)
    D = {}      # penalized us differences t_c - visible(p+o), f32
    ELI = {}    # inlier eligibility: stored stamp > 0 and not wrapped
    U = {}      # A-matrix x coordinate relative to center
    V = {}
    YV = {}     # Y' = (visible - t_c) seconds with -MAXSTAMP wrap
    for ox in offs:
        for oy in offs:
            if ox == 0 and oy == 0:
                vis = t_c
                tch = jnp.ones(t_c.shape, dtype=jnp.bool_)
            else:
                # neighbor's latest write not in p's future, folded over
                # the snapshot chain (oldest base, then each boundary,
                # then t_post). stamp1 values are uint32 stored in int32,
                # so order via the int32 *difference* (exact mod-2^32 for
                # any pair < 2^31 apart), never a direct signed compare
                # (wrong once stamps >= 2^31, ~35.8 min of stream).
                vis = _shifted(snaps[0], ox, oy, 0, halo)
                for s in snaps[1:] + (t_post,):
                    sh = _shifted(s, ox, oy, 0, halo)
                    vis = jnp.where((t_c - sh) >= 0, sh, vis)
                tch = vis != 0       # stamp1: 0 <=> never written
                # untouched cells hold the t=0 initializer (raw stamp 0 =
                # stamp1 value 1); map only the 0 encoding - any other
                # value, including wrapped-negative int32, is a real stamp
                vis = jnp.where(vis == 0, 1, vis)
            d = (t_c - vis).astype(jnp.float32)
            d = jnp.where(d < 0, d + _WRAP, d)
            D[(ox, oy)] = d
            # reference inlier rule Y > 0 <=> raw stamp > 0 <=> stamp1 not
            # in {0 (never written), 1 (raw stamp 0)} - an unsigned-domain
            # test, so != not > (stamp1 wraps negative past 2^31)
            ELI[(ox, oy)] = (vis != 0) & (vis != 1) & (d < _HALF_WRAP)
            # untouched cells contribute the Event(0,0,0,0) initializer's
            # coordinates (vFlow.cpp:80-93): u = 0 - px
            U[(ox, oy)] = jnp.where(tch, jnp.float32(ox), -px.astype(jnp.float32))
            V[(ox, oy)] = jnp.where(tch, jnp.float32(oy), -py.astype(jnp.float32))
            YV[(ox, oy)] = d * jnp.float32(-cfg.ts_to_sec)

    # ---- 9 candidates: score + full plane fit each, then select ----
    cand_offsets = [(a, b) for a in (-f, 0, f) for b in (-f, 0, f)]
    win_cells = [(wx, wy) for wx in range(-f, f + 1) for wy in range(-f, f + 1)]

    scores = []
    valid_masks = []
    fits = []  # per candidate: (det_ok, a, b, dtdp, inliers)
    n = jnp.float32(n_cells)
    for (a, b) in cand_offsets:
        cells = [(a + wx, b + wy) for (wx, wy) in win_cells]
        ssum = sum(D[c] for c in cells)
        scores.append(ssum / n)
        # full-window in-bounds requirement (vFlow.cpp:889)
        ok = ((px + (a - f) >= 0) & (px + (a + f) <= W - 1)
              & (py + (b - f) >= 0) & (py + (b + f) <= H - 1))
        valid_masks.append(ok)

        su = sum(U[c] for c in cells)
        sv = sum(V[c] for c in cells)
        suu = sum(U[c] * U[c] for c in cells)
        svv = sum(V[c] * V[c] for c in cells)
        suv = sum(U[c] * V[c] for c in cells)
        b0 = sum(U[c] * YV[c] for c in cells)
        b1 = sum(V[c] * YV[c] for c in cells)
        b2 = sum(YV[c] for c in cells)

        det = (suu * (svv * n - sv * sv)
               - suv * (suv * n - sv * su)
               + su * (suv * sv - svv * su))
        det_ok = det >= jnp.float32(cfg.det_threshold)   # vFlow.cpp:1323
        safe = jnp.where(det_ok, det, 1.0)
        adj00 = svv * n - sv * sv
        adj01 = su * sv - suv * n
        adj02 = suv * sv - svv * su
        adj11 = suu * n - su * su
        adj12 = su * suv - suu * sv
        a_coef = (adj00 * b0 + adj01 * b1 + adj02 * b2) / safe
        b_coef = (adj01 * b0 + adj11 * b1 + adj12 * b2) / safe
        dtdp = jnp.sqrt(a_coef * a_coef + b_coef * b_coef)
        half = dtdp * 0.5
        inl = None
        for c in cells:
            t_ok = (jnp.abs(a_coef * U[c] + b_coef * V[c] - YV[c]) < half) & ELI[c]
            inl = t_ok.astype(jnp.int32) if inl is None else inl + t_ok
        fits.append((det_ok, a_coef, b_coef, dtdp, inl))

    score_stack = jnp.stack(
        [jnp.where(vm, s, jnp.inf) for s, vm in zip(scores, valid_masks)], 0)
    best = jnp.argmin(score_stack, axis=0)         # first min = scan order
    local_ok = jnp.isfinite(jnp.min(score_stack, axis=0))

    def select(parts, dtype=jnp.float32):
        out = jnp.zeros((rows, Ha), dtype=dtype)
        for ci, part in enumerate(parts):
            out = jnp.where(best == ci, part, out)
        return out

    det_ok = select([f_[0] for f_ in fits], jnp.bool_)
    a_coef = select([f_[1] for f_ in fits])
    b_coef = select([f_[2] for f_ in fits])
    dtdp = select([f_[3] for f_ in fits])
    inliers = select([f_[4] for f_ in fits], jnp.int32)

    accept = local_ok & det_ok & (inliers >= cfg.min_evts_on_plane)

    # velocity inversion (vFlow.cpp:1373-1377); trig form kept deliberately
    # (see ops/local_flow.py for the axis-aligned knife-edge rationale)
    speed = 1.0 / dtdp
    angle = jnp.arctan2(a_coef, b_coef)
    vx_fit = speed * jnp.cos(angle)
    vy_fit = speed * jnp.sin(angle)
    raw_vx = jnp.where(accept, vx_fit, 0.0)
    raw_vy = jnp.where(accept, vy_fit, 0.0)

    gate_valid = (~jnp.isnan(raw_vx) & ~jnp.isnan(raw_vy)
                  & (raw_vx != 0) & (raw_vy != 0))      # vFlow.cpp:315
    length = jnp.sqrt(raw_vx * raw_vx + raw_vy * raw_vy)
    theta = jnp.arctan2(raw_vy, raw_vx)
    if want_ids:
        # selection diagnostics for the exact-equivalence tests: the
        # winning candidate index (scan order) and the per-candidate
        # score stack (to identify legitimate fp near-ties)
        return (raw_vx, raw_vy, gate_valid, length, theta,
                best.astype(jnp.int32), score_stack)
    return raw_vx, raw_vy, gate_valid, length, theta


def dense_aperture(flow_len, flow_vx, flow_vy, cfg: FlowConfig, *,
                   halo: int = 0, want_ids: bool = False, integ=None):
    """Multi-scale aperture pooling for every pixel via shifted integrals.

    Box sums come from 4 clamped static shifts of the padded integral image
    per scale (the clamped shifts realize the reference's window clamping,
    vFlow.cpp:998-1000; the y-by-width quirk is honored via config).

    Sharded-tile mode (parallel/halo.py): with `halo` >= max_window + 1 the
    inputs carry exchanged neighbor rows (zero-filled past the global
    edge); zero fields beyond the edge contribute nothing to box sums,
    which is exactly what the reference's x clamping computes, so the x
    side needs no clamps and outputs cover only the core rows.

    Returns per-pixel maps (true_vx, true_vy, scale).
    """
    W, H = cfg.width, cfg.height      # SEMANTIC sensor bounds (clamping)
    if halo and halo < cfg.max_window + 1:
        raise ValueError(f"halo {halo} < max_window+1 {cfg.max_window + 1}")
    if integ is not None:
        # pre-assembled integral band (partial-pooling halo mode,
        # parallel/halo.py assemble_integral_band): [4, rows+2*halo+1,
        # Ha+1] covering `halo` exchanged integral rows each side of the
        # core; flow_* are then CORE-ONLY [rows, Ha] (used for the
        # center fallback). Box sums are corner differences, so any
        # per-column constant offset in the band cancels.
        rows = integ.shape[1] - 2 * halo - 1
        Ha = flow_len.shape[1]
    else:
        rows = flow_len.shape[0] - 2 * halo
        Ha = flow_len.shape[1]         # array height (>= H when padded)
        gate = (flow_len > 0).astype(jnp.float32)
        fields = jnp.stack(
            [gate, flow_len * gate, flow_vx * gate, flow_vy * gate], 0)
        integ = jnp.pad(jnp.cumsum(jnp.cumsum(fields, axis=1), axis=2),
                        ((0, 0), (1, 0), (1, 0)))   # [4, rows+2*halo+1, H+1]

    y_hi = (W if cfg.replicate_y_clamp_quirk else H) - 1

    # pre-clamp the integral's y extent to the SEMANTIC bound: indices
    # beyond y_hi + 1 must read column y_hi + 1 (i.e. min(py+s, y_hi) + 1);
    # with padded arrays this slice also excludes y-pad cells outright
    integ_y = integ[:, :, :min(y_hi + 2, Ha + 1)]

    def corner(sx, sy):
        """integ[:, clip(px + sx, 0, Wa), clip(py + sy, 0, y_clamp)]

        In halo mode the x read is a direct slice of the extended
        integral (no clamp needed, see docstring). x clamps use the array
        extent: x-pad cells past the semantic border hold zero fields and
        contribute nothing, so this equals the reference's clamp at
        W - 1 (vFlow.cpp:998-1000)."""
        out = []
        for f_ in range(4):
            arr = integ_y[f_]
            L_x, L_y = arr.shape
            lo_y = max(0, -sy)
            hi_y = max(0, Ha - 1 + sy - (L_y - 1))
            if halo:
                p = jnp.pad(arr, ((0, 0), (lo_y, hi_y)), mode="edge")
                out.append(p[halo + sx:halo + sx + rows,
                             lo_y + sy:lo_y + sy + Ha])
            else:
                lo_x = max(0, -sx)
                hi_x = max(0, rows - 1 + sx - (L_x - 1))
                p = jnp.pad(arr, ((lo_x, hi_x), (lo_y, hi_y)), mode="edge")
                out.append(p[lo_x + sx:lo_x + sx + rows,
                             lo_y + sy:lo_y + sy + Ha])
        return jnp.stack(out, 0)

    pools = []   # per scale: (mean_vx, mean_vy)
    mean_lens = []
    for s in cfg.scales:
        # corners: x0 = max(0, px-s), x1+1 = min(px+s, W-1)+1
        a = corner(s + 1, s + 1)
        b_ = corner(-s, s + 1)
        c = corner(s + 1, -s)
        d = corner(-s, -s)
        box = a - b_ - c + d
        cnt = box[0]
        has = cnt > 0.5
        safe = jnp.where(has, cnt, 1.0)
        mean_lens.append(jnp.where(has, box[1] / safe, 0.0))
        pools.append((box[2] / safe, box[3] / safe))

    ml = jnp.stack(mean_lens, 0)                      # [S, rows, Ha]
    best = jnp.argmax(ml, axis=0)                     # first strict max
    max_val = jnp.max(ml, axis=0)

    tvx = jnp.zeros((rows, Ha), jnp.float32)
    tvy = jnp.zeros((rows, Ha), jnp.float32)
    scale = jnp.zeros((rows, Ha), jnp.int32)
    for si, s in enumerate(cfg.scales):
        hit = best == si
        tvx = jnp.where(hit, pools[si][0], tvx)
        tvy = jnp.where(hit, pools[si][1], tvy)
        scale = jnp.where(hit, s, scale)

    pooled = max_val > 0
    # fallback: center flow, scale 0 (vFlow.cpp:1086-1094); flow arrays
    # are already core-only when a pre-assembled integral band was given
    core = halo and flow_vx.shape[0] == rows + 2 * halo
    core_vx = flow_vx[halo:halo + rows, :] if core else flow_vx
    core_vy = flow_vy[halo:halo + rows, :] if core else flow_vy
    tvx = jnp.where(pooled, tvx, core_vx)
    tvy = jnp.where(pooled, tvy, core_vy)
    scale = jnp.where(pooled, scale, 0)
    if want_ids:
        # the per-scale mean-length stack, for identifying legitimate
        # near-tie scale winners in the exact-equivalence tests
        return tvx, tvy, scale, ml
    return tvx, tvy, scale


def onehot_gather(maps, x, y, W: int, H: int):
    """maps: f32 [F, W, H]; returns f32 [F, m] = maps[:, x, y].

    A flat XLA gather over the minor axis. (Measured on TPU: ~0.035 ms for
    m=32K from a 320x320x7 table - 40x faster than the one-hot-matmul
    alternative, whose W-axis contraction costs ~47 GFLOP of wasted MXU
    work per chunk.)
    """
    flat = maps.reshape(maps.shape[0], W * H)
    return jnp.take(flat, x * H + y, axis=1)
