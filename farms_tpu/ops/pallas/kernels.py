"""Fused Pallas TPU kernels for the two hot stages of the pipeline.

These are drop-in replacements for ops/dense_flow.py's XLA formulations of
the reference's hot loops (computeLocalFlow vFlow.cpp:841-949 + computeGrads
vFlow.cpp:1214-1381, and computeTrueFlow vFlow.cpp:952-1210). The math and
selection semantics are identical to the jnp dense path - same candidate
scan order, mod-2^32 future penalty, det>=1 gate, inlier rule, atan2(a,b)
convention, first-min/first-max tie breaking - but each stage runs as ONE
kernel with every intermediate living in VMEM, instead of dozens of
HBM-materialized (W, H) temporaries.

Design notes (TPU-first):

* Local flow: per-candidate statistics are *recomputed* cell by cell
  instead of precomputing the (2R+1)^2 per-offset maps. The recompute is
  pure VPU work (~20 ops per cell) and keeps peak VMEM at ~a dozen (W, H)
  f32 arrays; materializing the per-offset maps would need 25 x 10 maps
  (> VMEM). Candidates fold into a running "best" via strict-< selects,
  which reproduces the reference's first-min scan order.

* Aperture: the clamp-padded integral image is built directly on the MXU:
  PI = Ax @ F @ By^T, where Ax[i, w] = [w < clip(i - M, 0, W)] is a clamped
  step matrix (and By the same for y, honoring the y-clamped-by-width quirk
  toggle). One matmul pair per field replaces XLA's multi-pass cumsum plus
  44 edge-padded corner arrays; every scale's box sum is then 4 static
  slices of the VMEM-resident PI. The 0/1 gate field makes the count path
  exact on the MXU (bf16x3 decomposition of 0/1 values is lossless).

Both kernels are single-block (whole sensor in VMEM) and are guarded by
`*_supported(cfg)`; larger sensors fall back to the XLA dense path. On CPU
(tests / forced host platform) the kernels run in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from farms_tpu.config import FlowConfig

# plain Python floats: jnp scalars would be captured as constants by the
# kernel tracer, which pallas_call rejects
_WRAP = float(2.0 ** 32)
_HALF_WRAP = float(2.0 ** 31)

# single-block VMEM budget: padded sensor area in cells. 320x320 (the
# reference default, main.cpp:21-22) fits comfortably; 640x480 does not.
_MAX_CELLS_LOCAL = 200_000
_MAX_CELLS_APERTURE = 200_000


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rup8(x: int) -> int:
    return -(-x // 8) * 8


def local_flow_supported(cfg: FlowConfig) -> bool:
    R = cfg.support_radius
    return (cfg.width + 2 * R) * (cfg.height + 2 * R) <= _MAX_CELLS_LOCAL


def aperture_supported(cfg: FlowConfig) -> bool:
    M = cfg.max_window
    return (cfg.width + 2 * M + 1) * (cfg.height + 2 * M + 1) \
        <= _MAX_CELLS_APERTURE * 5


# --------------------------------------------------------------------------
# local plane-fit flow
# --------------------------------------------------------------------------

def _local_flow_kernel(tq_ref, tp_ref,
                       acc_ref, a_ref, b_ref, dtdp_ref,
                       *, cfg: FlowConfig, tr: int):
    """One program computes a `tr`-row band of the sensor.

    Inputs are the whole padded surfaces resident in VMEM (constant block);
    the band's stencil reads are dynamic-row/static-lane slices, so VMEM
    temporaries are band-sized - Mosaic allocates every materialized value
    on a stack without liveness reuse, and whole-sensor temporaries
    overflow the 16 MB VMEM (measured: ~110 MB for 320x320 single-block).
    """
    W, H = cfg.width, cfg.height
    f = cfg.f_rad
    R = cfg.support_radius
    k = cfg.filter_size
    n = jnp.float32(k * k)
    row0 = pl.program_id(0) * tr

    # one aligned band load per input; stencil reads are then static
    # slices of the loaded vectors (Mosaic requires dynamic sublane
    # starts to be 8-aligned, which row0 + R + ox is not)
    bh = tr + _rup8(2 * R)
    band_q = tq_ref[pl.ds(row0, bh), :]
    band_p = tp_ref[pl.ds(row0, bh), :]

    t_c = band_p[R:R + tr, R:R + H]                    # i32 center stamps
    px = jax.lax.broadcasted_iota(jnp.int32, (tr, H), 0) + row0
    py = jax.lax.broadcasted_iota(jnp.int32, (tr, H), 1)
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    neg_ts = jnp.float32(-cfg.ts_to_sec)

    def cell(ox: int, oy: int):
        """Causal view of the neighbor at static offset (ox, oy).

        Returns (d, eli, u, v, yv) exactly as ops/dense_flow.py computes
        its D/ELI/U/V/YV per-offset maps, evaluated on the fly.
        """
        if ox == 0 and oy == 0:
            zero = jnp.zeros((tr, H), jnp.float32)
            # eligibility: stamp1 not in {0, 1} - unsigned-domain test
            # (stamp1 wraps negative past 2^31), see ops/dense_flow.py
            return (zero, (t_c != 0) & (t_c != 1), zero, zero, zero)
        rs = slice(R + ox, R + ox + tr)
        cs = slice(R + oy, R + oy + H)
        tp = band_p[rs, cs]
        tq = band_q[rs, cs]
        # order stamp1 (uint32-in-int32) values via the int32 difference,
        # exact mod-2^32; a direct signed compare breaks past 2^31
        causal = (t_c - tp) >= 0
        vis = jnp.where(causal, tp, tq)
        tch = vis != 0               # stamp1: 0 <=> never written
        # untouched cells hold the t=0 initializer (= stamp1 value 1);
        # map only the 0 encoding - wrapped-negative values are real stamps
        vis = jnp.where(vis == 0, 1, vis)
        d = (t_c - vis).astype(jnp.float32)
        d = jnp.where(d < 0, d + _WRAP, d)
        # reference inlier rule Y > 0 <=> raw stamp > 0 <=> stamp1 not in
        # {0, 1}; vis == 0 was just remapped to 1, so != 1 covers both
        eli = (vis != 1) & (d < _HALF_WRAP)
        u = jnp.where(tch, jnp.float32(ox), -pxf)
        v = jnp.where(tch, jnp.float32(oy), -pyf)
        yv = d * neg_ts
        return d, eli, u, v, yv

    cand_offsets = [(a, b) for a in (-f, 0, f) for b in (-f, 0, f)]
    win_cells = [(wx, wy) for wx in range(-f, f + 1)
                 for wy in range(-f, f + 1)]

    inf = jnp.float32(jnp.inf)
    best_score = jnp.full((tr, H), inf, jnp.float32)
    b_detok = jnp.zeros((tr, H), jnp.int32)
    b_a = jnp.zeros((tr, H), jnp.float32)
    b_b = jnp.zeros((tr, H), jnp.float32)
    b_dtdp = jnp.zeros((tr, H), jnp.float32)
    b_inl = jnp.zeros((tr, H), jnp.int32)

    for (a, b) in cand_offsets:
        cells = [(a + wx, b + wy) for (wx, wy) in win_cells]
        # --- stats pass over the k x k window ---
        ssum = su = sv = suu = svv = suv = b0 = b1 = b2 = None
        for c in cells:
            d, eli, u, v, yv = cell(*c)
            if ssum is None:
                ssum, su, sv = d, u, v
                suu, svv, suv = u * u, v * v, u * v
                b0, b1, b2 = u * yv, v * yv, yv
            else:
                ssum = ssum + d
                su = su + u
                sv = sv + v
                suu = suu + u * u
                svv = svv + v * v
                suv = suv + u * v
                b0 = b0 + u * yv
                b1 = b1 + v * yv
                b2 = b2 + yv
        score = ssum / n
        # full-window in-bounds requirement (vFlow.cpp:889)
        vm = ((px + (a - f) >= 0) & (px + (a + f) <= W - 1)
              & (py + (b - f) >= 0) & (py + (b + f) <= H - 1))
        # --- closed-form 3x3 adjugate solve (vFlow.cpp:1307-1341) ---
        det = (suu * (svv * n - sv * sv)
               - suv * (suv * n - sv * su)
               + su * (suv * sv - svv * su))
        det_ok = det >= jnp.float32(cfg.det_threshold)
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
        # --- inlier pass (vFlow.cpp:1360-1366) ---
        inl = None
        for c in cells:
            _, eli, u, v, yv = cell(*c)
            hit = (jnp.abs(a_coef * u + b_coef * v - yv) < half) & eli
            inl = hit.astype(jnp.int32) if inl is None else inl + hit
        # --- fold into the running first-min winner ---
        scorem = jnp.where(vm, score, inf)
        better = scorem < best_score
        best_score = jnp.where(better, scorem, best_score)
        b_detok = jnp.where(better, det_ok.astype(jnp.int32), b_detok)
        b_a = jnp.where(better, a_coef, b_a)
        b_b = jnp.where(better, b_coef, b_b)
        b_dtdp = jnp.where(better, dtdp, b_dtdp)
        b_inl = jnp.where(better, inl, b_inl)

    local_ok = jnp.isfinite(best_score)
    accept = local_ok & (b_detok > 0) & (b_inl >= cfg.min_evts_on_plane)

    # the trig tail (velocity inversion + gate) runs in XLA after the
    # kernel: atan2 has no Mosaic TC lowering, and the dense path's exact
    # trig rounding behavior must be preserved (the vx != 0 validity gate
    # is sensitive to cos(atan2(...)) not being exactly 0)
    acc_ref[:] = accept.astype(jnp.int32)
    a_ref[:] = b_a
    b_ref[:] = b_b
    dtdp_ref[:] = b_dtdp


def _tile_rows(cfg: FlowConfig) -> int:
    """Row-band height per program: band temporaries must fit VMEM."""
    return 16 if cfg.height <= 512 else 8


@functools.partial(jax.jit, static_argnames=("cfg",))
def local_flow_pallas(t_pre, t_post, cfg: FlowConfig):
    """Pallas local plane-fit flow; same contract as dense_local_flow
    (stamp1-encoded surfaces, see state/surfaces.py)."""
    W, H = cfg.width, cfg.height
    R = cfg.support_radius
    tr = _tile_rows(cfg)
    grid = pl.cdiv(W, tr)
    # bottom padding covers the stencil halo, the ragged last band, and
    # the 8-row alignment of the per-program band load
    pad = ((R, grid * tr + _rup8(2 * R) - R - W), (R, R))
    args = (
        jnp.pad(t_pre, pad),
        jnp.pad(t_post, pad),
    )
    out_shape = [
        jax.ShapeDtypeStruct((W, H), jnp.int32),     # accept
        jax.ShapeDtypeStruct((W, H), jnp.float32),   # a coef
        jax.ShapeDtypeStruct((W, H), jnp.float32),   # b coef
        jax.ShapeDtypeStruct((W, H), jnp.float32),   # dtdp
    ]
    kern = functools.partial(_local_flow_kernel, cfg=cfg, tr=tr)
    acc, a_coef, b_coef, dtdp = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((tr, H), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 4,
        interpret=_interpret(),
    )(*args)

    # XLA trig tail - identical to ops/dense_flow.py's
    # (vFlow.cpp:1373-1377 velocity inversion, :315 validity gate)
    accept = acc > 0
    speed = 1.0 / dtdp
    angle = jnp.arctan2(a_coef, b_coef)
    raw_vx = jnp.where(accept, speed * jnp.cos(angle), 0.0)
    raw_vy = jnp.where(accept, speed * jnp.sin(angle), 0.0)
    gate_valid = (~jnp.isnan(raw_vx) & ~jnp.isnan(raw_vy)
                  & (raw_vx != 0) & (raw_vy != 0))
    length = jnp.sqrt(raw_vx * raw_vx + raw_vy * raw_vy)
    theta = jnp.arctan2(raw_vy, raw_vx)
    return raw_vx, raw_vy, gate_valid, length, theta


# --------------------------------------------------------------------------
# multi-scale aperture correction
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _step_matrices(cfg: FlowConfig):
    """Clamped step matrices realizing the padded integral image.

    PI[f] = Ax @ F[f] @ By^T gives, for every padded position (i, j),
    integ[clip(i - M, 0, W), clip(j - M, 0, y_clip)] - i.e. the prefix-sum
    lookup every corner read of every scale needs, clamping included
    (the y clamp honors cfg.replicate_y_clamp_quirk, vFlow.cpp:998-1000).
    """
    W, H, M = cfg.width, cfg.height, cfg.max_window
    XP, YP = W + 2 * M + 1, H + 2 * M + 1
    y_hi = (cfg.width if cfg.replicate_y_clamp_quirk else cfg.height) - 1
    y_clip = min(y_hi + 1, H)
    ax = (np.arange(W)[None, :]
          < np.clip(np.arange(XP) - M, 0, W)[:, None]).astype(np.float32)
    by = (np.arange(H)[None, :]
          < np.clip(np.arange(YP) - M, 0, y_clip)[:, None]).astype(np.float32)
    return jnp.asarray(ax), jnp.asarray(by)


def _integral_kernel(len_ref, vx_ref, vy_ref, ax_ref, by_ref, pi_ref):
    """Builds the 4-field clamp-padded integral image on the MXU."""
    fl = len_ref[:]
    fvx = vx_ref[:]
    fvy = vy_ref[:]
    g = (fl > 0).astype(jnp.float32)
    fields = (g, fl * g, fvx * g, fvy * g)
    ax = ax_ref[:]
    byt = by_ref[:].T
    hi = jax.lax.Precision.HIGHEST   # full-f32 MXU passes: the integral
    # magnitudes reach W*H*len and box sums difference them, so one-pass
    # bf16 (the Mosaic default) loses ~4e-3 relative - enough to flip
    # near-tie scale winners
    for fi, fld in enumerate(fields):
        t1 = jnp.dot(ax, fld, preferred_element_type=jnp.float32,
                     precision=hi)
        pi_ref[fi] = jnp.dot(t1, byt, preferred_element_type=jnp.float32,
                             precision=hi)


def _scales_kernel(pi_ref, vx_ref, vy_ref, tvx_ref, tvy_ref, scale_ref,
                   *, cfg: FlowConfig, tr: int):
    """One program scans all scales for a `tr`-row band (see local kernel
    for why bands: Mosaic stack-allocates every materialized temporary)."""
    W, H, M = cfg.width, cfg.height, cfg.max_window
    row0 = pl.program_id(0) * tr
    fvx = vx_ref[pl.ds(row0, tr), :]
    fvy = vy_ref[pl.ds(row0, tr), :]

    # aligned band load per field; corners become static vector slices
    bh = tr + _rup8(2 * M + 2)
    bands = [pi_ref[fi, pl.ds(row0, bh), :] for fi in range(4)]

    def corner(fi, sx, sy):
        return bands[fi][M + sx:M + sx + tr, M + sy:M + sy + H]

    best_ml = jnp.full((tr, H), -1.0, jnp.float32)
    best_vx = jnp.zeros((tr, H), jnp.float32)
    best_vy = jnp.zeros((tr, H), jnp.float32)
    best_s = jnp.zeros((tr, H), jnp.int32)
    for s in cfg.scales:
        box = [corner(fi, s + 1, s + 1) - corner(fi, -s, s + 1)
               - corner(fi, s + 1, -s) + corner(fi, -s, -s)
               for fi in range(4)]
        cnt = box[0]
        has = cnt > 0.5
        safe = jnp.where(has, cnt, 1.0)
        ml = jnp.where(has, box[1] / safe, 0.0)
        better = ml > best_ml                      # strict: first max wins
        best_ml = jnp.where(better, ml, best_ml)
        best_vx = jnp.where(better, box[2] / safe, best_vx)
        best_vy = jnp.where(better, box[3] / safe, best_vy)
        best_s = jnp.where(better, jnp.int32(s), best_s)

    pooled = best_ml > 0
    # fallback: center flow, scale 0 (vFlow.cpp:1086-1094)
    tvx_ref[:] = jnp.where(pooled, best_vx, fvx)
    tvy_ref[:] = jnp.where(pooled, best_vy, fvy)
    scale_ref[:] = jnp.where(pooled, best_s, 0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def aperture_pallas(flow_len, flow_vx, flow_vy, cfg: FlowConfig):
    """Pallas multi-scale aperture pooling; same contract as dense_aperture.

    Two kernels: the integral image (MXU matmuls, single block), then the
    per-scale box sums + first-max winner over row bands. The freshness
    (KILL_OLD_FLOW_TIME) gate is applied upstream by state.kill_stale_flow
    exactly as for the jnp paths.
    """
    W, H, M = cfg.width, cfg.height, cfg.max_window
    XP, YP = W + 2 * M + 1, H + 2 * M + 1
    ax, by = _step_matrices(cfg)
    interp = _interpret()
    pi = pl.pallas_call(
        _integral_kernel,
        out_shape=jax.ShapeDtypeStruct((4, XP, YP), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interp,
    )(flow_len, flow_vx, flow_vy, ax, by)

    tr = _tile_rows(cfg)
    grid = pl.cdiv(W, tr)
    out_shape = [
        jax.ShapeDtypeStruct((W, H), jnp.float32),   # true_vx
        jax.ShapeDtypeStruct((W, H), jnp.float32),   # true_vy
        jax.ShapeDtypeStruct((W, H), jnp.int32),     # scale
    ]
    # the (aligned, possibly ragged) last band reads PI rows past XP-1
    extra = grid * tr + _rup8(2 * M + 2) - XP
    if extra > 0:
        pi = jnp.pad(pi, ((0, 0), (0, extra), (0, 0)), mode="edge")
    if grid * tr > W:
        flow_vx = jnp.pad(flow_vx, ((0, grid * tr - W), (0, 0)))
        flow_vy = jnp.pad(flow_vy, ((0, grid * tr - W), (0, 0)))
    kern = functools.partial(_scales_kernel, cfg=cfg, tr=tr)
    return tuple(pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((tr, H), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        interpret=interp,
    )(pi, flow_vx, flow_vy))
