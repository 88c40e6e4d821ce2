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

* Both kernels are *gridded over row bands* and stream their stencil
  support through VMEM with explicit DMA: the surfaces / integral image
  stay in HBM (memory_space=ANY) and each program async-copies exactly the
  `band + halo` rows it needs into a VMEM scratch buffer. Nothing is ever
  whole-sensor resident, so the kernels support arbitrary sensor
  geometries (320x320 through 1280x720 and beyond) - the former
  single-block formulation capped out at ~200K cells of VMEM.

* Local flow: per-candidate statistics are *recomputed* cell by cell
  instead of precomputing the (2R+1)^2 per-offset maps. The recompute is
  pure VPU work (~20 ops per cell) and keeps peak VMEM at a handful of
  band-height arrays; materializing the per-offset maps would need
  25 x 10 maps (> VMEM at any useful band height).

* Aperture: the clamp-padded integral image PI is built by XLA (f32
  cumsum + edge-mode pad baking in the reference's window clamping,
  including the y-clamped-by-width quirk toggle) - bit-identical to the
  dense path's integral - and lives in HBM. The Pallas kernel then DMAs
  a (4, band+2M+2, YP) slab per program and evaluates every scale's box
  sum as 4 static vector slices of the slab, folding scales into a
  running first-max winner. This replaces the dense path's 44 HBM-round-
  tripped corner arrays per chunk with one streamed read of PI.

On CPU (tests / forced host platform) the kernels run in interpreter mode.
`*_supported(cfg)` gates derive a per-program VMEM estimate (scratch +
measured Mosaic temporary footprint) and compare it against the 16 MB
VMEM budget; geometries that exceed it fall back to the XLA dense path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from farms_tpu.config import FlowConfig

# plain Python floats: jnp scalars would be captured as constants by the
# kernel tracer, which pallas_call rejects
_WRAP = float(2.0 ** 32)
_HALF_WRAP = float(2.0 ** 31)

# per-core VMEM is ~16 MB; leave headroom for Mosaic's own buffers
_VMEM_BUDGET = 13 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rup8(x: int) -> int:
    return -(-x // 8) * 8


def _rup128(x: int) -> int:
    """DMA'd slabs must span a lane-aligned (128) extent."""
    return -(-x // 128) * 128


def _local_tile_rows(cfg: FlowConfig, n_chain: int | None = None) -> int:
    """Largest band height whose local-kernel VMEM estimate fits."""
    for tr in (16, 8):
        if _local_vmem_bytes(cfg, tr, n_chain) <= _VMEM_BUDGET:
            return tr
    return 8


def _aperture_tile_rows(cfg: FlowConfig) -> int:
    for tr in (16, 8):
        if _aperture_vmem_bytes(cfg, tr) <= _VMEM_BUDGET:
            return tr
    return 8


def _local_vmem_bytes(cfg: FlowConfig, tr: int,
                      n_chain: int | None = None) -> int:
    """Per-program VMEM estimate for the local-flow kernel.

    Scratch: two int32 (band+halo, H+2R) surface slabs. Temporaries:
    Mosaic stack-allocates materialized values with partial reuse;
    measured ~110 MB for a whole-sensor 320x320/k=3 block, i.e. ~29
    live (rows, H) f32 arrays per k*k window cell. The k=3 cached
    variant (_local_flow_kernel_cached) instead holds 10 quantity maps
    per support offset plus the 81 candidate box sums and fold/inlier
    live values (~420 band maps). Outputs: 5 blocked (tr, H) buffers,
    double-buffered by the pipeline.
    """
    R = cfg.support_radius
    bh = tr + _rup8(2 * R)
    if n_chain is None:
        n_chain = cfg.causal_snapshots
    scratch = (1 + n_chain) * bh * (cfg.height + 2 * R) * 4
    # the per-offset causal fold materializes ~2 live band values per
    # extra chain entry (measured: a 65-entry chain overflowed scoped
    # VMEM by ~1 MB at tr=8 where this estimate said it fit)
    scratch += max(0, n_chain - 1) * 2 * tr * cfg.height * 4
    if cfg.filter_size in (3, 5):
        temps = (10 * (2 * R + 1) ** 2 + 170) * tr * cfg.height * 4
    else:
        temps = 29 * cfg.filter_size ** 2 * tr * cfg.height * 4
    outs = 2 * 5 * tr * cfg.height * 4
    return scratch + temps + outs


def _aperture_vmem_bytes(cfg: FlowConfig, tr: int) -> int:
    """Per-program VMEM estimate for the scales kernel.

    Scratch: the (4, band+2M+2, YP) f32 PI slab. Temporaries: per scale,
    16 corner slices + ~14 arithmetic/fold arrays of (tr, H) f32.
    """
    M = cfg.max_window
    bh = tr + _rup8(2 * M + 2)
    yp = cfg.height + 2 * M + 1
    scratch = 4 * bh * yp * 4
    temps = 30 * cfg.num_scales * tr * cfg.height * 4
    ins_outs = 2 * 5 * tr * cfg.height * 4
    return scratch + temps + ins_outs


def _unpadded(cfg: FlowConfig) -> bool:
    # micro_step's auto mode only picks the kernels for unpadded
    # geometries: padded configs belong to sharded engines, where a
    # pallas_call inside the GSPMD-partitioned step would force a gather.
    # The explicit halo engine (parallel/halo.py) instead calls the
    # kernels per shard inside shard_map with `halo`/`row_offset` args,
    # gated by the VMEM-only checks below.
    return cfg.padded_width is None and cfg.padded_height is None


def local_flow_vmem_ok(cfg: FlowConfig) -> bool:
    return _local_vmem_bytes(cfg, _local_tile_rows(cfg)) <= _VMEM_BUDGET


def aperture_vmem_ok(cfg: FlowConfig) -> bool:
    return _aperture_vmem_bytes(cfg, _aperture_tile_rows(cfg)) <= _VMEM_BUDGET


def local_flow_supported(cfg: FlowConfig) -> bool:
    return _unpadded(cfg) and local_flow_vmem_ok(cfg)


def local_flow_chain_ok(cfg: FlowConfig, n_chain: int) -> bool:
    """VMEM gate for a correction pass with an `n_chain`-surface fold."""
    return _local_vmem_bytes(cfg, _local_tile_rows(cfg, n_chain),
                             n_chain) <= _VMEM_BUDGET


def aperture_supported(cfg: FlowConfig) -> bool:
    return _unpadded(cfg) and aperture_vmem_ok(cfg)


# --------------------------------------------------------------------------
# local plane-fit flow
# --------------------------------------------------------------------------

def _local_flow_kernel(off_ref, tq_hbm, tp_hbm,
                       acc_ref, a_ref, b_ref, dtdp_ref, cand_ref,
                       bq_ref, bp_ref, sem,
                       *, cfg: FlowConfig, tr: int, Ha: int, S: int = 1,
                       inc_center: bool = True):
    """One program computes a `tr`-row band of the sensor (or shard).

    The padded surfaces stay in HBM; the program DMAs its
    `tr + rup8(2R)`-row slab into VMEM scratch, then evaluates the
    9-candidate stencil as static vector slices of the slab. VMEM
    temporaries are band-sized - Mosaic allocates every materialized
    value on a stack with limited reuse, and whole-sensor temporaries
    overflow the 16 MB VMEM (measured: ~110 MB for 320x320 single-block).

    `off_ref` (SMEM) holds the global row of the band's first core row -
    nonzero for sharded-tile callers (parallel/halo.py), where border
    rules must use global coordinates. `Ha` is the array lane extent
    (>= cfg.height when padded); semantic border masks always use the
    cfg.width/height sensor bounds, so pad rows/lanes never validate.
    """
    W, H = cfg.width, cfg.height
    f = cfg.f_rad
    R = cfg.support_radius
    k = cfg.filter_size
    n = jnp.float32(k * k)
    row0 = pl.program_id(0) * tr
    bh = tr + _rup8(2 * R)

    cpq = pltpu.make_async_copy(tq_hbm.at[:, pl.ds(row0, bh), :], bq_ref,
                                sem.at[0])
    cpp = pltpu.make_async_copy(tp_hbm.at[pl.ds(row0, bh), :], bp_ref,
                                sem.at[1])
    cpq.start()
    cpp.start()
    cpq.wait()
    cpp.wait()
    band_qs = [bq_ref[si] for si in range(S)]   # snapshot chain, oldest first
    band_p = bp_ref[:]

    t_c = band_p[R:R + tr, R:R + Ha]                   # i32 center stamps
    px = (jax.lax.broadcasted_iota(jnp.int32, (tr, Ha), 0) + row0
          + off_ref[0])
    py = jax.lax.broadcasted_iota(jnp.int32, (tr, Ha), 1)
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    neg_ts = jnp.float32(-cfg.ts_to_sec)

    def cell(ox: int, oy: int):
        """Causal view of the neighbor at static offset (ox, oy).

        Returns (d, eli, u, v, yv) exactly as ops/dense_flow.py computes
        its D/ELI/U/V/YV per-offset maps, evaluated on the fly.
        """
        if ox == 0 and oy == 0:
            zero = jnp.zeros((tr, Ha), jnp.float32)
            # eligibility: stamp1 not in {0, 1} - unsigned-domain test
            # (stamp1 wraps negative past 2^31), see ops/dense_flow.py
            return (zero, (t_c != 0) & (t_c != 1), zero, zero, zero)
        rs = slice(R + ox, R + ox + tr)
        cs = slice(R + oy, R + oy + Ha)
        # newest snapshot value not in the center's future, folded over
        # the chain (order stamp1 (uint32-in-int32) values via the int32
        # difference, exact mod-2^32; a direct signed compare breaks
        # past 2^31). With a separate center surface (correction mode,
        # inc_center=False) the stacked chain already ends at t_post and
        # band_p holds only the centers.
        chain = band_qs + ([band_p] if inc_center else [])
        vis = chain[0][rs, cs]
        for sb in chain[1:]:
            v = sb[rs, cs]
            vis = jnp.where((t_c - v) >= 0, v, vis)
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
    best_score = jnp.full((tr, Ha), inf, jnp.float32)
    b_detok = jnp.zeros((tr, Ha), jnp.int32)
    b_a = jnp.zeros((tr, Ha), jnp.float32)
    b_b = jnp.zeros((tr, Ha), jnp.float32)
    b_dtdp = jnp.zeros((tr, Ha), jnp.float32)
    b_inl = jnp.zeros((tr, Ha), jnp.int32)
    b_cand = jnp.zeros((tr, Ha), jnp.int32)

    for ci, (a, b) in enumerate(cand_offsets):
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
        b_cand = jnp.where(better, jnp.int32(ci), b_cand)

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
    # winning candidate index (scan order): selection diagnostic for the
    # exact-equivalence tests; one extra band-sized i32 write
    cand_ref[:] = jnp.where(local_ok, b_cand, -1)


@functools.partial(jax.jit, static_argnames=("cfg", "halo", "want_ids"))
def local_flow_pallas(t_pre, t_post, cfg: FlowConfig, *,
                      halo: int = 0, row_offset=0, want_ids: bool = False,
                      t_center=None):
    """Pallas local plane-fit flow; same contract as dense_local_flow
    (stamp1-encoded surfaces, see state/surfaces.py).

    Sharded-tile mode (parallel/halo.py): with `halo` >= support_radius
    the inputs carry `halo` exchanged neighbor rows on each side (zeros
    past the global sensor edge), outputs cover only the core rows, and
    `row_offset` (possibly traced: the shard's global first row) keeps
    coordinates and border checks global - the exact contract of
    ops/dense_flow.py's halo mode.
    """
    R = cfg.support_radius
    if halo and halo < R:
        raise ValueError(f"halo {halo} < support_radius {R}")
    # multi-snapshot causal visibility: t_pre may be a tuple of
    # intra-batch boundary surfaces (oldest first, ops/dense_flow.py);
    # they ship to the kernel as one stacked [S, rows, lanes] input.
    # Correction mode (t_center given, see dense_local_flow): the chain
    # stack additionally carries t_post and the center slot ships the
    # separate center surface instead.
    snaps = tuple(t_pre) if isinstance(t_pre, (tuple, list)) else (t_pre,)
    inc_center = t_center is None
    center = t_post
    if not inc_center:
        snaps = snaps + (t_post,)
        center = t_center
    S = len(snaps)
    rows = t_post.shape[0] - 2 * halo    # core rows this call computes
    Ha = t_post.shape[1]                 # array lane extent (>= height)
    tr = _local_tile_rows(cfg, S)
    grid = pl.cdiv(rows, tr)
    bh = tr + _rup8(2 * R)
    # bottom padding covers the stencil halo, the ragged last band, and
    # the 8-row alignment of the per-program slab DMA; lanes pad to 128
    hp = _rup128(Ha + 2 * R)
    T = grid * tr + _rup8(2 * R)         # total padded row extent

    def prep(a):
        if halo:
            # keep exactly R of the exchanged halo on each side, then the
            # same bottom/lane alignment pads as the unpadded layout
            a = a[halo - R:halo - R + rows + 2 * R]
            return jnp.pad(a, ((0, T - rows - 2 * R), (R, hp - R - Ha)))
        return jnp.pad(a, ((R, T - R - rows), (R, hp - R - Ha)))

    off = jnp.asarray([row_offset], dtype=jnp.int32)
    pre_stack = jnp.stack([prep(a) for a in snaps], axis=0)
    out_shape = [
        jax.ShapeDtypeStruct((rows, Ha), jnp.int32),     # accept
        jax.ShapeDtypeStruct((rows, Ha), jnp.float32),   # a coef
        jax.ShapeDtypeStruct((rows, Ha), jnp.float32),   # b coef
        jax.ShapeDtypeStruct((rows, Ha), jnp.float32),   # dtdp
        jax.ShapeDtypeStruct((rows, Ha), jnp.int32),     # candidate id
    ]
    kern_fn = (_local_flow_kernel_cached if cfg.filter_size in (3, 5)
               else _local_flow_kernel)
    kern = functools.partial(kern_fn, cfg=cfg, tr=tr, Ha=Ha, S=S,
                             inc_center=inc_center)
    acc, a_coef, b_coef, dtdp, cand = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec((tr, Ha), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[
            pltpu.VMEM((S, bh, hp), jnp.int32),
            pltpu.VMEM((bh, hp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(off, pre_stack, prep(center))

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
    if want_ids:
        return raw_vx, raw_vy, gate_valid, length, theta, cand
    return raw_vx, raw_vy, gate_valid, length, theta


def _local_flow_kernel_cached(off_ref, tq_hbm, tp_hbm,
                              acc_ref, a_ref, b_ref, dtdp_ref, cand_ref,
                              bq_ref, bp_ref, sem,
                              *, cfg: FlowConfig, tr: int, Ha: int,
                              S: int = 1, inc_center: bool = True):
    """k=3 variant of _local_flow_kernel with cached per-offset maps.

    The general kernel recomputes each support cell's quantities at
    every visit (81 stats visits + 81 inlier visits across 25 offsets
    for k=3) - ~210 us per 320x320 pass, the dominant per-sub-phase cost
    (scripts/_prof_phases.py). This variant:

    * computes the 10 per-offset quantity maps (d, eli, u, v, yv and the
      four products the normal equations need) ONCE per offset and keeps
      them in VMEM (10 x 25 band maps, ~3 MB at tr=8);
    * shares column sums across candidates: the 9 candidate windows are
      box sums at stride f of the same quantity maps, so each quantity
      needs 15 column sums + 9 short row sums instead of 81 cell adds;
    * runs the inlier count once with the WINNING candidate's
      coefficients (hit maps over the 25 offsets + the same box-sum
      trick + a select by candidate id) instead of once per candidate -
      the per-candidate fold keeps only the winner's count anyway.

    Summation tree association differs from the dense path's left fold,
    so scores can drift by an fp ulp - covered by the equivalence tests'
    near-tie mask, exactly like FMA contraction drift. Selection order,
    penalties, gates and the atan2 tail are identical.
    """
    W, H = cfg.width, cfg.height
    f = cfg.f_rad
    R = cfg.support_radius
    k = cfg.filter_size
    n = jnp.float32(k * k)
    row0 = pl.program_id(0) * tr
    bh = tr + _rup8(2 * R)

    cpq = pltpu.make_async_copy(tq_hbm.at[:, pl.ds(row0, bh), :], bq_ref,
                                sem.at[0])
    cpp = pltpu.make_async_copy(tp_hbm.at[pl.ds(row0, bh), :], bp_ref,
                                sem.at[1])
    cpq.start()
    cpp.start()
    cpq.wait()
    cpp.wait()
    band_qs = [bq_ref[si] for si in range(S)]   # snapshot chain, oldest first
    band_p = bp_ref[:]

    t_c = band_p[R:R + tr, R:R + Ha]
    px = (jax.lax.broadcasted_iota(jnp.int32, (tr, Ha), 0) + row0
          + off_ref[0])
    py = jax.lax.broadcasted_iota(jnp.int32, (tr, Ha), 1)
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    neg_ts = jnp.float32(-cfg.ts_to_sec)

    # ---- per-offset quantity maps, computed once (see base kernel's
    # cell() for the semantics of every line) ----
    offs = range(-R, R + 1)
    Q = {}
    for ox in offs:
        for oy in offs:
            if ox == 0 and oy == 0:
                zero = jnp.zeros((tr, Ha), jnp.float32)
                d, eli = zero, (t_c != 0) & (t_c != 1)
                u, v, yv = zero, zero, zero
            else:
                rs = slice(R + ox, R + ox + tr)
                cs = slice(R + oy, R + oy + Ha)
                chain = band_qs + ([band_p] if inc_center else [])
                vis = chain[0][rs, cs]
                for sb in chain[1:]:
                    v = sb[rs, cs]
                    vis = jnp.where((t_c - v) >= 0, v, vis)
                tch = vis != 0
                vis = jnp.where(vis == 0, 1, vis)
                d = (t_c - vis).astype(jnp.float32)
                d = jnp.where(d < 0, d + _WRAP, d)
                eli = (vis != 1) & (d < _HALF_WRAP)
                u = jnp.where(tch, jnp.float32(ox), -pxf)
                v = jnp.where(tch, jnp.float32(oy), -pyf)
                yv = d * neg_ts
            Q[(ox, oy)] = (d, eli, u, v, yv,
                           u * u, v * v, u * v, u * yv, v * yv)

    NQ = 10   # d, (eli unused in sums), u, v, yv, uu, vv, uv, uyv, vyv
    SUM_IDX = (0, 2, 3, 4, 5, 6, 7, 8, 9)   # all but eli

    cand_offsets = [(a, b) for a in (-f, 0, f) for b in (-f, 0, f)]
    wr = range(-f, f + 1)

    inf = jnp.float32(jnp.inf)
    best_score = jnp.full((tr, Ha), inf, jnp.float32)
    b_cand = jnp.zeros((tr, Ha), jnp.int32)

    def box_sums(qidx):
        """All 9 candidate-window sums of quantity channels `qidx`.

        Returns {cand_id: [sums in qidx order]} via shared column sums:
        colsum(ox, b) = sum over the window's wy of Q[(ox, b+wy)]."""
        out = {}
        for b in (-f, 0, f):
            col = {}
            for ox in offs:
                acc = [Q[(ox, b - f)][qi] for qi in qidx]
                for wy in range(-f + 1, f + 1):
                    cell = Q[(ox, b + wy)]
                    acc = [s + cell[qi] for s, qi in zip(acc, qidx)]
                col[ox] = acc
            for a in (-f, 0, f):
                sums = list(col[a - f])
                for wx in range(-f + 1, f + 1):
                    sums = [s + q for s, q in zip(sums, col[a + wx])]
                out[cand_offsets.index((a, b))] = sums
        return out

    # ---- pass 1: scores only -> first-min winner (scan order) ----
    dsums = box_sums((0,))
    for ci, (a, b) in enumerate(cand_offsets):
        score = dsums[ci][0] / n
        vm = ((px + (a - f) >= 0) & (px + (a + f) <= W - 1)
              & (py + (b - f) >= 0) & (py + (b + f) <= H - 1))
        scorem = jnp.where(vm, score, inf)
        better = scorem < best_score
        best_score = jnp.where(better, scorem, best_score)
        b_cand = jnp.where(better, jnp.int32(ci), b_cand)

    # ---- pass 2: the WINNER's normal-equation sums only, then ONE
    # solve. The per-candidate solve was 9 adjugate solves per pixel of
    # which the fold kept one; selecting the winner's sums first (the
    # same column sums, same accumulation order - bitwise-identical
    # values) removes 8 of them (~15% of the kernel's VPU work). ----
    ia = b_cand // 3                       # winner a index (cand = ia*3+ib)
    ib = b_cand - ia * 3

    def winner_sum(qi):
        rs = []
        for ax, a in enumerate((-f, 0, f)):
            # column sums selected by the winner's window-b position
            csel = {}
            for ox in range(a - f, a + f + 1):
                vals = []
                for b in (-f, 0, f):
                    acc = Q[(ox, b - f)][qi]
                    for wy in range(-f + 1, f + 1):
                        acc = acc + Q[(ox, b + wy)][qi]
                    vals.append(acc)
                v = vals[0]
                v = jnp.where(ib == 1, vals[1], v)
                v = jnp.where(ib == 2, vals[2], v)
                csel[ox] = v
            acc = csel[a - f]
            for wx in range(-f + 1, f + 1):
                acc = acc + csel[a + wx]
            rs.append(acc)
        v = rs[0]
        v = jnp.where(ia == 1, rs[1], v)
        v = jnp.where(ia == 2, rs[2], v)
        return v

    su, sv, syv, suu, svv, suv, b0, b1 = [winner_sum(qi)
                                          for qi in SUM_IDX[1:]]
    b2 = syv     # (b2 is the yv sum; keep the dense path's naming)
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
    b_a = (adj00 * b0 + adj01 * b1 + adj02 * b2) / safe
    b_b = (adj01 * b0 + adj11 * b1 + adj12 * b2) / safe
    b_dtdp = jnp.sqrt(b_a * b_a + b_b * b_b)
    b_detok = det_ok.astype(jnp.int32)

    # ---- single inlier pass with the winner's plane ----
    half = b_dtdp * 0.5
    for ox in offs:
        for oy in offs:
            d, eli, u, v, yv = Q[(ox, oy)][:5]
            hit = ((jnp.abs(b_a * u + b_b * v - yv) < half)
                   & eli).astype(jnp.float32)
            Q[(ox, oy)] = (hit,)
    hits9 = box_sums((0,))
    b_inl = jnp.zeros((tr, Ha), jnp.float32)
    for ci in range(len(cand_offsets)):
        b_inl = jnp.where(b_cand == ci, hits9[ci][0], b_inl)

    local_ok = jnp.isfinite(best_score)
    # 0/1 sums of <= k*k terms are exact in f32
    accept = (local_ok & (b_detok > 0)
              & (b_inl >= jnp.float32(cfg.min_evts_on_plane)))

    acc_ref[:] = accept.astype(jnp.int32)
    a_ref[:] = b_a
    b_ref[:] = b_b
    dtdp_ref[:] = b_dtdp
    cand_ref[:] = jnp.where(local_ok, b_cand, -1)


# --------------------------------------------------------------------------
# multi-scale aperture correction
# --------------------------------------------------------------------------

def _scales_kernel(pi_hbm, vx_ref, vy_ref, tvx_ref, tvy_ref, scale_ref,
                   band_ref, sem, *, cfg: FlowConfig, tr: int, Ha: int):
    """One program scans all scales for a `tr`-row band.

    The clamp-padded integral image stays in HBM; the program DMAs its
    (4, tr + rup8(2M+2), YP) slab into VMEM scratch, then every scale's
    box sum is 4 static vector slices of the slab (see local kernel for
    why bands: Mosaic stack-allocates every materialized temporary).
    `Ha` is the array lane extent (>= cfg.height when padded). The kernel
    needs no coordinates at all: window clamping is baked into PI by the
    wrapper (edge pads for clamped reads in unpadded mode; zero fields
    past the global edge in halo mode).
    """
    M = cfg.max_window
    row0 = pl.program_id(0) * tr
    bh = tr + _rup8(2 * M + 2)

    cp = pltpu.make_async_copy(pi_hbm.at[:, pl.ds(row0, bh), :], band_ref,
                               sem)
    cp.start()
    fvx = vx_ref[:]
    fvy = vy_ref[:]
    cp.wait()
    bands = [band_ref[fi] for fi in range(4)]

    def corner(fi, sx, sy):
        return bands[fi][M + sx:M + sx + tr, M + sy:M + sy + Ha]

    best_ml = jnp.full((tr, Ha), -1.0, jnp.float32)
    best_vx = jnp.zeros((tr, Ha), jnp.float32)
    best_vy = jnp.zeros((tr, Ha), jnp.float32)
    best_s = jnp.zeros((tr, Ha), jnp.int32)
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


@functools.partial(jax.jit, static_argnames=("cfg", "halo"))
def aperture_pallas(flow_len, flow_vx, flow_vy, cfg: FlowConfig, *,
                    halo: int = 0, integ=None):
    """Pallas multi-scale aperture pooling; same contract as dense_aperture.

    XLA builds the clamp-padded integral image PI (f32 cumsum, bitwise
    identical to the dense path's, with the reference's window clamping -
    including the y-clamped-by-width quirk, vFlow.cpp:998-1000 - baked in
    via an edge-mode pad); the Pallas kernel then streams PI through VMEM
    in row slabs and folds the per-scale box sums into a first-max winner.
    The freshness (KILL_OLD_FLOW_TIME) gate is applied upstream by
    state.kill_stale_flow exactly as for the jnp paths.

    Sharded-tile mode (parallel/halo.py): with `halo` >= max_window the
    inputs carry exchanged neighbor rows (zero fields past the global
    edge contribute nothing to box sums, which is exactly what the
    reference's x clamping computes - ops/dense_flow.py halo mode), so
    the x axis of PI is a plain slice of the extended integral instead of
    a clamp pad; outputs cover only the core rows.
    """
    W, H, M = cfg.width, cfg.height, cfg.max_window
    if halo and halo < M:
        raise ValueError(f"halo {halo} < max_window {M}")
    Ha = flow_len.shape[1]
    if integ is not None:
        # pre-assembled integral band (partial-pooling halo mode,
        # parallel/halo.py): [4, rows+2*halo+1, Ha+1]; flow_* are then
        # core-only (used for the center fallback). Any per-column
        # constant offset cancels in the corner differences.
        rows = integ.shape[1] - 2 * halo - 1
    else:
        rows = flow_len.shape[0] - 2 * halo

        # PI[f, i, j] = integ[f, clip(i - M, 0, W), clip(j - M, 0, y_clip)]:
        # the prefix-sum lookup every corner read of every scale needs,
        # clamping included (x clamp realized by zero halo fields in halo
        # mode)
        gate = (flow_len > 0).astype(jnp.float32)
        fields = jnp.stack(
            [gate, flow_len * gate, flow_vx * gate, flow_vy * gate], 0)
        integ = jnp.pad(jnp.cumsum(jnp.cumsum(fields, axis=1), axis=2),
                        ((0, 0), (1, 0), (1, 0)))    # [4, rows+2*halo+1, Ha+1]
    y_hi = (W if cfg.replicate_y_clamp_quirk else H) - 1
    y_clip = min(y_hi + 1, Ha)
    integ = integ[:, :, :y_clip + 1]

    tr = _aperture_tile_rows(cfg)
    grid = pl.cdiv(rows, tr)
    bh = tr + _rup8(2 * M + 2)
    ypp = _rup128(Ha + 2 * M + 1)
    if halo:
        # core row r, corner shift sx in [-M, M+1] reads integ row
        # halo + r + sx; arranging PI so the kernel's [M + sx + r] lookup
        # lands there means dropping the first halo - M integral rows
        pi = integ[:, halo - M:halo - M + rows + 2 * M + 2]
        x_extra = grid * tr + bh - pi.shape[1]
        pi = jnp.pad(pi, ((0, 0), (0, max(0, x_extra)),
                          (M, ypp - M - (y_clip + 1))), mode="edge")
        if flow_vx.shape[0] == rows + 2 * halo:   # core-only when a
            core = slice(halo, halo + rows)        # band was supplied
            flow_vx = flow_vx[core]
            flow_vy = flow_vy[core]
    else:
        XP = rows + 2 * M + 1
        # the (aligned, possibly ragged) last slab reads PI rows past XP-1
        x_extra = max(0, grid * tr + bh - XP)
        pi = jnp.pad(integ,
                     ((0, 0), (M, M + x_extra), (M, ypp - M - (y_clip + 1))),
                     mode="edge")                   # [4, XP+x_extra, ypp]

    if grid * tr > rows:
        flow_vx = jnp.pad(flow_vx, ((0, grid * tr - rows), (0, 0)))
        flow_vy = jnp.pad(flow_vy, ((0, grid * tr - rows), (0, 0)))
    out_shape = [
        jax.ShapeDtypeStruct((rows, Ha), jnp.float32),   # true_vx
        jax.ShapeDtypeStruct((rows, Ha), jnp.float32),   # true_vy
        jax.ShapeDtypeStruct((rows, Ha), jnp.int32),     # scale
    ]
    kern = functools.partial(_scales_kernel, cfg=cfg, tr=tr, Ha=Ha)
    row_spec = pl.BlockSpec((tr, Ha), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return tuple(pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), row_spec, row_spec],
        out_specs=[row_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((4, bh, ypp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(pi, flow_vx, flow_vy))
