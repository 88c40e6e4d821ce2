"""Explicit halo-exchange spatial sharding via shard_map + ppermute.

The hand-scheduled counterpart of parallel/tiling.py (which leaves halo
insertion to the GSPMD partitioner): each device owns a contiguous band of
sensor rows, and the two stencil stages receive exactly the neighbor rows
they need as explicit `lax.ppermute` ring exchanges over ICI -

- the plane-fit stage reads a `support_radius`-deep band of the time
  surfaces (reference gathers reach +-2*f_rad, vFlow.cpp:870-884), and
- the aperture stage reads a `max_window + 1`-deep band of the flow
  surfaces (pooling reaches +-max_window, vFlow.cpp:987; +1 for the
  integral-image corner).

Zero-filled bands past the global sensor edge reproduce the reference's
window clamping exactly (zero fields contribute nothing to box sums, and
stamp1 == 0 means "never written"; see ops/dense_flow.py halo mode).

This is SURVEY.md section 7 step 4: surface state sharded P('tx', None),
border bands exchanged over ICI, per-event outputs combined with a psum.
Compared to the GSPMD path, the collectives here are deterministic and
minimal: two band exchanges per micro-step regardless of how XLA chooses
to partition the stencils.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch
from farms_tpu.ops.dense_flow import dense_aperture, dense_local_flow, onehot_gather
from farms_tpu.ops.pallas import kernels as pallas_kernels
from farms_tpu.pipeline.engine import FlowEngine, wire_maps, wire_pack
from farms_tpu.state.surfaces import SurfaceState


def exchange_halo(arr, h: int, n: int, axis_name: str = "tx"):
    """Extend a [rows, H] shard with h rows from each side of the ring.

    Returns [rows + 2h, H]; bands past the global sensor edge (device 0's
    top, device n-1's bottom) are zero-filled, which both stencil stages
    interpret as "outside the sensor" (ops/dense_flow.py halo mode).

    The band may span several neighbor shards (h > rows, e.g. 8 shards of
    a 320-row sensor with max_window=50): hop j fetches the needed rows
    from the shard j positions away with a distance-j ppermute, so each
    side costs ceil(h / rows) exchanges.
    """
    if h == 0:
        return arr
    if n == 1:
        return jnp.pad(arr, ((h, h), (0, 0)))
    rows = arr.shape[0]
    idx = jax.lax.axis_index(axis_name)
    hops = -(-h // rows)
    above = []   # assembled top-to-bottom: farthest hop first
    below = []
    for j in range(1, hops + 1):
        take = min(rows, h - (j - 1) * rows)   # rows needed at distance j
        fwd = [(i, (i + j) % n) for i in range(n)]
        bwd = [(i, (i - j) % n) for i in range(n)]
        # bottom `take` rows of shard idx-j sit immediately above the
        # already-assembled band; top `take` rows of idx+j likewise below
        from_prev = jax.lax.ppermute(arr[rows - take:], axis_name, fwd)
        from_next = jax.lax.ppermute(arr[:take], axis_name, bwd)
        from_prev = jnp.where(idx < j, jnp.zeros_like(from_prev), from_prev)
        from_next = jnp.where(idx >= n - j, jnp.zeros_like(from_next),
                              from_next)
        above.insert(0, from_prev)
        below.append(from_next)
    return jnp.concatenate(above + [arr] + below, axis=0)


def assemble_integral_band(flow_len, flow_vx, flow_vy, cfg: FlowConfig,
                           n: int, A: int, axis_name: str = "tx"):
    """Cross-tile aperture pooling partials (VERDICT.md r3 item 3).

    Exchanging raw flow-surface bands makes every shard REBUILD the
    integral image over `2A` replicated halo rows - a by-construction
    replication ceiling well under the scaling target. Box sums are
    linear, so shards can instead exchange *integral partials*:

    1. each shard integrates ONLY its own rows (local 2-D prefix L);
    2. the per-shard total row (column sums, a [4, Ha+1] vector) is
       all-gathered - ~n*Ha*16 bytes, negligible - giving every shard
       the absolute offset C_k of any shard's local integral, plus the
       global total T for the bottom clamp;
    3. the halo bands carry L rows (one ppermute per ring hop, exactly
       like exchange_halo), adjusted to global values by adding the
       source shard's offset; rows past the global top are 0, rows past
       the bottom replicate T (the reference's x clamp).

    The result is a [4, rows + 2A + 1, Ha+1] global-integral band the
    pooling stage consumes directly (dense_aperture / aperture_pallas
    `integ=`): no integral work is ever repeated across shards, so the
    aperture stage's parallel efficiency ceiling is ~1.
    """
    rows = flow_len.shape[0]
    gate = (flow_len > 0).astype(jnp.float32)
    fields = jnp.stack(
        [gate, flow_len * gate, flow_vx * gate, flow_vy * gate], 0)
    L = jnp.pad(jnp.cumsum(jnp.cumsum(fields, axis=1), axis=2),
                ((0, 0), (1, 0), (1, 0)))            # [4, rows+1, Ha+1]
    if n == 1:
        top = jnp.zeros((4, A, L.shape[2]), L.dtype)
        bot = jnp.broadcast_to(L[:, -1:, :], (4, A, L.shape[2]))
        return jnp.concatenate([top, L, bot], axis=1)

    cs = L[:, -1, :]                                 # [4, Ha+1]
    allcs = jax.lax.all_gather(cs, axis_name)        # [n, 4, Ha+1]
    idx = jax.lax.axis_index(axis_name)
    ar = jnp.arange(n)[:, None, None]

    def offset(src):                                 # C_src [4, Ha+1]
        return jnp.sum(jnp.where(ar < src, allcs, 0.0), axis=0)

    total = jnp.sum(allcs, axis=0)                   # T = I[W] row
    own = offset(idx)[:, None, :] + L                # gi in [row0, row0+rows]

    hops = -(-A // rows)
    above, below = [], []
    body = L[:, :rows, :]                            # gi [row0, row0+rows)
    tail = L[:, 1:rows + 1, :]                       # gi (row0, row0+rows]
    for j in range(1, hops + 1):
        take = min(rows, A - (j - 1) * rows)
        fwd = [(i, (i + j) % n) for i in range(n)]
        bwd = [(i, (i - j) % n) for i in range(n)]
        from_prev = jax.lax.ppermute(body[:, rows - take:, :],
                                     axis_name, fwd)
        from_next = jax.lax.ppermute(tail[:, :take, :], axis_name, bwd)
        # adjust to global values with the SOURCE shard's offset; fill
        # rows past the sensor edges (top: zeros, bottom: T)
        from_prev = from_prev + offset(idx - j)[:, None, :]
        from_next = from_next + offset(idx + j)[:, None, :]
        from_prev = jnp.where(idx < j, 0.0, from_prev)
        from_next = jnp.where(idx >= n - j, total[:, None, :], from_next)
        above.insert(0, from_prev)
        below.append(from_next)
    return jnp.concatenate(above + [own] + below, axis=1)


def _corr_assemble(cfg: FlowConfig, pk_local, chain_ext, t_c2,
                   loc_maps, ap_tables, rows, row0,
                   lx, ys, in_core, cflag, grp):
    """Sharded rank-2 correction pass + merged-table lane assembly.

    The shard-local mirror of micro_step's deferred correction
    (pipeline/engine.py): the extra plane-fit pass runs on the chunk's
    halo-EXCHANGED boundary chain (already produced by pass 1 - no new
    collectives) with the shard's slice of the host-built center
    surface, and every lane reads its local/true rows through one
    merged-table take, selecting the correction table via the
    host-shipped flag. Off-shard lanes are zeroed (psum-safe).
    Returns the [5, m] f32 lane stack (halo wire layout, packed=False).
    """
    R = cfg.support_radius
    H = cfg.height
    sc = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
    t_c2_ext = jnp.pad(t_c2, ((R, R), (0, 0)))
    pre_arg = (tuple(chain_ext[:-1]) if len(chain_ext) > 2
               else chain_ext[0])
    if pk_local and pallas_kernels.local_flow_chain_ok(
            cfg, len(chain_ext)):
        vx2, vy2, gate2, _, _ = pallas_kernels.local_flow_pallas(
            pre_arg, chain_ext[-1], cfg, halo=R, row_offset=row0,
            t_center=t_c2_ext)
    else:
        vx2, vy2, gate2, _, _ = dense_local_flow(
            pre_arg, chain_ext[-1], cfg, halo=R, row_offset=row0,
            t_center=t_c2_ext)
    loc_all = loc_maps + [jnp.stack([sc(vx2), sc(vy2),
                                     gate2.astype(jnp.float32)])]
    RH = rows * H
    n_loc = len(loc_all)
    loc_tbl = jnp.concatenate([a.reshape(3, RH) for a in loc_all], axis=1)
    safe_lx = jnp.clip(lx, 0, rows - 1)
    pix = safe_lx * jnp.int32(H) + ys
    idx_loc = (jnp.where(cflag, jnp.int32(n_loc - 1), grp)
               * jnp.int32(RH) + pix)
    loc_l = jnp.take(loc_tbl, idx_loc, axis=1)
    loc_l = jnp.where(in_core[None, :], loc_l, 0.0)
    n_ap = len(ap_tables)
    m = lx.shape[0]
    apg = (jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)[0]
           // jnp.int32(m // n_ap))
    ap_tbl = jnp.concatenate([a.reshape(3, RH) for a in ap_tables],
                             axis=1)
    tf = jnp.take(ap_tbl, apg * jnp.int32(RH) + pix, axis=1)
    tf = jnp.where(in_core[None, :], tf, 0.0)
    gate = loc_l[2] != 0
    aux_f = jnp.where(gate, 128 + tf[2] // cfg.window_jump, 0.0)
    return jnp.stack([loc_l[0], loc_l[1],
                      jnp.where(gate, tf[0], 0.0),
                      jnp.where(gate, tf[1], 0.0), aux_f])


def halo_micro_step_sharded(state: SurfaceState, batch,
                            cfg: FlowConfig, n: int, bs: int,
                            t_c2=None):
    """Owner-sharded variant of halo_micro_step (VERDICT.md r4 item 6).

    `batch` is this shard's OWN int32 [5, P*S*bs + P] lane segment (the
    host reordered each scatter sub-group's lanes by owning row shard,
    HaloFlowEngine.pack) - [6, ...] with the reordered corrected-lane
    flag row when `t_c2` (this shard's center-surface band,
    FlowConfig.center_correction) is given - so each device uploads
    ~1/n of the chunk and the per-event scatter/gather work shrinks
    with n. The stamp row's P-lane tail carries the GLOBAL phase start
    stamps for the staleness kill (a shard's first segment lane is not
    the global phase start). Outputs are per-shard lane blocks (no psum
    at all: every lane is computed by exactly one shard); the host
    reassembles stream order from its stored permutation.
    """
    rows = cfg.array_width // n
    idx = jax.lax.axis_index("tx")
    row0 = idx * rows

    x, y, t = batch[0], batch[1], batch[2]
    is_winner = batch[4].astype(jnp.bool_)
    S = cfg.causal_snapshots
    P = cfg.sub_phases
    t0s = batch[2, P * S * bs:]      # global phase start stamps (tail)
    corr = (cfg.center_correction and t_c2 is not None
            and batch.shape[0] > 5)
    loc_maps = []
    ap_tables = []
    chain_ext = []
    A_coarse = 0
    if cfg.aperture_sub_phases:
        a = cfg.aperture_sub_phases
        if a < P and P % a == 0:
            A_coarse = a
    pending = []

    if cfg.use_pallas is None:
        on_tpu = jax.default_backend() == "tpu"
        pk_local = on_tpu and pallas_kernels.local_flow_vmem_ok(cfg)
        pk_apert = on_tpu and pallas_kernels.aperture_vmem_ok(cfg)
    else:
        pk_local = pk_apert = bool(cfg.use_pallas)

    t_surf = state.t_surf
    epoch = state.epoch
    flow_len, flow_vx, flow_vy = state.flow_len, state.flow_vx, state.flow_vy
    R = cfg.support_radius
    A = cfg.max_window + 1
    lanes_out = []

    # pass 1: scatters + band exchanges (issued before all compute; see
    # halo_micro_step)
    phases = []
    t_pre_ext = exchange_halo(t_surf, R, n)
    if corr:
        chain_ext.append(t_pre_ext)
    for p in range(P):
        sl = slice(p * S * bs, (p + 1) * S * bs)
        xs, ys, ts = x[sl], y[sl], t[sl]
        t1s = ts + 1
        ep_val = state.step * P + p
        lx = xs - row0
        in_core = (lx >= 0) & (lx < rows)   # pad lanes may sit off-shard
        win_core = is_winner[sl] & in_core
        snaps_mid_ext = []
        for si in range(S):
            ssl = slice(si * bs, (si + 1) * bs)
            wsx = jnp.where(win_core[ssl], lx[ssl], rows)
            t_surf = t_surf.at[wsx, ys[ssl]].set(
                t1s[ssl], mode="drop", unique_indices=True)
            epoch = epoch.at[wsx, ys[ssl]].set(
                ep_val, mode="drop", unique_indices=True)
            if si < S - 1:
                snaps_mid_ext.append(exchange_halo(t_surf, R, n))
                if corr and not cfg.correction_coarse_chain:
                    chain_ext.append(snaps_mid_ext[-1])
        written = epoch == ep_val
        t_post_ext = exchange_halo(t_surf, R, n)
        if corr:
            chain_ext.append(t_post_ext)
        phases.append((xs, ys, lx, in_core, written,
                       t_pre_ext, tuple(snaps_mid_ext), t_post_ext))
        t_pre_ext = t_post_ext

    # pass 2: stencil compute
    for p, (xs, ys, lx, in_core, written,
            pre0, mids, t_post_ext) in enumerate(phases):
        if not A_coarse or p % (P // A_coarse) == 0:
            age = (t0s[p] + 1) - pre0[R:R + rows]
            stale = (age >= cfg.kill_old_flow_time_us) | (age < 0)
            flow_len = jnp.where(stale, 0.0, flow_len)
        pre_arg = (pre0,) + mids if mids else pre0
        if pk_local:
            vx_map, vy_map, gate_map, len_map, theta_map = (
                pallas_kernels.local_flow_pallas(
                    pre_arg, t_post_ext, cfg, halo=R, row_offset=row0))
        else:
            vx_map, vy_map, gate_map, len_map, theta_map = dense_local_flow(
                pre_arg, t_post_ext, cfg, halo=R, row_offset=row0)
        flow_len = jnp.where(
            written, jnp.where(gate_map, len_map, 0.0), flow_len)
        flow_vx = jnp.where(
            written, jnp.where(gate_map, vx_map, 0.0), flow_vx)
        flow_vy = jnp.where(
            written, jnp.where(gate_map, vy_map, 0.0), flow_vy)

        safe_lx = jnp.clip(lx, 0, rows - 1)
        sc = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        if corr:
            loc_maps.append(jnp.stack([sc(vx_map), sc(vy_map),
                                       gate_map.astype(jnp.float32)]))
        elif A_coarse:
            loc = onehot_gather(
                jnp.stack([sc(vx_map), sc(vy_map),
                           gate_map.astype(jnp.float32)]),
                safe_lx, ys, rows, cfg.height)
            loc = jnp.where(in_core[None, :], loc, 0.0)
            pending.append((safe_lx, ys, in_core, loc))
        if A_coarse and (p + 1) % (P // A_coarse) != 0:
            continue
        integ_ext = assemble_integral_band(flow_len, flow_vx, flow_vy,
                                           cfg, n, A)
        if pk_apert:
            tvx_map, tvy_map, scale_map = pallas_kernels.aperture_pallas(
                flow_len, flow_vx, flow_vy, cfg, halo=A, integ=integ_ext)
        else:
            tvx_map, tvy_map, scale_map = dense_aperture(
                flow_len, flow_vx, flow_vy, cfg, halo=A, integ=integ_ext)
        if corr:
            ap_tables.append(jnp.stack([sc(tvx_map), sc(tvy_map),
                                        scale_map.astype(jnp.float32)]))
            continue
        if A_coarse:
            amaps = jnp.stack([sc(tvx_map), sc(tvy_map),
                               scale_map.astype(jnp.float32)])
            for glx, gys, gcore, gloc in pending:
                tf = onehot_gather(amaps, glx, gys, rows, cfg.height)
                tf = jnp.where(gcore[None, :], tf, 0.0)
                gate = gloc[2] != 0
                aux_f = jnp.where(gate, 128 + tf[2] // cfg.window_jump,
                                  0.0)
                lanes_out.append(jnp.stack(
                    [gloc[0], gloc[1],
                     jnp.where(gate, tf[0], 0.0),
                     jnp.where(gate, tf[1], 0.0), aux_f]))
            pending = []
            continue
        out_maps = wire_maps(gate_map, vx_map, vy_map, tvx_map, tvy_map,
                             scale_map, cfg, packed=False)
        lanes = onehot_gather(out_maps, safe_lx, ys, rows, cfg.height)
        lanes_out.append(jnp.where(in_core[None, :], lanes, 0.0))

    if corr:
        head = P * S * bs
        lx_all = x[:head] - row0
        in_core_all = (lx_all >= 0) & (lx_all < rows)
        grp_all = (jax.lax.broadcasted_iota(
            jnp.int32, (1, head), 1)[0] // jnp.int32(S * bs))
        lanes = _corr_assemble(cfg, pk_local, chain_ext, t_c2,
                               loc_maps, ap_tables, rows, row0,
                               lx_all, y[:head], in_core_all,
                               batch[5, :head] != 0, grp_all)
    else:
        lanes = (lanes_out[0] if len(lanes_out) == 1
                 else jnp.concatenate(lanes_out, axis=1))
    out = wire_pack(lanes[0], lanes[1], lanes[2], lanes[3], lanes[4], cfg)
    new_state = SurfaceState(t_surf, epoch, flow_len, flow_vx, flow_vy,
                             state.step + 1)
    return new_state, out


def halo_micro_step(state: SurfaceState, batch, cfg: FlowConfig, n: int,
                    t_c2=None):
    """One micro-step executed per shard under shard_map.

    `state` holds this shard's [rows, H] surface bands; `batch` is the
    replicated packed int32 [5, m] micro-batch (host-resolved winners,
    pipeline/engine.py pack()) - [6, m] with the rank-2 corrected-lane
    flag row when `t_c2` (this shard's band of the host-built center
    surface, FlowConfig.center_correction) is given. Mirrors
    micro_step's dense branch - including cfg.sub_phases causal groups,
    each with its own band exchanges - with the two stencil stages
    running on halo-extended local bands.
    """
    rows = cfg.array_width // n
    idx = jax.lax.axis_index("tx")
    row0 = idx * rows

    x, y, t = batch[0], batch[1], batch[2]
    is_winner = batch[4].astype(jnp.bool_)
    m_total = x.shape[0]
    P = cfg.sub_phases if m_total % cfg.sub_phases == 0 else 1
    mp = m_total // P
    corr = (cfg.center_correction and t_c2 is not None
            and batch.shape[0] > 5)
    loc_maps = []
    ap_tables = []
    chain_ext = []
    # causal snapshots (FlowConfig.causal_snapshots): each phase scatters
    # in S chronological sub-groups; every boundary surface is halo-
    # exchanged so the plane-fit fold sees the same chain as micro_step's
    # dense path (one extra R-deep exchange per extra snapshot)
    S = cfg.causal_snapshots
    if S > 1 and mp % S:
        S = 1
    # coarse aperture phasing (divisor A of P): pooling runs once per
    # P // A plane-fit groups; per-group plane-fit lanes are buffered
    # until their pooling pass, and the staleness kill runs at APERTURE
    # group cadence (load-bearing; see micro_step / ACCURACY.md)
    A_coarse = 0
    if cfg.aperture_sub_phases:
        a = cfg.aperture_sub_phases
        if a < P and P % a == 0:
            A_coarse = a
    pending = []

    # Pallas kernels run per shard on the halo-extended bands (the same
    # contract as the dense ops' halo mode); auto mode picks them on real
    # TPU whenever the per-program VMEM estimate fits
    if cfg.use_pallas is None:
        on_tpu = jax.default_backend() == "tpu"
        pk_local = on_tpu and pallas_kernels.local_flow_vmem_ok(cfg)
        pk_apert = on_tpu and pallas_kernels.aperture_vmem_ok(cfg)
    else:
        pk_local = pk_apert = bool(cfg.use_pallas)

    t_surf = state.t_surf
    epoch = state.epoch
    flow_len, flow_vx, flow_vy = state.flow_len, state.flow_vx, state.flow_vy
    R = cfg.support_radius
    A = cfg.max_window + 1
    lanes_out = []

    # ---- pass 1: scatters + time-surface band exchanges. The scatter
    # chain only depends on t_surf, so EVERY phase's band ppermutes are
    # issued here, before any stencil compute exists in the program -
    # XLA's latency-hiding scheduler can then run phase p+1's exchanges
    # concurrently with phase p's plane-fit/aperture compute on real ICI
    # (VERDICT.md r4 item 5; tests assert the jaxpr ordering). Phase p's
    # pre-scatter band is phase p-1's post band: one exchange per
    # scatter group total. ----
    phases = []
    t_pre_ext = exchange_halo(t_surf, R, n)
    if corr:
        chain_ext.append(t_pre_ext)
    for p in range(P):
        sl = slice(p * mp, (p + 1) * mp)
        xs, ys, ts = x[sl], y[sl], t[sl]
        t1s = ts + 1
        ep_val = state.step * P + p
        lx = xs - row0
        in_core = (lx >= 0) & (lx < rows)
        win_core = is_winner[sl] & in_core
        snaps_mid_ext = []
        if S == 1:
            wsx = jnp.where(win_core, lx, rows)
            t_surf = t_surf.at[wsx, ys].set(t1s, mode="drop",
                                            unique_indices=True)
            epoch = epoch.at[wsx, ys].set(ep_val, mode="drop",
                                          unique_indices=True)
        else:
            ms = mp // S
            for si in range(S):
                ssl = slice(si * ms, (si + 1) * ms)
                wsx = jnp.where(win_core[ssl], lx[ssl], rows)
                t_surf = t_surf.at[wsx, ys[ssl]].set(
                    t1s[ssl], mode="drop", unique_indices=True)
                epoch = epoch.at[wsx, ys[ssl]].set(
                    ep_val, mode="drop", unique_indices=True)
                if si < S - 1:
                    snaps_mid_ext.append(exchange_halo(t_surf, R, n))
                    if corr and not cfg.correction_coarse_chain:
                        chain_ext.append(snaps_mid_ext[-1])
        written = epoch == ep_val
        t_post_ext = exchange_halo(t_surf, R, n)
        if corr:
            chain_ext.append(t_post_ext)
        phases.append((xs, ys, ts, lx, in_core, written,
                       t_pre_ext, tuple(snaps_mid_ext), t_post_ext))
        t_pre_ext = t_post_ext

    # ---- pass 2: stencil compute per phase ----
    for p, (xs, ys, ts, lx, in_core, written,
            pre0, mids, t_post_ext) in enumerate(phases):
        # staleness kill (exact; state/surfaces.py), at aperture-group
        # cadence when pooling is decoupled coarser (see micro_step).
        # The kill's stamp reference is the phase's PRE-scatter surface -
        # the core rows of its pre band (pass 1 already scattered every
        # phase, so t_surf itself is too new here)
        if not A_coarse or p % (P // A_coarse) == 0:
            age = (ts[0] + 1) - pre0[R:R + rows]
            stale = (age >= cfg.kill_old_flow_time_us) | (age < 0)
            flow_len = jnp.where(stale, 0.0, flow_len)

        pre_arg = (pre0,) + mids if mids else pre0
        if pk_local:
            vx_map, vy_map, gate_map, len_map, theta_map = (
                pallas_kernels.local_flow_pallas(
                    pre_arg, t_post_ext, cfg, halo=R, row_offset=row0))
        else:
            vx_map, vy_map, gate_map, len_map, theta_map = dense_local_flow(
                pre_arg, t_post_ext, cfg, halo=R, row_offset=row0)

        # flow-surface writes (vFlow.cpp:349-356 valid / 398-402 invalid)
        flow_len = jnp.where(
            written, jnp.where(gate_map, len_map, 0.0), flow_len)
        flow_vx = jnp.where(
            written, jnp.where(gate_map, vx_map, 0.0), flow_vx)
        flow_vy = jnp.where(
            written, jnp.where(gate_map, vy_map, 0.0), flow_vy)

        safe_lx = jnp.clip(lx, 0, rows - 1)
        sc = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        if corr:
            # correction mode defers every lane gather to the merged-
            # table assembly after the loop (_corr_assemble)
            loc_maps.append(jnp.stack([sc(vx_map), sc(vy_map),
                                       gate_map.astype(jnp.float32)]))
        elif A_coarse:
            # buffer this group's plane-fit lanes (scrubbed f32 + gate;
            # zero off-shard so the final psum stays exact) until the
            # aperture pass that covers it
            loc = onehot_gather(
                jnp.stack([sc(vx_map), sc(vy_map),
                           gate_map.astype(jnp.float32)]),
                safe_lx, ys, rows, cfg.height)
            loc = jnp.where(in_core[None, :], loc, 0.0)
            pending.append((safe_lx, ys, in_core, loc))
        if A_coarse and (p + 1) % (P // A_coarse) != 0:
            continue

        # ---- aperture stage by exchanged integral partials: each shard
        # integrates only its own rows; the band carries global-integral
        # values (assemble_integral_band), so no pooling work repeats
        # across shards (VERDICT.md r3 item 3) ----
        integ_ext = assemble_integral_band(flow_len, flow_vx, flow_vy,
                                           cfg, n, A)
        if pk_apert:
            tvx_map, tvy_map, scale_map = pallas_kernels.aperture_pallas(
                flow_len, flow_vx, flow_vy, cfg, halo=A, integ=integ_ext)
        else:
            tvx_map, tvy_map, scale_map = dense_aperture(
                flow_len, flow_vx, flow_vy, cfg, halo=A, integ=integ_ext)

        if corr:
            ap_tables.append(jnp.stack([sc(tvx_map), sc(tvy_map),
                                        scale_map.astype(jnp.float32)]))
            continue
        if A_coarse:
            amaps = jnp.stack([sc(tvx_map), sc(tvy_map),
                               scale_map.astype(jnp.float32)])
            for glx, gys, gcore, gloc in pending:
                tf = onehot_gather(amaps, glx, gys, rows, cfg.height)
                tf = jnp.where(gcore[None, :], tf, 0.0)
                gate = gloc[2] != 0
                aux_f = jnp.where(gate, 128 + tf[2] // cfg.window_jump,
                                  0.0)
                lanes_out.append(jnp.stack(
                    [gloc[0], gloc[1],
                     jnp.where(gate, tf[0], 0.0),
                     jnp.where(gate, tf[1], 0.0), aux_f]))
            pending = []
            continue

        # packed=False: these lanes are combined by psum/psum_scatter
        # below, and f32 arithmetic on packed f16-pair bit patterns is
        # not bit-preserving (wire_maps docstring)
        out_maps = wire_maps(gate_map, vx_map, vy_map, tvx_map, tvy_map,
                             scale_map, cfg, packed=False)

        # ---- per-event gather: owner shard contributes ----
        lanes = onehot_gather(out_maps, safe_lx, ys, rows, cfg.height)
        lanes_out.append(jnp.where(in_core[None, :], lanes, 0.0))

    # A reduce-scatter combines the f32 lanes (exactly one shard is
    # non-zero per lane) and leaves each shard holding its 1/n lane
    # slice, which is also how the packed output stays sharded on the
    # wire (P('tx') lane sharding, so per-call cross-device output
    # traffic is the reduce-scatter's (n-1)/n instead of a full
    # all-reduce + replicated fetch). Falls back to psum + replicated
    # output when n does not divide m.
    if corr:
        lx_all = x - row0
        in_core_all = (lx_all >= 0) & (lx_all < rows)
        grp_all = (jax.lax.broadcasted_iota(
            jnp.int32, (1, m_total), 1)[0] // jnp.int32(mp))
        lanes = _corr_assemble(cfg, pk_local, chain_ext, t_c2,
                               loc_maps, ap_tables, rows, row0,
                               lx_all, y, in_core_all,
                               batch[5] != 0, grp_all)
    else:
        lanes = (lanes_out[0] if P == 1
                 else jnp.concatenate(lanes_out, axis=1))
    if n > 1 and m_total % n == 0:
        lanes = jax.lax.psum_scatter(lanes, "tx", scatter_dimension=1,
                                     tiled=True)
    else:
        lanes = jax.lax.psum(lanes, "tx")
    out = wire_pack(lanes[0], lanes[1], lanes[2], lanes[3], lanes[4], cfg)

    new_state = SurfaceState(t_surf, epoch, flow_len, flow_vx, flow_vy,
                             state.step + 1)
    return new_state, out


class HaloFlowEngine(FlowEngine):
    """FlowEngine with explicit ppermute halo exchange over a ('tx',) mesh."""

    # halo_micro_step consumes the 5-row pack layout directly
    _compact_ok = False

    def __init__(self, cfg: FlowConfig, num_devices: int | None = None,
                 mesh: Mesh | None = None):
        if not cfg.use_dense:
            raise ValueError("halo sharding requires the dense compute path")
        if cfg.aperture_sub_phases and \
                cfg.aperture_sub_phases > cfg.sub_phases:
            raise ValueError(
                "the halo engine supports aperture_sub_phases equal to "
                "or a divisor of sub_phases (coarse pooling, the "
                "fidelity-preset shape); FINER aperture phasing is a "
                "base/micro_step engine feature")
        if mesh is None:
            devs = jax.devices()
            if num_devices is not None:
                devs = devs[:num_devices]
            mesh = Mesh(np.array(devs), axis_names=("tx",))
        self.mesh = mesh
        n = int(mesh.devices.size)
        self.n_shards = n
        # non-divisible widths pad up (pad rows are never written); shards
        # thinner than the halo are fine - exchange_halo assembles the
        # band from multiple ring hops
        cfg = cfg.padded_to(n)
        super().__init__(cfg)

        surf = P("tx", None)
        state_specs = SurfaceState(surf, surf, surf, surf, surf, P())
        self._state_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), state_specs,
            is_leaf=lambda s: isinstance(s, P))
        self._repl = NamedSharding(mesh, P())
        self.state = jax.device_put(self.state, self._state_shardings)

        scat = n > 1 and cfg.chunk_size % n == 0
        out_specs = ((P(None, "tx"), P("tx")) if scat
                     else (P(None, None), P(None)))
        step = jax.shard_map(
            functools.partial(halo_micro_step, cfg=cfg, n=n),
            mesh=mesh,
            in_specs=(state_specs, P(None, None)),
            out_specs=(state_specs, out_specs),
            check_vma=False,
        )

        @functools.partial(jax.jit, donate_argnums=(0,),
                           out_shardings=(self._state_shardings, None))
        def _scan(state, chunk):
            return jax.lax.scan(lambda st, b: step(st, b), state, chunk)

        self._scan = _scan
        self._r2c_queue = []
        if cfg.center_correction:
            # sharded rank-2 correction: the pass-2 chain re-uses pass
            # 1's exchanged bands (no new collectives); the host-built
            # center surface ships row-sharded next to the state
            self._ctr_sharding = NamedSharding(mesh, P(None, "tx", None))
            corr_step = jax.shard_map(
                lambda st, b, c2: halo_micro_step(st, b, cfg=cfg, n=n,
                                                  t_c2=c2),
                mesh=mesh,
                in_specs=(state_specs, P(None, None), P("tx", None)),
                out_specs=(state_specs, out_specs),
                check_vma=False,
            )

            @functools.partial(jax.jit, donate_argnums=(0,),
                               out_shardings=(self._state_shardings, None))
            def _scan_corr(state, chunk, ctrs):
                return jax.lax.scan(
                    lambda st, xs: corr_step(st, xs[0], xs[1]),
                    state, (chunk, ctrs))

            self._scan_corr = _scan_corr

        # owner-sharded upload path (VERDICT.md r4 item 6): per scatter
        # sub-group, the host reorders lanes by owning row shard with 2x
        # slack, so each device uploads ~1/n of the chunk, scatters and
        # gathers only its own lanes, and NO output psum is needed. A
        # sub-group whose lanes concentrate past the slack falls back to
        # the replicated path for that process() call.
        blk = cfg.chunk_size // (cfg.sub_phases * cfg.causal_snapshots)
        # 2x slack + a small constant (binomial fluctuation dominates
        # tiny sub-groups)
        self._bs = min(blk, 2 * -(-blk // n) + 4) if n > 1 else blk
        self._shard_layout = None
        if n > 1:
            sstep = functools.partial(halo_micro_step_sharded, cfg=cfg,
                                      n=n, bs=self._bs)
            shard_step = jax.shard_map(
                lambda st, b: sstep(st, b[0]),
                mesh=mesh,
                in_specs=(state_specs, P("tx", None, None)),
                out_specs=(state_specs, (P(None, "tx"), P("tx"))),
                check_vma=False,
            )

            @functools.partial(jax.jit, donate_argnums=(0,),
                               out_shardings=(self._state_shardings, None))
            def _scan_sharded(state, chunk):
                return jax.lax.scan(lambda st, b: shard_step(st, b),
                                    state, chunk)

            self._scan_sharded = _scan_sharded
            self._batch_sharding = NamedSharding(mesh, P(None, "tx"))
            if cfg.center_correction:
                sstep_corr = jax.shard_map(
                    lambda st, b, c2: sstep(st, b[0], t_c2=c2),
                    mesh=mesh,
                    in_specs=(state_specs, P("tx", None, None),
                              P("tx", None)),
                    out_specs=(state_specs, (P(None, "tx"), P("tx"))),
                    check_vma=False,
                )

                @functools.partial(
                    jax.jit, donate_argnums=(0,),
                    out_shardings=(self._state_shardings, None))
                def _scan_sharded_corr(state, chunk, ctrs):
                    return jax.lax.scan(
                        lambda st, xs: sstep_corr(st, xs[0], xs[1]),
                        state, (chunk, ctrs))

                self._scan_sharded_corr = _scan_sharded_corr

    def pack(self, ev, steps_per_call=None, compact=False):
        """5-row pack + owner-shard reorder (halo_micro_step_sharded).

        Returns int32 [n_calls, spc, n, 5, msh] with msh = G*bs + P:
        per scatter sub-group, each shard's owned lanes packed into a
        bs-lane segment (chronology preserved; the remainder zero-padded
        with winner=0 so pads never scatter), plus a P-lane tail whose
        stamp row carries the GLOBAL phase start stamps for the
        staleness kill. Falls back to the replicated layout when any
        sub-group overflows its slack (self._shard_layout None).
        """
        packed, nn = super().pack(ev, steps_per_call=steps_per_call,
                                  compact=False)
        cfg = self.cfg
        self._r2c_queue = []
        if cfg.center_correction:
            # rank-2 data: flags ride as a 6th packed row (reordered
            # with their lanes on the owner-sharded path); the
            # host-built center surfaces queue per call for _dispatch,
            # padded to the sharded array geometry
            fl, ctr = self.pack_r2(ev, steps_per_call=steps_per_call)
            packed = np.concatenate(
                [packed, fl[:, :, None, :].astype(np.int32)], axis=2)
            aw, ah = cfg.array_width, cfg.array_height
            ctr = np.pad(ctr, ((0, 0), (0, 0),
                               (0, aw - cfg.width), (0, ah - cfg.height)))
            self._r2c_queue = [ctr[c] for c in range(ctr.shape[0])]
        n = self.n_shards
        self._shard_layout = None
        if n == 1:
            return packed, nn
        n_calls, spc, n_rows, m = packed.shape
        G = cfg.sub_phases * cfg.causal_snapshots
        blk = m // G
        bs = self._bs
        mp = m // cfg.sub_phases
        rows = cfg.array_width // n
        owner = np.minimum(packed[:, :, 0, :] // rows, n - 1)
        # padded (invalid) lanes sit at x=0 and would all pile onto
        # shard 0; they never scatter and their outputs are discarded,
        # so spread them round-robin instead
        pad = packed[:, :, 3, :] == 0
        owner = np.where(pad, np.arange(m, dtype=np.int64) % n, owner)
        msh = G * bs + cfg.sub_phases
        shard_pack = np.zeros((n_calls, spc, n, n_rows, msh), np.int32)
        # stamp-row tail = global phase start stamps (kill reference)
        shard_pack[:, :, :, 2, G * bs:] = (
            packed[:, :, 2, ::mp][:, :, None, :cfg.sub_phases])
        perm = np.full((n_calls, spc, n, G * bs), -1, np.int64)
        for c in range(n_calls):
            for s in range(spc):
                for g in range(G):
                    lanes = np.arange(g * blk, (g + 1) * blk)
                    ow = owner[c, s, lanes]
                    for k in range(n):
                        src = lanes[ow == k]
                        if src.size > bs:
                            return packed, nn   # overflow: replicated
                        dst = np.arange(g * bs, g * bs + src.size)
                        shard_pack[c, s, k][:, dst] = packed[c, s][:, src]
                        perm[c, s, k, dst] = src
        self._shard_layout = perm
        return shard_pack, nn

    def _unpack_outputs(self, out_blocks, ev, nn):
        if self._shard_layout is None:
            return super()._unpack_outputs(out_blocks, ev, nn)
        from farms_tpu.pipeline.engine import wire_n_main_rows
        cfg = self.cfg
        C = wire_n_main_rows(cfg)
        m = cfg.chunk_size
        n = self.n_shards
        perm = self._shard_layout           # [n_calls, spc, n, G*bs]
        gbs = perm.shape[3]
        blocks = []
        for c, (mo, ao) in enumerate(out_blocks):
            mo = np.asarray(mo)
            ao = np.asarray(ao)
            spc = mo.shape[0]
            msh = mo.shape[2] // n
            mo = mo.reshape(spc, C, n, msh)[..., :gbs]
            ao = ao.reshape(spc, n, msh)[..., :gbs]
            gm = np.zeros((spc, C, m), mo.dtype)
            ga = np.zeros((spc, m), ao.dtype)
            pc = perm[c]
            for s in range(spc):
                for k in range(n):
                    v = pc[s, k] >= 0
                    gm[s][:, pc[s, k, v]] = mo[s][:, k, v]
                    ga[s][pc[s, k, v]] = ao[s, k, v]
            blocks.append((gm, ga))
        return super()._unpack_outputs(blocks, ev, nn)

    def reset(self):
        super().reset()
        self.state = jax.device_put(self.state, self._state_shardings)
        self._r2c_queue = []
        self._shard_layout = None

    def _dispatch(self, chunk):
        ctr = None
        if self._r2c_queue:
            # per-call center surfaces, queued by pack() in call order
            ctr = jax.device_put(jnp.asarray(self._r2c_queue.pop(0)),
                                 self._ctr_sharding)
        if chunk.ndim == 4:                 # owner-sharded layout
            chunk = jax.device_put(chunk, self._batch_sharding)
            if ctr is not None:
                return self._scan_sharded_corr(self.state, chunk, ctr)
            return self._scan_sharded(self.state, chunk)
        chunk = jax.device_put(chunk, self._repl)
        if ctr is not None:
            return self._scan_corr(self.state, chunk, ctr)
        return self._scan(self.state, chunk)
