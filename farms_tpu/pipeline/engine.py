"""Chunked streaming flow engine.

TPU-native replacement for the reference's per-event hot loop
(runFileCopy, vFlow.cpp:223-414). Events are processed in fixed-size
micro-batches; each micro-step is a pure function over the SurfaceState
pytree, micro-steps are fused with `lax.scan`, and the host driver streams
chunks to the device carrying the state across calls (which doubles as the
checkpoint/resume mechanism: the surface pytree *is* the whole state).

Host<->device traffic is packed: one int32 [steps, rows, m] upload per
call — rows=5 (x, y, t, lane_valid, winner), the compact rows=2 layout
(flat index | winner<<30, t; 8 bytes/event), or the delta-coded compact2
rows=1 layout (4 bytes/event, pack2 + the dict batch; geometry-derived field
widths, oversized gaps escape-coded exactly) — and one wire-format download
(i32 [steps, C, m] flow components + u8 [steps, m] validity/scale; 9-17
bytes/event, see wire_pack, or the validity-sparse "sparse" layout at
~1 + 4·accept + 4·valid bytes/event with one transport round trip per
call, see _sparse_pack_outputs; the magnitude/angle columns are derived
host-side), so throughput is bounded by transport rather than per-array
dispatch latency. The device-resident path (`process` with the
default settings uploads everything first, runs every micro-step, then
downloads once) mirrors the reference's measurement methodology: its timed
loop also starts from events already in RAM vectors and appends outputs to
RAM vectors (vFlow.cpp:214-423), with file I/O outside the timer.

Sequential-semantics note: the reference is strictly event-serial - event i
sees surfaces updated by all events j < i. A micro-batch instead scatters
all its events first, then computes all its flows against a causal view of
that surface (ops/local_flow.py), so residual error comes only from
aperture-stage co-batch visibility and is bounded by the micro-batch's time
span; chunk_size=1 reproduces the reference bit-for-bit and is what the
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
from farms_tpu.ops.dense_flow import (
    dense_aperture,
    dense_local_flow,
    onehot_gather,
)
from farms_tpu.ops.local_flow import local_flow_batch
from farms_tpu.ops.pallas import kernels as pallas_kernels
from farms_tpu.state.surfaces import SurfaceState, init_state
from farms_tpu.utils import nativeio

N_OUT_COLS = 7  # r_true, theta_true, vx, vy, r_local, theta_local, scale

# compact2 delta-coded upload: field widths are geometry-derived - flat
# pixel index wide enough for W*H (the padded-lane sentinel) plus one
# winner bit, stamp delta in the remaining bits. Deltas too large for the
# field are escape-coded: up to _C2_ESCAPES (lane, true-delta) pairs per
# micro-step ride in a tiny side array and are re-added on device
# (VERDICT.md r3 item 6: 640x480 and 1280x720 previously paid the 8 B
# layout on an H2D-bound lane).
_C2_ESCAPES = 16

# sparse-wire payload rider lanes (4 B each) appended to the aux fetch:
# 64K lanes cover count_p + count_v for ~1 M-event calls at up to ~3%
# accept+valid fractions, i.e. the benchmark regime rides one round trip
_SPARSE_RIDER_LANES = 65536

# equal-stamp write escapes per (step, phase): with the derived-written
# path (no epoch scatter) the device detects "pixel written this phase"
# as t_surf != t_pre, which misses a phase-final write whose stamp equals
# the pixel's pre-phase value; the host detects those (rare: the same
# pixel must fire twice in the same microsecond straddling a phase
# boundary) and ships their phase-local lane indices exactly. A phase
# with more than _W_ESCAPES of them falls back to the epoch-scatter path
# for that call.
_W_ESCAPES = 32


def compact2_bits(cfg: FlowConfig) -> tuple[int, int]:
    """(index_bits, delta_bits) of the compact2 word for this sensor."""
    idx_bits = (cfg.width * cfg.height).bit_length()
    return idx_bits, 31 - idx_bits


# --------------------------------------------------------------------------
# device->host wire format
#
# Only the 4 flow components cross the wire (vx, vy, gated true_vx/true_vy)
# plus one aux byte (valid flag in bit 7, scale id in bits 0-6); the
# magnitude/angle output columns (vFlow.cpp:370-396) are pure functions of
# these and are derived on the host (engine._unpack_outputs). 17 B/event
# ("f32") or 13 B/event ("f16" packed true-flow pair) instead of the 28 B
# of shipping all 7 f32 columns - D2H bandwidth is the e2e bottleneck.
# --------------------------------------------------------------------------

def _f16_pair(a, b):
    """Pack two f32 lanes into one i32 lane of f16 bit-halves.

    Saturating f32->f16 (clip to the f16 finite range so host decode never
    sees spurious inf; NaN propagates through clip unchanged).
    """
    lo = jax.lax.bitcast_convert_type(
        jnp.clip(a, -65504.0, 65504.0).astype(jnp.float16),
        jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        jnp.clip(b, -65504.0, 65504.0).astype(jnp.float16),
        jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo | (hi << 16), jnp.int32)


def wire_pack(vx, vy, tvx_g, tvy_g, aux_f, cfg: FlowConfig):
    """Pack per-lane outputs into (main i32 [C, m], aux u8 [m]).

    `tvx_g`/`tvy_g` are the true-flow components pre-gated to 0 on invalid
    lanes; `aux_f` is the aux byte as f32 (128 * valid + scale_id).
    """
    aux = aux_f.astype(jnp.uint8)
    if cfg.wire != "f32":     # "f16" and "sparse" pack f16 pairs
        main = jnp.stack(
            [_f16_pair(vx, vy), _f16_pair(tvx_g, tvy_g)], axis=0)
    else:
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        main = jnp.stack([bc(vx), bc(vy), bc(tvx_g), bc(tvy_g)], axis=0)
    return main, aux


def wire_maps(gate_map, vx_map, vy_map, tvx_map, tvy_map, scale_map,
              cfg: FlowConfig, packed: bool | None = None):
    """Stack the dense per-pixel maps the wire needs.

    `packed=False` (or the f32 wire): [5, W, H] f32 - vx, vy, gated
    true_vx, gated true_vy, aux byte value. NaN/inf scrubbed (non-finite
    values only arise with min_evts_on_plane <= 0).

    `packed` (default for f16/sparse wires): [3, W, H] - the two f16
    component pairs packed into i32 AT MAP LEVEL (bitcast to f32 so one
    take gathers all rows), plus the aux row. Identical wire bytes -
    the same f16 rounding just happens before the gather instead of
    after - for 40% less per-event gather volume (the gather is a
    per-event cost, bench profiling). Callers that COMBINE lanes
    arithmetically (halo psum) must pass packed=False: f32 math on
    bitcast pair patterns is not bit-preserving.
    """
    if packed is None:
        packed = cfg.wire != "f32"
    aux_f = jnp.where(
        gate_map, 128 + scale_map // cfg.window_jump, 0).astype(jnp.float32)
    sc = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
    if packed:
        bcf = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        p0 = bcf(_f16_pair(sc(vx_map), sc(vy_map)))
        p1 = bcf(_f16_pair(sc(jnp.where(gate_map, tvx_map, 0.0)),
                           sc(jnp.where(gate_map, tvy_map, 0.0))))
        return jnp.stack([p0, p1, aux_f], axis=0)
    maps = sc(jnp.stack(
        [
            vx_map,
            vy_map,
            jnp.where(gate_map, tvx_map, 0.0),
            jnp.where(gate_map, tvy_map, 0.0),
        ],
        axis=0,
    ))
    return jnp.concatenate([maps, aux_f[None]], axis=0)


def wire_n_main_rows(cfg: FlowConfig) -> int:
    return 4 if cfg.wire == "f32" else 2


def micro_step(state: SurfaceState, batch, cfg: FlowConfig):
    """Process one micro-batch of events against the carried surfaces.

    `batch` is an int32 [rows, m] packed array (rows=5 explicit or rows=2
    compact; see below) or an (x, y, t, lane_valid) tuple. Returns the
    updated state and the wire output pair (i32 [C, m], u8 [m]).

    With cfg.sub_phases = P > 1 the chunk's lanes are processed as P
    chronological groups in sequence: each group's events are scattered
    and flow-computed against the surfaces left by every earlier group
    (and the staleness kill re-runs at each group's start), so the
    effective co-batch visibility granularity is chunk_size / P while the
    scatter volume stays one write per event.
    """
    is_winner = None
    lane_valid = None
    wesc = None
    corr_idx = None
    if isinstance(batch, dict):
        # dict batch: "ev" = the event payload in any layout below,
        # "base"/"esc" = the compact2 aux pair, "wesc" = int32 [P, E]
        # phase-local equal-stamp escape lanes enabling the derived
        # `written` (no epoch scatter; see _W_ESCAPES), "r2f"/"r2c" =
        # the center-correction pass's host-built rank-2 data (u8 [m]
        # corrected-lane flags, i32 [W, H] stamp1 center surface;
        # FlowConfig.center_correction / pack_r2)
        wesc = batch.get("wesc")
        corr_idx = batch.get("r2f")
        corr_ctr = batch.get("r2c")
        if "base" in batch:
            batch = (batch["ev"], batch["base"], batch["esc"])
        else:
            batch = batch["ev"]
    if isinstance(batch, (tuple, list)) and len(batch) == 3:
        # compact2 int32 ([1, m] word row, [] step base, [2, E] escape
        # (lane, delta) rows): bits 0..ib-1 flat pixel index
        # (sentinel W*H on padded lanes), bit ib winner, the remaining
        # 31-ib bits the unsigned stamp delta to the previous lane
        # (lane 0's delta is 0; `base` is the step's first normalized
        # stamp; ib is geometry-derived, compact2_bits). Deltas too big
        # for the field are encoded as 0 in the word and carried exactly
        # in the escape pair arrays (lane index, true delta; sentinel
        # lane m = unused slot): every lane at or past an escape lane
        # re-adds that escape's delta, restoring the exact cumsum.
        # 4 bytes/event on the H2D wire; the host packer falls back to
        # the 8-byte layout only when a step overflows the escape budget
        # or the sensor exceeds 2^23 pixels (pack2()).
        word, base, esc = batch
        esc_l, esc_d = esc[0], esc[1]
        word = word[0]
        ib, db = compact2_bits(cfg)
        is_winner = ((word >> ib) & 1).astype(jnp.bool_)
        dt = (word >> (ib + 1)) & jnp.int32((1 << db) - 1)
        t = base + jnp.cumsum(dt, dtype=jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, word.shape[0]), 1)[0]
        t = t + jnp.sum(
            jnp.where(lane[None, :] >= esc_l[:, None], esc_d[:, None], 0),
            axis=0, dtype=jnp.int32)
        xy = word & jnp.int32((1 << ib) - 1)
        x = xy // jnp.int32(cfg.height)
        y = xy - x * jnp.int32(cfg.height)
    elif isinstance(batch, (tuple, list)):
        x, y, t, lane_valid = batch
        lane_valid = lane_valid.astype(jnp.bool_)
    elif batch.shape[0] == 2:
        # compact packed int32 [2, m]: row 0 = flat pixel index x*H+y with
        # the host-resolved winner flag in bit 30 (W*H < 2^30 for every
        # supported sensor; invalid/padded lanes carry the out-of-range
        # sentinel W*H and are never winners), row 1 = normalized stamp.
        # 8 bytes/event upload instead of 20 - H2D bandwidth is the e2e
        # bottleneck (bench.py). The divide-by-constant decode is a couple
        # of VPU multiply-shifts, invisible next to the scatters.
        word, t = batch[0], batch[1]
        is_winner = ((word >> 30) & 1).astype(jnp.bool_)
        xy = word & jnp.int32(0x3FFFFFFF)
        x = xy // jnp.int32(cfg.height)
        y = xy - x * jnp.int32(cfg.height)
    else:
        # packed int32 [5, m]: the component axis is major so each row is a
        # well-tiled [m] vector (a minor axis of 5 would be padded to 128
        # lanes on TPU - a 25x memory blowup). Channel 4 marks batch
        # winners (the last event at each pixel within a sub-phase group),
        # resolved on the host during packing so every device scatter has
        # unique indices.
        x, y, t = batch[0], batch[1], batch[2]
        lane_valid = batch[3].astype(jnp.bool_)
        if batch.shape[0] > 4:
            is_winner = batch[4].astype(jnp.bool_)
    # scatter sentinels and gather extents follow the (possibly padded)
    # device arrays; semantic border rules live in the dense ops
    W, H = cfg.array_width, cfg.array_height
    m = x.shape[0]
    P = cfg.sub_phases if m % cfg.sub_phases == 0 else 1
    mp = m // P

    t_surf = state.t_surf
    epoch = state.epoch
    flow_len, flow_vx, flow_vy = state.flow_len, state.flow_vx, state.flow_vy

    if cfg.use_dense:
        if cfg.use_pallas is None:
            # auto: real TPU only - on CPU the kernels would run in the
            # (slow) interpreter, so tests opt in explicitly instead
            on_tpu = jax.default_backend() == "tpu"
            pk_local = on_tpu and pallas_kernels.local_flow_supported(cfg)
            pk_apert = on_tpu and pallas_kernels.aperture_supported(cfg)
        else:
            pk_local = pk_apert = cfg.use_pallas

    lanes_out = []
    # center-correction bookkeeping: the chunk's full sub-group snapshot
    # chain (surface after every sub-scatter) and the per-aperture-pass
    # true-flow tables, consumed by the rank-2 pass after the loop
    corr = (cfg.center_correction and corr_idx is not None
            and corr_ctr is not None
            and cfg.use_dense and is_winner is not None)
    chunk_chain = [t_surf] if corr else None
    ap_tables = []
    loc_maps = []
    # coarse-aperture decoupling (dense path): with aperture_sub_phases A
    # a DIVISOR of the plane-fit phase count P, pooling runs once per
    # Q = P/A plane-fit groups; `pending` buffers each local group's
    # gathered plane-fit lanes until its aperture pass
    A_coarse = 0
    if cfg.use_dense and cfg.aperture_sub_phases:
        a = cfg.aperture_sub_phases
        if a < P and P % a == 0:
            A_coarse = a
    pending = []
    for p in range(P):
        sl = slice(p * mp, (p + 1) * mp)
        xs, ys, ts = x[sl], y[sl], t[sl]
        t1s = ts + 1     # stamp1 encoding (see state/surfaces.py)
        ep_val = state.step * P + p   # unique, monotone write epoch

        # ---- permanent staleness kill (exact; see state/surfaces.py
        # kill_stale_flow). With coarse aperture phasing the kill runs at
        # APERTURE group starts only: flow_len is consumed solely by the
        # pooling stage, and killing at every plane-fit group start would
        # erase the early groups' temporal neighborhood before their
        # pooling pass ever runs (measured: AEE 5.1 vs 0.17 px/ms on the
        # bar stream) - the uniform sub_phases=A cadence is the semantic
        # anchor. ----
        if not A_coarse or p % (P // A_coarse) == 0:
            age = (ts[0] + 1) - t_surf
            stale = (age >= cfg.kill_old_flow_time_us) | (age < 0)
            flow_len = jnp.where(stale, 0.0, flow_len)

        # ---- scatter events into the time surface ----
        # Only group winners write (non-winners would be overwritten
        # anyway: last-write-wins, vFlow.cpp:264-273); invalid lanes are
        # redirected out of bounds and dropped. With host-resolved winners
        # all indices are unique, which lets XLA skip scatter conflict
        # handling. Two scatters per group: stamp1 (which doubles as the
        # touched mask) and the write epoch (from which `written` is
        # derived); scatters are the dominant per-event cost (~7.5 ns
        # each measured), so fewer is faster.
        t_pre = t_surf
        snaps_mid = []
        # multi-snapshot causal visibility (cfg.causal_snapshots): the
        # phase's lanes scatter as S chronological sub-groups - same
        # total scatter volume, winners host-resolved per sub-group -
        # keeping each boundary surface; the plane-fit causal view folds
        # over all of them (ops/dense_flow.py), giving chunk/(P*S)
        # neighbor-visibility granularity from ONE dense pass
        S = cfg.causal_snapshots
        if S > 1 and (mp % S or is_winner is None or not cfg.use_dense):
            S = 1
        if is_winner is not None:
            win = is_winner[sl]
            # derived-written mode (host escapes shipped): the epoch
            # scatter is skipped entirely - `written` comes from
            # comparing the phase's pre/post surfaces, with the rare
            # equal-stamp rewrites patched in exactly from the host's
            # escape lanes. Saves one full scatter per event (~3.9
            # ns/event, the dominant per-event cost; see _W_ESCAPES).
            derive = wesc is not None and cfg.use_dense
            if S == 1:
                wsx = jnp.where(win, xs, W)
                t_surf = t_surf.at[wsx, ys].set(t1s, mode="drop",
                                                unique_indices=True)
                if not derive:
                    epoch = epoch.at[wsx, ys].set(ep_val, mode="drop",
                                                  unique_indices=True)
                if corr:
                    chunk_chain.append(t_surf)
            else:
                ms = mp // S
                for si in range(S):
                    ssl = slice(si * ms, (si + 1) * ms)
                    wsx = jnp.where(win[ssl], xs[ssl], W)
                    t_surf = t_surf.at[wsx, ys[ssl]].set(
                        t1s[ssl], mode="drop", unique_indices=True)
                    if not derive:
                        epoch = epoch.at[wsx, ys[ssl]].set(
                            ep_val, mode="drop", unique_indices=True)
                    if si < S - 1:
                        snaps_mid.append(t_surf)
                    if corr and (si == S - 1
                                 or not cfg.correction_coarse_chain):
                        chunk_chain.append(t_surf)
            if derive:
                el = wesc[p]                       # [E] phase-local lanes
                safe_el = jnp.clip(el, 0, mp - 1)
                # sentinel lanes route to DISTINCT out-of-bounds rows so
                # the unique_indices promise holds even for dropped slots
                oob = W + jnp.arange(el.shape[0], dtype=jnp.int32)
                ex = jnp.where(el < mp, xs[safe_el], oob)
                written = (t_surf != t_pre).at[ex, ys[safe_el]].set(
                    True, mode="drop", unique_indices=True)
            else:
                written = epoch == ep_val
        else:
            # device-side winner resolution (tuple-batch callers): the
            # winner at each pixel is the *latest lane* (lanes are
            # chronological), so resolve by lane index, never by a stamp
            # max - stamp1 is uint32-in-int32 and a signed max picks wrong
            # once stamps >= 2^31
            lv = lane_valid[sl]
            idx = jnp.arange(mp, dtype=jnp.int32)
            sx = jnp.where(lv, xs, W)
            slot = jnp.full((W, H), -1, dtype=jnp.int32)
            slot = slot.at[sx, ys].max(idx, mode="drop")
            written = slot >= 0
            win = (slot[xs, ys] == idx) & lv
            wsx = jnp.where(win, xs, W)
            t_surf = t_surf.at[wsx, ys].set(t1s, mode="drop",
                                            unique_indices=True)
            epoch = jnp.where(written, ep_val, epoch)

        if cfg.use_dense:
            # ---- dense per-pixel path (ops/dense_flow.py), with the two
            # hot stages optionally fused into Pallas kernels ----
            pre_arg = (t_pre,) + tuple(snaps_mid) if snaps_mid else t_pre
            if pk_local:
                vx_map, vy_map, gate_map, len_map, theta_map = (
                    pallas_kernels.local_flow_pallas(pre_arg, t_surf, cfg))
            else:
                vx_map, vy_map, gate_map, len_map, theta_map = (
                    dense_local_flow(pre_arg, t_surf, cfg))

            # flow-surface writes for every pixel written this group
            # (vFlow.cpp:349-356 valid / 398-402 invalid)
            flow_len = jnp.where(
                written, jnp.where(gate_map, len_map, 0.0), flow_len)
            flow_vx = jnp.where(
                written, jnp.where(gate_map, vx_map, 0.0), flow_vx)
            flow_vy = jnp.where(
                written, jnp.where(gate_map, vy_map, 0.0), flow_vy)

            if A_coarse:
                # ---- coarse aperture (VERDICT.md r3 item 1 route):
                # validity comes from the plane fit alone, so running the
                # fit at fine granularity (chunk/P) with pooling at the
                # coarser chunk/A granularity keeps validity agreement at
                # the fine level for a fraction of uniform fine phasing's
                # cost (the pooling pass is ~half a phase). Pooling for
                # groups aQ..(a+1)Q-1 runs after all their scatters/flow
                # writes - exactly the aperture co-batch visibility of
                # uniform sub_phases=A - and consumes the finer-resolved
                # flow surfaces (strictly closer to the event-serial
                # reference than uniform A). Per-group plane-fit lanes are
                # buffered until their pooling pass.
                sc = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0,
                                              neginf=0.0)
                bcf = lambda a: jax.lax.bitcast_convert_type(
                    a, jnp.float32)
                if cfg.wire != "f32":
                    # packed-gather layout (see wire_maps): local rows =
                    # [f16 vx/vy pair (as f32 bits), gate]
                    loc_stack = jnp.stack(
                        [bcf(_f16_pair(sc(vx_map), sc(vy_map))),
                         gate_map.astype(jnp.float32)])
                else:
                    loc_stack = jnp.stack(
                        [sc(vx_map), sc(vy_map),
                         gate_map.astype(jnp.float32)])
                if corr:
                    # correction mode defers EVERY lane gather to the end
                    # of the chunk (the merged-table read needs the
                    # rank-2 pass's maps): keep the per-group map stacks
                    loc_maps.append(loc_stack)
                else:
                    pending.append(
                        (xs, ys, onehot_gather(loc_stack, xs, ys, W, H)))
                if (p + 1) % (P // A_coarse) == 0:
                    if pk_apert:
                        tvx_map, tvy_map, scale_map = (
                            pallas_kernels.aperture_pallas(
                                flow_len, flow_vx, flow_vy, cfg))
                    else:
                        tvx_map, tvy_map, scale_map = dense_aperture(
                            flow_len, flow_vx, flow_vy, cfg)
                    if cfg.wire != "f32":
                        amaps = jnp.stack(
                            [bcf(_f16_pair(sc(tvx_map), sc(tvy_map))),
                             scale_map.astype(jnp.float32)])
                    else:
                        amaps = jnp.stack([sc(tvx_map), sc(tvy_map),
                                           scale_map.astype(jnp.float32)])
                    if corr:
                        ap_tables.append(amaps)
                    for gxs, gys, gloc in pending:
                        tf = onehot_gather(amaps, gxs, gys, W, H)
                        gate = gloc[-1] != 0
                        aux_f = jnp.where(
                            gate, 128 + tf[-1] // cfg.window_jump, 0.0)
                        if cfg.wire != "f32":
                            # zero f32 bits == f16 pair (0, 0): the
                            # invalid-lane gating stays bit-exact
                            lanes_out.append(jnp.stack([
                                gloc[0],
                                jnp.where(gate, tf[0], 0.0),
                                aux_f]))
                        else:
                            lanes_out.append(jnp.stack([
                                gloc[0], gloc[1],
                                jnp.where(gate, tf[0], 0.0),
                                jnp.where(gate, tf[1], 0.0),
                                aux_f]))
                    pending = []
                continue

            # aperture stage, optionally on finer chronological groups
            # than the plane fit (cfg.aperture_sub_phases): each group
            # re-applies the staleness kill at its own start time and
            # runs its own pooling pass. Group 0's kill already happened
            # at phase start; later groups must treat small *negative*
            # ages as fresh - stamps written by this phase's later events
            # sit in the group's near future and will be fresh for
            # subsequent queries, so only genuinely ancient entries
            # (age >= kill window, or wrapped past 2^30) die.
            k = (max(1, cfg.aperture_sub_phases // P)
                 if cfg.aperture_sub_phases else 1)
            if mp % k or corr:
                # same divisibility fallback as the P selection above:
                # a non-dividing group count would silently drop the
                # mp - k*(mp//k) trailing lanes from the wire output
                # (ADVICE.md r3). Correction mode forbids finer-than-P
                # aperture phasing (config validation), so k is 1 there.
                k = 1
            mg = mp // k
            for g in range(k):
                if g:
                    g0 = ts[g * mg]
                    age = (g0 + 1) - t_surf
                    stale = ((age >= cfg.kill_old_flow_time_us)
                             & (age < (1 << 30))) | (age < -(1 << 30))
                    flow_len = jnp.where(stale, 0.0, flow_len)
                if pk_apert:
                    tvx_map, tvy_map, scale_map = (
                        pallas_kernels.aperture_pallas(
                            flow_len, flow_vx, flow_vy, cfg))
                else:
                    tvx_map, tvy_map, scale_map = dense_aperture(
                        flow_len, flow_vx, flow_vy, cfg)
                if corr:
                    # defer lane gathers to chunk end (merged tables)
                    sc_ = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0,
                                                   neginf=0.0)
                    bcf_ = lambda a: jax.lax.bitcast_convert_type(
                        a, jnp.float32)
                    if cfg.wire != "f32":
                        ap_tables.append(jnp.stack(
                            [bcf_(_f16_pair(sc_(tvx_map), sc_(tvy_map))),
                             scale_map.astype(jnp.float32)]))
                        loc_maps.append(jnp.stack(
                            [bcf_(_f16_pair(sc_(vx_map), sc_(vy_map))),
                             gate_map.astype(jnp.float32)]))
                    else:
                        ap_tables.append(jnp.stack(
                            [sc_(tvx_map), sc_(tvy_map),
                             scale_map.astype(jnp.float32)]))
                        loc_maps.append(jnp.stack(
                            [sc_(vx_map), sc_(vy_map),
                             gate_map.astype(jnp.float32)]))
                    continue

                maps = wire_maps(gate_map, vx_map, vy_map, tvx_map,
                                 tvy_map, scale_map, cfg)
                gsl = slice(g * mg, (g + 1) * mg)
                lanes_out.append(
                    onehot_gather(maps, xs[gsl], ys[gsl], W, H))
            continue

        # ---- per-event reference path ----
        raw_vx, raw_vy, gate_valid, length, theta = local_flow_batch(
            t_pre, t_surf, xs, ys, t1s, cfg
        )

        # flow-surface writes (vFlow.cpp:349-356 valid / 398-402 invalid)
        wx = jnp.where(win, xs, W)
        flow_len = flow_len.at[wx, ys].set(
            jnp.where(gate_valid, length, 0.0), mode="drop")
        flow_vx = flow_vx.at[wx, ys].set(
            jnp.where(gate_valid, raw_vx, 0.0), mode="drop")
        flow_vy = flow_vy.at[wx, ys].set(
            jnp.where(gate_valid, raw_vy, 0.0), mode="drop")

        # ---- multi-scale aperture correction ----
        integral = build_integral(flow_len, flow_vx, flow_vy)
        true_vx, true_vy, scale = aperture_batch(
            integral, flow_vx, flow_vy, xs, ys, cfg
        )

        # ---- output lanes (vFlow.cpp:370-396; R/Theta derived on host) ----
        aux_f = jnp.where(
            gate_valid, 128 + scale // cfg.window_jump, 0
        ).astype(jnp.float32)
        lanes_out.append(jnp.stack(
            [raw_vx, raw_vy,
             jnp.where(gate_valid, true_vx, 0.0),
             jnp.where(gate_valid, true_vy, 0.0),
             aux_f], axis=0))

    if not corr:
        lanes = (lanes_out[0] if len(lanes_out) == 1
                 else jnp.concatenate(lanes_out, axis=1))
    else:
        # ---- rank-2 center-attribution correction (one dense pass per
        # CHUNK; FlowConfig.center_correction). The host-shipped lanes
        # are the second-latest event per multiply-written pixel (latest
        # chunk occurrence per pixel, deduped); their own stamps build
        # the center surface, and the plane fit folds visibility over
        # the chunk's FULL sub-group chain, so each corrected lane is
        # evaluated exactly as a finer-grained phase would have - fixing
        # the dominant term of the batched validity error without
        # re-running the per-phase passes (VERDICT.md r4 item 1). ----
        # the center surface arrives host-built (pack_r2): zero device
        # prep work at all for the rank-2 data
        t_c2 = corr_ctr
        if pk_local and pallas_kernels.local_flow_chain_ok(
                cfg, len(chunk_chain)):
            vx2, vy2, gate2, _, _ = pallas_kernels.local_flow_pallas(
                tuple(chunk_chain[:-1]), chunk_chain[-1], cfg,
                t_center=t_c2)
        else:
            vx2, vy2, gate2, _, _ = dense_local_flow(
                tuple(chunk_chain[:-1]), chunk_chain[-1], cfg,
                t_center=t_c2)
        sc2 = lambda a: jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        bc2 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        if cfg.wire != "f32":
            loc_maps.append(jnp.stack(
                [bc2(_f16_pair(sc2(vx2), sc2(vy2))),
                 gate2.astype(jnp.float32)]))
        else:
            loc_maps.append(jnp.stack(
                [sc2(vx2), sc2(vy2), gate2.astype(jnp.float32)]))
        # ---- single merged-table lane assembly. Each lane reads its
        # LOCAL rows from its own plane-fit group's map stack - or the
        # correction pass's stack when its lane was corrected (a dense
        # per-lane flag built from the compacted indices) - and its
        # TRUE rows from its own aperture pass's table. One flat take
        # per table set, the same gather volume as the uncorrected
        # path: the correction's only per-lane cost is the flag scatter
        # and the index arithmetic (the scatter-override formulation
        # this replaces cost ~60 ns per corrected lane in B-lane
        # gathers/scatters - measured round-5 bisect). ----
        WH = W * H
        pix = x * H + y
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)[0]
        cflag = corr_idx != 0                   # host-shipped dense flags
        n_loc = len(loc_maps)                   # P group stacks + pass2
        grp = lane_ids // jnp.int32(mp)
        idx_loc = (jnp.where(cflag, n_loc - 1, grp) * jnp.int32(WH)
                   + pix)
        Fl = loc_maps[0].shape[0]
        loc_tbl = jnp.concatenate(
            [a.reshape(Fl, WH) for a in loc_maps], axis=1)
        loc_l = jnp.take(loc_tbl, idx_loc, axis=1)
        n_ap = len(ap_tables)
        apg = lane_ids // jnp.int32(m // n_ap)
        Fw = ap_tables[0].shape[0]
        ap_tbl = jnp.concatenate(
            [a.reshape(Fw, WH) for a in ap_tables], axis=1)
        tf = jnp.take(ap_tbl, apg * jnp.int32(WH) + pix, axis=1)
        gate = loc_l[-1] != 0
        aux_f = jnp.where(gate, 128 + tf[-1] // cfg.window_jump, 0.0)
        if cfg.wire != "f32":
            lanes = jnp.stack([loc_l[0],
                               jnp.where(gate, tf[0], 0.0), aux_f])
        else:
            lanes = jnp.stack([loc_l[0], loc_l[1],
                               jnp.where(gate, tf[0], 0.0),
                               jnp.where(gate, tf[1], 0.0), aux_f])
    if cfg.use_dense and cfg.wire != "f32":
        # packed-gather layout: rows are already the f16 pair words (as
        # f32 bits) + the aux value - no per-lane packing left to do
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        out = (jnp.stack([bc(lanes[0]), bc(lanes[1])], axis=0),
               lanes[2].astype(jnp.uint8))
    else:
        out = wire_pack(lanes[0], lanes[1], lanes[2], lanes[3], lanes[4],
                        cfg)
    new_state = SurfaceState(t_surf, epoch, flow_len, flow_vx, flow_vy,
                             state.step + 1)
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def scan_chunk(state: SurfaceState, chunk, cfg: FlowConfig):
    """Run several micro-steps under one jit via lax.scan.

    `chunk` is any per-step pytree micro_step accepts with a leading
    [n_steps] axis on every leaf: an int32 [n_steps, rows, m] array
    (rows=5 explicit or rows=2 compact) or the dict batch ("ev" +
    optional "base"/"esc" compact2 aux, "wesc" equal-stamp escapes,
    "r2f"/"r2c" correction data). Output is the wire pair
    (i32 [n_steps, C, m], u8 [n_steps, m]) - see wire_pack.
    """
    def body(st, batch):
        return micro_step(st, batch, cfg)

    return jax.lax.scan(body, state, chunk)


def _sparse_pack_outputs(main, aux):
    """Compact a scan call's f16 wire blocks into the sparse wire tuple.

    The D2H payload is blind to validity in the f16 layout: it ships
    9 B for *every* event when typically only a few percent of lanes
    carry flow (VERDICT.md r3 missing-1). Here the aux byte stays dense
    (1 B/event: valid bit 7, scale id bits 0-5, plus a new `present` bit
    6 marking lanes whose raw vx/vy pair is nonzero - it is exactly 0.0
    wherever the plane fit did not accept, vFlow.cpp:390-402 via
    micro_step's gating) while the two f16 component pairs compact to
    prefix arrays the host fetches only `count` lanes of:

        aux    u8  [steps, m]  - dense, bit 6 = raw pair present
        counts i32 [2]         - (# present lanes, # valid lanes)
        pay_p  i32 [steps*m]   - f16 vx/vy words of present lanes, in
                                 stream order, as a prefix
        pay_v  i32 [steps*m]   - f16 true-flow words of valid lanes

    Compaction is two cumsum+scatter passes over the call's lanes -
    ~15 ns/event of device work that buys up to ~8 B/event of wire on
    mostly-invalid streams (the e2e lane is transport-bound, bench.py).
    """
    steps, _, m = main.shape
    N = steps * m
    vx_word = main[:, 0, :].reshape(N)
    tf_word = main[:, 1, :].reshape(N)
    auxf = aux.reshape(N)
    present = vx_word != 0
    valid = (auxf & jnp.uint8(0x80)) != 0
    aux_out = auxf | jnp.where(present, jnp.uint8(0x40), jnp.uint8(0))
    idx_p = jnp.cumsum(present.astype(jnp.int32)) - 1
    idx_v = jnp.cumsum(valid.astype(jnp.int32)) - 1
    count_p = idx_p[-1] + 1
    counts = jnp.stack([count_p, idx_v[-1] + 1])
    # ONE payload buffer: present-lane vx/vy words first, then (valid is
    # a subset of present, so count_p + count_v <= 2N) the valid-lane
    # true words at dynamic offset count_p - the host fetches a single
    # prefix slice. Every host fetch through the remote tunnel is a
    # round trip, and the e2e lane is latency-bound, not
    # bandwidth-bound: v1 of this wire shipped 4 arrays per call and
    # measured SLOWER than the dense wire (7 MB/s of a ~50 MB/s link).
    sent = jnp.int32(2 * N)
    pay = jnp.zeros(2 * N, jnp.int32)
    pay = pay.at[jnp.where(present, idx_p, sent)].set(
        vx_word, mode="drop", unique_indices=True)
    pay = pay.at[jnp.where(valid, idx_v + count_p, sent)].set(
        tf_word, mode="drop", unique_indices=True)
    # counts AND a fixed-size payload rider ride the aux buffer: one
    # fetch delivers everything whenever count_p + count_v fits the
    # rider (typical for the benchmark's ~3%-valid streams), leaving
    # ONE round trip per call; high-validity streams pay one bounded
    # tail fetch. The rider costs 4*R bytes per call regardless of use.
    R = min(_SPARSE_RIDER_LANES, 2 * N)
    aux_plus = jnp.concatenate(
        [aux_out,
         jax.lax.bitcast_convert_type(counts, jnp.uint8).reshape(8),
         jax.lax.bitcast_convert_type(pay[:R], jnp.uint8).reshape(4 * R)])
    return aux_plus, pay


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def scan_chunk_sparse(state: SurfaceState, chunk, cfg: FlowConfig):
    """scan_chunk + on-device sparse-wire compaction (cfg.wire='sparse')."""
    def body(st, batch):
        return micro_step(st, batch, cfg)

    state, (main, aux) = jax.lax.scan(body, state, chunk)
    return state, _sparse_pack_outputs(main, aux)


class FlowEngine:
    """Host-side streaming driver carrying device state across chunks."""

    # subclasses whose step fn can't decode the 2-row compact pack opt out
    _compact_ok = True

    def __init__(self, cfg: FlowConfig):
        self.cfg = cfg
        self.state = init_state(cfg)
        self._t0 = None
        # host mirror of t_surf (stamp1, semantic geometry) for
        # pack_wesc; kept eagerly so it works for engines whose device
        # state is not host-addressable (multi-process global arrays)
        self._last_stamp = np.zeros(cfg.width * cfg.height, np.int32)
        # transport instrumentation (bench: fetches_per_call / RTT-floor
        # arithmetic, VERDICT.md r4 item 3): device->host fetch count and
        # wall seconds, updated under a lock by the fetch workers
        import threading
        self._fetch_lock = threading.Lock()
        self.fetch_stats = {"fetches": 0, "seconds": 0.0}

    def reset(self):
        self.state = init_state(self.cfg)
        self._t0 = None
        self._last_stamp = np.zeros(
            self.cfg.width * self.cfg.height, np.int32)

    def place_state(self, state: SurfaceState) -> SurfaceState:
        """Apply this engine's device/sharding placement to a state pytree.

        Sharded subclasses expose their placement via `_state_shardings`
        (a SurfaceState of NamedShardings) or `_state_sharding` (one
        sharding for every leaf); checkpoint restore uses this so a saved
        state re-enters the engine's mesh layout (VERDICT.md item 9).
        """
        # re-seed the host stamp mirror from the incoming (host-side)
        # state: pack_wesc's equal-stamp detection must track the
        # surfaces this engine now carries
        self._last_stamp = np.ascontiguousarray(
            np.asarray(state.t_surf)[:self.cfg.width, :self.cfg.height]
        ).reshape(-1).astype(np.int32).copy()
        sh = (getattr(self, "_state_shardings", None)
              or getattr(self, "_state_sharding", None))
        return jax.device_put(state, sh) if sh is not None else state

    def _dispatch(self, chunk):
        """Run one scan call; subclasses override to add shardings."""
        return scan_chunk(self.state, chunk, self.cfg)

    # ---- host-side packing -------------------------------------------------
    def pack(self, ev: EventBatch, steps_per_call: int | None = None,
             compact: bool = False):
        """Normalize, pad, and pack an event stream for the device.

        Returns (packed int32 [n_calls, steps, rows, m] host array, n)
        where n is the real event count; rows is 5 (x, y, t, lane_valid,
        winner) or, with `compact=True`, 2 (x*H+y | winner<<30, t) —
        8 bytes/event on the H2D wire instead of 20 (micro_step decodes).
        The first call latches t0 = first stamp (vFlow.cpp:194, 241);
        later calls continue the same timeline.
        """
        cfg = self.cfg
        if compact and cfg.width * cfg.height >= 1 << 30:
            # the compact layout keeps the winner flag in bit 30 of the
            # flat pixel index; a sensor with W*H >= 2^30 would alias it,
            # so fall back to the explicit 5-row layout (ADVICE.md r2)
            compact = False
        n = len(ev)
        if self._t0 is None and n:
            self._t0 = np.uint32(ev.t[0])

        m = cfg.chunk_size
        spc = steps_per_call or cfg.steps_per_scan
        per_call = m * spc
        n_calls = max(1, -(-n // per_call))
        total = n_calls * per_call
        pad_total = total - n

        if compact:
            # native single-pass pack (clip + normalize + winner bits);
            # None (library absent) falls through to the NumPy path
            nat = nativeio.pack_compact(
                ev.x, ev.y, ev.t, int(self._t0 or 0), cfg.width, cfg.height,
                m, n_calls * spc,
                subphases=cfg.sub_phases * cfg.causal_snapshots)
            if nat is not None:
                return nat.reshape(n_calls, spc, 2, m), n

        x = np.clip(ev.x.astype(np.int32), 0, cfg.width - 1)
        y = np.clip(ev.y.astype(np.int32), 0, cfg.height - 1)
        t = (ev.t.astype(np.uint32) - (self._t0 or np.uint32(0))).view(np.int32)

        def padded(arr, fill):
            if not pad_total:
                return arr
            out = np.empty(total, dtype=np.int32)
            out[:n] = arr
            out[n:] = fill
            return out

        xp = padded(x, 0)
        yp = padded(y, 0)
        tp = padded(t, t[-1] if n else 0)

        # host-side winner resolution per scatter group (the scatter
        # granularity, micro_step: sub_phases * causal_snapshots groups
        # per chunk): the last event at each pixel within a group wins
        # (vFlow.cpp:264-273). NumPy fancy-index assignment keeps the
        # last write, giving an O(m) resolution; device scatters then
        # have unique indices. Padded (invalid) lanes sit at x=y=0;
        # route them to a sentinel bucket so they cannot steal pixel
        # (0,0) from a real event.
        blk = m // (cfg.sub_phases * cfg.causal_snapshots)
        flat = xp * np.int64(cfg.height) + yp
        flat[n:] = cfg.width * cfg.height
        flat = flat.reshape(-1, blk)
        lanes = np.arange(blk)
        seen = np.empty(cfg.width * cfg.height + 1, dtype=np.int64)
        winner = np.empty((flat.shape[0], blk), dtype=np.int32)
        for b in range(flat.shape[0]):
            seen[flat[b]] = lanes
            winner[b] = seen[flat[b]] == lanes
        winner = winner.reshape(-1)
        winner[n:] = 0

        if compact:
            # row 0: flat pixel index (sentinel W*H on padded lanes, which
            # also marks them invalid) with the winner flag in bit 30
            word = flat.reshape(-1).astype(np.int32)
            word |= winner << 30
            packed = np.empty((n_calls, spc, 2, m), dtype=np.int32)
            packed[:, :, 0, :] = word.reshape(n_calls, spc, m)
            packed[:, :, 1, :] = tp.reshape(n_calls, spc, m)
            return packed, n

        lane_valid = np.empty(total, dtype=np.int32)
        lane_valid[:n] = 1
        lane_valid[n:] = 0

        # write straight into the final [n_calls, spc, 5, m] layout
        # (strided component writes; no transpose copy afterwards)
        packed = np.empty((n_calls, spc, 5, m), dtype=np.int32)
        packed[:, :, 0, :] = xp.reshape(n_calls, spc, m)
        packed[:, :, 1, :] = yp.reshape(n_calls, spc, m)
        packed[:, :, 2, :] = tp.reshape(n_calls, spc, m)
        packed[:, :, 3, :] = lane_valid.reshape(n_calls, spc, m)
        packed[:, :, 4, :] = winner.reshape(n_calls, spc, m)
        return packed, n

    def pack_wesc(self, ev: EventBatch, steps_per_call: int | None = None):
        """Equal-stamp write escapes for the derived-written device path.

        Returns (wesc int32 [n_calls, spc, P, E] phase-local lane indices
        with sentinel mp for unused slots, ok bool [n_calls]). A call
        whose escapes fit ships `wesc` with its batch dict and skips the
        epoch scatter on device (`written = t_surf != t_pre` patched by
        these lanes); ok=False calls (a phase overflowed E) must use the
        epoch-scatter path. Advances the engine's host stamp mirror, so
        call it exactly once per packed stream, in stream order.
        """
        cfg = self.cfg
        m = cfg.chunk_size
        P = cfg.sub_phases
        mp = m // P
        E = _W_ESCAPES
        W, H = cfg.width, cfg.height
        WH = W * H
        n = len(ev)
        if self._t0 is None and n:
            self._t0 = np.uint32(ev.t[0])
        spc = steps_per_call or cfg.steps_per_scan
        per_call = m * spc
        n_calls = max(1, -(-n // per_call))
        if self._last_stamp is None:
            # legacy lazy path (direct state assignment without
            # place_state): fetch the mirror from the device state
            self._last_stamp = np.ascontiguousarray(
                np.asarray(self.state.t_surf)[:W, :H]).reshape(-1).copy()
        last = self._last_stamp
        x = np.clip(ev.x.astype(np.int64), 0, W - 1)
        y = np.clip(ev.y.astype(np.int64), 0, H - 1)
        flat = np.full(n_calls * per_call, WH, dtype=np.int64)
        flat[:n] = x * H + y
        t1 = np.zeros(n_calls * per_call, dtype=np.int32)
        t1[:n] = ((ev.t.astype(np.uint32) - self._t0 + np.uint32(1))
                  ).view(np.int32)
        flat = flat.reshape(n_calls, spc, P, mp)
        t1 = t1.reshape(n_calls, spc, P, mp)
        wesc = np.full((n_calls, spc, P, E), mp, dtype=np.int32)
        ok = np.ones(n_calls, dtype=bool)
        lanes = np.arange(mp, dtype=np.int64)
        seen = np.empty(WH + 1, dtype=np.int64)
        for c in range(n_calls):
            for s in range(spc):
                for p in range(P):
                    f = flat[c, s, p]
                    tp = t1[c, s, p]
                    seen[f] = lanes
                    final = (seen[f] == lanes) & (f < WH)
                    ff = f[final]
                    eq = tp[final] == last[ff]    # vs PRE-phase value
                    last[ff] = tp[final]
                    el = lanes[final][eq]
                    if el.size > E:
                        ok[c] = False             # keep `last` advancing
                    else:
                        wesc[c, s, p, :el.size] = el
        return wesc, ok

    def pack_r2(self, ev: EventBatch, steps_per_call: int | None = None):
        """Rank-2 lane data for the center-correction pass, pre-gathered.

        Returns (flags u8 [n_calls, spc, m], centers i32 [n_calls, spc,
        W, H]) with B = cfg.center_correction: per micro-step, the
        second-latest event at each pixel within its plane-fit group,
        deduped per (pixel, step) keeping the LATEST occurrence (one
        center surface per chunk holds one stamp per pixel) and capped
        at the latest B. `flags` marks the corrected lanes (the
        merged-table assembly's per-lane table select); `centers` IS the
        chunk's stamp1 center surface, built host-side so the device
        spends no per-lane gather/scatter work at all on the rank-2 data
        (the on-device index formulation measured ~0.9 ms per
        131072-chunk; the map costs WH*4 B of pre-uploaded H2D instead).
        """
        cfg = self.cfg
        m = cfg.chunk_size
        P = cfg.sub_phases
        mp = m // P
        B = cfg.center_correction
        W, H = cfg.width, cfg.height
        WH = W * H
        n = len(ev)
        if self._t0 is None and n:
            self._t0 = np.uint32(ev.t[0])
        spc = steps_per_call or cfg.steps_per_scan
        per_call = m * spc
        n_calls = max(1, -(-n // per_call))
        x = np.clip(ev.x.astype(np.int64), 0, W - 1)
        y = np.clip(ev.y.astype(np.int64), 0, H - 1)
        flat = np.full(n_calls * per_call, WH, dtype=np.int64)
        flat[:n] = x * H + y
        t1 = np.zeros(n_calls * per_call, dtype=np.int32)
        t1[:n] = ((ev.t.astype(np.uint32) - self._t0 + np.uint32(1))
                  ).view(np.int32)
        flat = flat.reshape(n_calls * spc, P, mp)
        t1 = t1.reshape(n_calls * spc, P * mp)
        flags = np.zeros((n_calls * spc, m), dtype=np.uint8)
        centers = np.zeros((n_calls * spc, WH), dtype=np.int32)
        lanes_mp = np.arange(mp, dtype=np.int64)
        seen = np.empty(WH + 1, dtype=np.int64)
        for s in range(n_calls * spc):
            cand = []
            for p in range(P):
                f = flat[s, p]
                seen[f] = lanes_mp
                final = seen[f] == lanes_mp
                nf = ~final & (f < WH)
                f2, l2 = f[nf], lanes_mp[nf]
                if f2.size:
                    seen[f2] = l2
                    r2 = seen[f2] == l2     # last among non-final lanes
                    cand.append((l2[r2] + p * mp, f2[r2]))
            if cand:
                c = np.concatenate([a for a, _ in cand])
                fc = np.concatenate([b for _, b in cand])
                seen[fc] = np.arange(c.size)
                keep = seen[fc] == np.arange(c.size)   # latest per pixel
                c = c[keep][-B:]
                fc = fc[keep][-B:]
                flags[s, c] = 1
                centers[s, fc] = t1[s, c]
        return (flags.reshape(n_calls, spc, m),
                centers.reshape(n_calls, spc, W, H))

    def pack2(self, ev: EventBatch, steps_per_call: int | None = None):
        """Delta-coded 4 B/event repack of the compact layout.

        Returns (packed, aux, n): int32 [n_calls, spc, 1, m] words
        (flat idx | winner << ib | stamp-delta << ib+1, with ib the
        geometry-derived index width - compact2_bits) and aux = (bases
        int32 [n_calls, spc] per-step first stamps, escapes int32
        [n_calls, spc, 2, E] oversized-delta (lane, true delta) pairs) -
        halving the compact layout's H2D bytes (the e2e lane is
        wire-bound, bench.py). Deltas past the field width escape-code
        exactly (up to E per micro-step); `aux` is None and `packed` the
        compact/5-row fallback from pack() only when a step overflows
        the escape budget or the sensor exceeds 2^23 pixels - exact
        stamps always win over wire size.
        """
        packed, n = self.pack(ev, steps_per_call=steps_per_call,
                              compact=True)
        ib, db = compact2_bits(self.cfg)
        if packed.shape[2] != 2 or db < 8:
            return packed, None, n
        E = _C2_ESCAPES
        pu = packed.view(np.uint32)
        word1 = pu[:, :, 0, :]
        t = pu[:, :, 1, :]
        n_calls, spc, m = t.shape
        dt = t.copy()
        dt[:, :, 1:] -= t[:, :, :-1]
        dt[:, :, 0] = 0
        escapes = np.empty((n_calls, spc, 2, E), np.int32)
        escapes[:, :, 0, :] = m           # sentinel lane: unused slot
        escapes[:, :, 1, :] = 0
        over = dt > np.uint32((1 << db) - 1)   # incl. wrapped negatives
        if over.any():
            cnt = over.sum(axis=2)
            if cnt.max() > E:
                return packed, None, n
            for c, s in zip(*np.nonzero(cnt)):
                lanes = np.nonzero(over[c, s])[0]
                escapes[c, s, 0, :lanes.size] = lanes
                escapes[c, s, 1, :lanes.size] = dt[c, s, lanes].view(np.int32)
            dt = np.where(over, np.uint32(0), dt)
        win = (word1 >> np.uint32(30)) & np.uint32(1)
        flat = word1 & np.uint32(0x3FFFFFFF)
        word2 = (flat | (win << np.uint32(ib))
                 | (dt << np.uint32(ib + 1))).view(np.int32)
        bases = np.ascontiguousarray(t[:, :, 0]).view(np.int32)
        return word2[:, :, None, :], (bases, escapes), n

    def _unpack_outputs(self, out_blocks, ev: EventBatch, n: int) -> FlowOutput:
        """Decode wire blocks [(main i32 [steps,C,m], aux u8 [steps,m])]
        into the 11-column FlowOutput.

        The flow components cross the wire; the magnitude/angle columns
        (R/Theta local and true, vFlow.cpp:370-396) are derived here with
        f32 numpy math - the same IEEE ops the device used to apply, so
        chunk-1 parity against the reference semantics is preserved.
        Invalid lanes keep their raw (possibly NaN) vx/vy and zeros
        elsewhere (vFlow.cpp:390-395): the true components arrive
        pre-gated to 0 and the local R/Theta are masked by the valid bit.
        """
        cfg = self.cfg
        if cfg.wire == "sparse":
            # blocks are (aux u8 [steps, m], present-lane f16 vx/vy words,
            # valid-lane f16 true words) - re-expand the payloads to lane
            # order (absent lanes are exactly 0 by construction, see
            # _sparse_pack_outputs) and clear the present bit so the
            # scale decode below sees the plain aux encoding
            mains, auxs = [], []
            for a, pp, pv in out_blocks:
                af = np.asarray(a).reshape(-1)
                vxw = np.zeros(af.size, np.int32)
                vxw[(af & 0x40) != 0] = pp
                tfw = np.zeros(af.size, np.int32)
                tfw[(af & 0x80) != 0] = pv
                mains.append(np.stack([vxw, tfw]))
                auxs.append(af & np.uint8(0xBF))
            main = np.concatenate(mains, axis=1)[:, :n]
            aux = np.concatenate(auxs)[:n]
        else:
            C = wire_n_main_rows(cfg)
            main = np.concatenate(
                [np.asarray(mo).transpose(1, 0, 2).reshape(C, -1)
                 for mo, _ in out_blocks], axis=1)[:, :n]
            aux = np.concatenate(
                [np.asarray(ao).reshape(-1) for _, ao in out_blocks])[:n]
        cols = decode_wire_columns(main, aux, cfg)
        t = (ev.t.astype(np.uint32) - self._t0).astype(np.uint32)
        return FlowOutput(
            x=ev.x.astype(np.int32),
            y=ev.y.astype(np.int32),
            t=t,
            pol=ev.pol.astype(np.int32),
            **cols,
        )

    # ---- drivers -----------------------------------------------------------
    # Concurrent D2H fetch streams: the remote-tunnel transport sustains
    # ~27 MB/s on one stream but ~50 MB/s on two (scripts/_prof_wire.py),
    # and uploads overlap downloads (full duplex), so process() drains
    # outputs on a small thread pool while the main thread keeps packing
    # and dispatching the next calls.
    _FETCH_THREADS = 6
    # inline (thread-less) mode: max scan calls dispatched ahead of the
    # fetch cursor, bounding resident per-call output buffers in HBM
    _DISPATCH_AHEAD = 4
    # target events per scan call for the streaming pipeline: large chunks
    # split into several in-flight calls so D2H fetches overlap the next
    # call's upload + compute (small chunks already batch steps_per_scan
    # micro-steps per call and are unaffected). ~128K events per call
    # measured best end-to-end through the remote link (256K units were
    # no better - transfer-size gains lose to having fewer calls in
    # flight; the lane's run-to-run jitter is ~20% either way)
    _PIPELINE_EVENTS = 131072

    def process(self, ev: EventBatch,
                steps_per_call: int | None = None) -> FlowOutput:
        """Process an event stream (or a continuation of one).

        Calls are dispatched asynchronously; each call's output arrays are
        handed to fetch threads as soon as they are in flight, so D2H
        transfers overlap both the next call's upload and its compute.
        """
        n = len(ev)
        if n == 0:
            return _empty_output()
        sparse = self.cfg.wire == "sparse"
        if steps_per_call is None:
            # sparse-wire calls cost one tunnel round trip each (counts +
            # payload rider share one fetch), so they use 2x pipeline
            # units: the measured sweet spot between per-call latency
            # amortization and calls-in-flight depth (round-5 sweep:
            # 2x at 6 fetch threads beat 1x and 4x)
            unit = self._PIPELINE_EVENTS * (2 if sparse else 1)
            steps_per_call = max(1, min(
                self.cfg.steps_per_scan,
                -(-unit // self.cfg.chunk_size)))
        base_dispatch = type(self)._dispatch is FlowEngine._dispatch
        if sparse and not base_dispatch:
            raise ValueError(
                "wire='sparse' requires the base (unsharded) engine "
                "dispatch; sharded engines ship the dense f16/f32 wire")
        # the delta-coded 4 B/event upload applies only to engines running
        # the base (unsharded) dispatch: sharded subclasses partition the
        # chunk array and would need matching specs for the base vector
        aux2 = None
        if self._compact_ok and base_dispatch:
            packed, aux2, n = self.pack2(ev, steps_per_call=steps_per_call)
        else:
            packed, n = self.pack(ev, steps_per_call=steps_per_call,
                                  compact=self._compact_ok)
        # derived-written mode (base dense engines): ship the equal-stamp
        # escape lanes so micro_step can skip the epoch scatter; calls
        # whose escapes overflow fall back to the epoch path (w_ok)
        wesc = w_ok = None
        if base_dispatch and self.cfg.use_dense:
            wesc, w_ok = self.pack_wesc(ev, steps_per_call=steps_per_call)
        r2 = None
        if base_dispatch and self.cfg.center_correction:
            r2 = self.pack_r2(ev, steps_per_call=steps_per_call)

        def dispatch(c):
            if base_dispatch:
                if aux2 is not None:
                    bases, escapes = aux2
                    batch = {"ev": jnp.asarray(packed[c]),
                             "base": jnp.asarray(bases[c]),
                             "esc": jnp.asarray(escapes[c])}
                else:
                    batch = {"ev": jnp.asarray(packed[c])}
                if wesc is not None and w_ok[c]:
                    batch["wesc"] = jnp.asarray(wesc[c])
                if r2 is not None:
                    batch["r2f"] = jnp.asarray(r2[0][c])
                    batch["r2c"] = jnp.asarray(r2[1][c])
                fn = scan_chunk_sparse if sparse else scan_chunk
                self.state, out = fn(self.state, batch, self.cfg)
            else:
                self.state, out = self._dispatch(jnp.asarray(packed[c]))
            return out

        if self._FETCH_THREADS <= 0:
            # deterministic single-thread mode (multi-process engines:
            # _fetch may issue collectives, which every process must
            # issue in one global order relative to the scan dispatches
            # - a fetch worker thread interleaves them differently per
            # process and can deadlock, ADVICE.md r3). Dispatch runs at
            # most _DISPATCH_AHEAD calls ahead of the fetch cursor so
            # only a bounded number of per-call output buffers is ever
            # resident in HBM (ADVICE.md r4: dispatching the whole
            # sequence first could OOM large process() calls), while the
            # single thread keeps the collective order identical across
            # processes.
            K = self._DISPATCH_AHEAD
            outs, blocks = [], []
            fetch1 = self._fetch_sparse if sparse else (
                lambda out: tuple(self._fetch(o) for o in out))
            for c in range(packed.shape[0]):
                outs.append(dispatch(c))
                if len(outs) > K:
                    blocks.append(fetch1(outs.pop(0)))
            blocks.extend(fetch1(out) for out in outs)
            return self._unpack_outputs(blocks, ev, n)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self._FETCH_THREADS) as pool:
            if sparse:
                # one future per call: the payload slice fetches depend on
                # that call's counts, so they stay on one worker
                futs = [pool.submit(self._fetch_sparse, dispatch(c))
                        for c in range(packed.shape[0])]
                blocks = [f.result() for f in futs]
            else:
                futs = [tuple(pool.submit(self._fetch, o)
                              for o in dispatch(c))
                        for c in range(packed.shape[0])]
                blocks = [tuple(f.result() for f in fs) for fs in futs]
        return self._unpack_outputs(blocks, ev, n)

    @staticmethod
    def _bucket_up(k, lo, hi):
        b = lo
        while b < k:
            b *= 2
        return min(b, hi)

    def _fetch_sparse(self, out):
        """Fetch one call's sparse wire block: (aux u8, pay_p, pay_v).

        The remote tunnel charges ~40-70 ms latency per fetch (measured,
        scripts/_prof_e2e_sparse.py), so the lane is round-trip-bound,
        not bandwidth-bound: the aux buffer carries the counts AND a
        fixed payload rider (_sparse_pack_outputs), so the typical call
        costs ONE fetch; only calls whose payload exceeds the rider pay
        a bounded tail fetch (its start is the fixed rider size, so the
        compiled-slice set stays small).
        """
        import time as _time
        t0 = _time.perf_counter()
        aux_plus, pay = out
        N2 = pay.shape[0]
        # rider size derived from the traced SHAPES, never the module
        # global: aux_plus = N aux bytes + 8 count bytes + 4R rider bytes
        # with N = N2 / 2, so a config traced under a different
        # _SPARSE_RIDER_LANES value still decodes its own layout
        # (ADVICE.md r4)
        R = (aux_plus.shape[0] - N2 // 2 - 8) // 4
        a = np.asarray(aux_plus)
        rider = a[a.size - 4 * R:].view(np.int32)
        cp, cv = (int(v) for v in
                  a[a.size - 4 * R - 8:a.size - 4 * R].view(np.int32))
        a = a[:a.size - 4 * R - 8]
        k = cp + cv
        n_fetch = 1
        if k > R:
            end = self._bucket_up(k, 2 * R, N2)
            both = np.concatenate([rider, np.asarray(pay[R:end])])[:k]
            n_fetch = 2
        else:
            both = rider[:k]
        with self._fetch_lock:
            self.fetch_stats["fetches"] += n_fetch
            self.fetch_stats["seconds"] += _time.perf_counter() - t0
        return a, both[:cp], both[cp:cp + cv]

    def _fetch(self, o):
        """Device->host fetch of one output array (subclass hook)."""
        import time as _time
        t0 = _time.perf_counter()
        out = np.asarray(o)
        with self._fetch_lock:
            self.fetch_stats["fetches"] += 1
            self.fetch_stats["seconds"] += _time.perf_counter() - t0
        return out

    def process_resident(self, ev: EventBatch):
        """Upload the whole stream once and run it as one device program.

        Returns (fn, device_chunk): `fn()` executes every micro-step in a
        single dispatch and returns the device-resident outputs. Used by the
        benchmark to time pure processing, matching the reference's timed
        region (vFlow.cpp:214-423), which also excludes file I/O. Base
        dense engines run the epoch-less derived-written dict path (and
        the correction pass when configured), like process().
        """
        spc = max(1, -(-len(ev) // self.cfg.chunk_size))
        packed, n = self.pack(ev, steps_per_call=spc)
        base_dispatch = type(self)._dispatch is FlowEngine._dispatch
        if base_dispatch and self.cfg.use_dense:
            batch = {"ev": jnp.asarray(packed[0])}
            wesc, ok = self.pack_wesc(ev, steps_per_call=spc)
            if ok[0]:
                batch["wesc"] = jnp.asarray(wesc[0])
            if self.cfg.center_correction:
                r2f, r2c = self.pack_r2(ev, steps_per_call=spc)
                batch["r2f"] = jnp.asarray(r2f[0])
                batch["r2c"] = jnp.asarray(r2c[0])
            chunk = jax.device_put(batch)

            def fn():
                new_state, out = scan_chunk(self.state, chunk, self.cfg)
                self.state = new_state
                return out

            return fn, n
        chunk = jax.device_put(jnp.asarray(packed[0]))

        def fn():
            new_state, out = self._dispatch(chunk)
            self.state = new_state
            return out

        return fn, n


def decode_wire_columns(main, aux, cfg: FlowConfig) -> dict:
    """Decode wire rows into the 7 per-lane output columns.

    `main` is int32 [C, k] (C = wire_n_main_rows; f16 mode packs each
    component pair into one i32), `aux` u8 [k]. Returns the dict of
    numpy columns {r_true, theta_true, vx, vy, r_local, theta_local,
    scale} - the magnitude/angle columns (vFlow.cpp:370-396) are pure
    f32 functions of the shipped components and derive here. Invalid
    lanes keep their raw (possibly NaN) vx/vy and zeros elsewhere
    (vFlow.cpp:390-395); the true components arrive pre-gated to 0.
    """
    if cfg.wire != "f32":
        p0 = main[0].view(np.uint32)
        p1 = main[1].view(np.uint32)
        vx = (p0 & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float32)
        vy = (p0 >> 16).astype(np.uint16).view(np.float16).astype(np.float32)
        tvx = (p1 & 0xFFFF).astype(np.uint16).view(np.float16).astype(np.float32)
        tvy = (p1 >> 16).astype(np.uint16).view(np.float16).astype(np.float32)
    else:
        vx = main[0].view(np.float32)
        vy = main[1].view(np.float32)
        tvx = main[2].view(np.float32)
        tvy = main[3].view(np.float32)
    valid = (aux & 0x80) != 0
    scale = (aux & 0x7F).astype(np.int32) * cfg.window_jump
    with np.errstate(invalid="ignore", over="ignore"):
        r_true = np.sqrt(tvx * tvx + tvy * tvy)
        theta_true = np.arctan2(tvy, tvx)
        length = np.sqrt(vx * vx + vy * vy)
        theta_l = np.arctan2(vy, vx)
    zero = np.float32(0.0)
    return dict(
        r_true=r_true,
        theta_true=theta_true,
        vx=vx,
        vy=vy,
        r_local=np.where(valid, length, zero),
        theta_local=np.where(valid, theta_l, zero),
        scale=scale,
    )


def _empty_output() -> FlowOutput:
    z = np.zeros(0)
    zi = np.zeros(0, dtype=np.int32)
    return FlowOutput(zi, zi, np.zeros(0, dtype=np.uint32), zi,
                      z, z, z, z, z, z, zi)
