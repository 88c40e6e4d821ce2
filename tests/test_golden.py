"""Golden tests: the engine vs the float64 serial oracle.

SURVEY.md SS4 item (1): run the reference semantics on small synthetic event
streams and compare all 11 output columns within AEE/angular tolerance.
chunk_size=1 must reproduce the oracle almost exactly (f32 vs f64 only);
larger chunks must stay within the BASELINE.json budget
(AEE < 0.5 px/ms, angular error < 5 deg).
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_random_events, synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.oracle import run_oracle


def _true_vectors(out):
    return np.stack(
        [out.r_true * np.cos(out.theta_true),
         out.r_true * np.sin(out.theta_true)], axis=1
    )


def _angular_err_deg(a, b, mask):
    d = np.angle(np.exp(1j * (a.theta_true[mask] - b.theta_true[mask])))
    return np.degrees(np.abs(d))


@pytest.fixture(scope="module")
def bar_events():
    return synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=1,
    )[:600]


@pytest.fixture(scope="module")
def bar_oracle(bar_events):
    cfg = FlowConfig(width=64, height=64)
    return run_oracle(bar_events, cfg)


@pytest.mark.parametrize("dense", [False, True])
def test_serial_mode_matches_oracle(bar_events, bar_oracle, dense):
    cfg = FlowConfig(width=64, height=64, chunk_size=1, steps_per_scan=32,
                     use_dense=dense)
    got = FlowEngine(cfg).process(bar_events)
    ref = bar_oracle

    ref_valid = ref.r_local > 0
    got_valid = got.r_local > 0
    np.testing.assert_array_equal(ref_valid, got_valid)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_array_equal(ref.t, got.t)

    m = ref_valid
    np.testing.assert_allclose(got.r_local[m], ref.r_local[m], rtol=1e-4)
    np.testing.assert_allclose(got.r_true[m], ref.r_true[m], rtol=1e-4)
    assert _angular_err_deg(ref, got, m).max() < 0.01


@pytest.mark.parametrize("dense", [False, True])
def test_serial_mode_matches_oracle_random_stream(dense):
    """Stress: random events incl. duplicate pixels, invalid fits, borders."""
    ev = synthetic_random_events(800, width=48, height=48, rate_hz=3e6, seed=9)
    cfg = FlowConfig(width=48, height=48, chunk_size=1, steps_per_scan=32,
                     use_dense=dense)
    ref = run_oracle(ev, cfg)
    got = FlowEngine(cfg).process(ev)

    ref_valid = ref.r_local > 0
    got_valid = got.r_local > 0
    # f32 vs f64 may flip knife-edge det/inlier cases on noise-only fits
    flips = int((ref_valid != got_valid).sum())
    assert flips <= len(ev) * 0.01
    m = ref_valid & got_valid
    if m.any():
        np.testing.assert_allclose(got.r_local[m], ref.r_local[m],
                                   rtol=1e-3, atol=1e-3)
        assert _angular_err_deg(ref, got, m).max() < 0.5
        same_scale = (ref.scale[m] == got.scale[m]).mean()
        assert same_scale > 0.98


def test_ground_truth_flow_convention(bar_oracle):
    """A bar translating in +x at v px/s reports (vx=0, vy=v): the reference
    uses atan2(a, b) (x-gradient first), a deliberate 90-degree convention
    (vFlow.cpp:1375)."""
    ref = bar_oracle
    m = ref.r_local > 0
    assert m.mean() > 0.5
    # median local flow direction ~ +y (90 deg), speed ~ 1000 px/s
    med_theta = np.degrees(np.median(ref.theta_local[m]))
    assert abs(med_theta - 90.0) < 15.0
    med_speed = np.median(ref.r_local[m])
    assert abs(med_speed - 1000) / 1000 < 0.35


@pytest.mark.parametrize("chunk_size", [64, 256])
@pytest.mark.parametrize("dense", [False, True])
def test_chunked_mode_within_budget(bar_events, bar_oracle, chunk_size, dense):
    cfg = FlowConfig(width=64, height=64, chunk_size=chunk_size,
                     steps_per_scan=4, use_dense=dense)
    got = FlowEngine(cfg).process(bar_events)
    ref = bar_oracle

    ref_valid = ref.r_local > 0
    got_valid = got.r_local > 0
    assert (ref_valid != got_valid).mean() < 0.05

    m = ref_valid & got_valid
    # BASELINE.json budget: AEE < 0.5 px/ms = 500 px/s, angular < 5 deg
    aee = np.linalg.norm(
        _true_vectors(ref)[m] - _true_vectors(got)[m], axis=1
    ).mean()
    assert aee < 500.0
    assert _angular_err_deg(ref, got, m).mean() < 5.0


@pytest.mark.parametrize("dense", [False, True])
def test_serial_mode_matches_oracle_past_2e31(dense):
    """Streams older than ~35.8 min: normalized stamps exceed 2^31.

    stamp1 values then wrap negative as int32; every stamp comparison must
    run in the unsigned domain (ADVICE round 1: signed compares corrupted
    eligibility/clamping for the entire second half of the uint32 timeline).
    The float64 oracle is immune (stamps are exact doubles), so agreement
    here is independent evidence.
    """
    bar = synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=3,
    )[:500]
    # one anchor event latches t0; the bar then plays out straddling 2^31
    shift = np.uint32(2**31 - 15000)
    ev = type(bar)(
        x=np.concatenate([[5], bar.x]).astype(np.int32),
        y=np.concatenate([[5], bar.y]).astype(np.int32),
        t=np.concatenate([[np.uint32(5)],
                          bar.t + shift + np.uint32(5)]).astype(np.uint32),
        pol=np.concatenate([[1], bar.pol]).astype(np.int32),
    )
    assert int(ev.t[-1] - ev.t[0]) > 2**31  # really crosses the boundary

    cfg = FlowConfig(width=64, height=64, chunk_size=1, steps_per_scan=32,
                     use_dense=dense)
    ref = run_oracle(ev, cfg)
    got = FlowEngine(cfg).process(ev)

    ref_valid = ref.r_local > 0
    got_valid = got.r_local > 0
    assert ref_valid.sum() > 100  # the fixture produces real flow
    np.testing.assert_array_equal(ref_valid, got_valid)
    np.testing.assert_array_equal(ref.scale, got.scale)
    m = ref_valid
    np.testing.assert_allclose(got.r_local[m], ref.r_local[m], rtol=1e-4)
    np.testing.assert_allclose(got.r_true[m], ref.r_true[m], rtol=1e-4)
    assert _angular_err_deg(ref, got, m).max() < 0.01


@pytest.mark.parametrize("wire", ["f32", "f16"])
def test_chunked_accuracy_operating_point(wire):
    """Pin the chunked-semantics error at the benchmark operating point.

    Parametrized over both wire formats: the bench ships the f16 wire
    (9 B/event, FlowConfig.wire), so the operating-point budget must hold
    through its ~0.05% component quantization too.

    The headline bench runs chunk 131072 with sub_phases=2 at ~4 M ev/s:
    causality granularity 65536, i.e. a causal group spans ~33 freshness
    windows (KILL_OLD_FLOW_TIME=500 us, vFlow.cpp:961). This fixture
    reproduces that regime CPU-sized: a
    64x64 sensor, ~30 K ev/s structured stream (3 staggered translating
    bars + 40% background noise), chunk_size=512 -> ~17.3 ms per chunk
    = ~34.6 freshness windows, *harsher* than the operating point.
    Thresholds pin the measured frontier (ACCURACY.md) with margin, so a
    regression in intra-chunk causality (the event-serial contract,
    vFlow.cpp:223-414) fails CI rather than silently blowing the
    validated accuracy budget.
    """
    W = H = 64
    parts = []
    for k, t0 in enumerate((1000, 40000, 80000)):
        b = synthetic_translating_bar(width=W, height=H, bar_len=24,
                                      speed_px_per_sec=900.0,
                                      duration_us=38000, jitter_us=40,
                                      seed=k, t0_us=t0)
        parts.append((b.x, b.y, b.t, b.pol))
    n_bar = sum(len(p[0]) for p in parts)
    t_end = max(int(p[2][-1]) for p in parts)
    rng = np.random.default_rng(7)
    n_bg = int(n_bar * 0.4)
    parts.append((rng.integers(0, W, n_bg).astype(np.int32),
                  rng.integers(0, H, n_bg).astype(np.int32),
                  np.sort(rng.integers(1000, t_end, n_bg)).astype(np.uint32),
                  np.ones(n_bg, dtype=np.int32)))
    from farms_tpu.events.io import EventBatch
    x = np.concatenate([p[0] for p in parts]).astype(np.int32)
    y = np.concatenate([p[1] for p in parts]).astype(np.int32)
    t = np.concatenate([p[2] for p in parts])
    pol = np.concatenate([p[3] for p in parts]).astype(np.int32)
    order = np.argsort(t, kind="stable")
    ev = EventBatch(x[order], y[order], t[order].astype(np.uint32),
                    pol[order])

    chunk = 512
    rate = len(ev) / (int(ev.t[-1]) - int(ev.t[0])) * 1e6
    ratio = chunk / rate * 1e6 / 500.0
    assert ratio >= 32.8, f"fixture ratio {ratio:.1f} weaker than op point"

    cfg = FlowConfig(width=W, height=H, chunk_size=chunk, steps_per_scan=4,
                     wire=wire)
    orc = run_oracle(ev, cfg)
    got = FlowEngine(cfg).process(ev)

    ov = orc.r_local > 0
    gv = np.asarray(got.r_local) > 0
    agreement = float((ov == gv).mean())
    both = ov & gv
    gt = _true_vectors(got)[both]
    ot = _true_vectors(orc)[both]
    aee_px_ms = float(np.mean(np.linalg.norm(gt - ot, axis=1)) / 1e3)
    dot = (gt * ot).sum(1)
    den = np.linalg.norm(gt, axis=1) * np.linalg.norm(ot, axis=1)
    ang = np.degrees(np.arccos(np.clip(dot / np.maximum(den, 1e-30), -1, 1)))
    scale_match = float(
        (np.asarray(got.scale)[both] == orc.scale[both]).mean())

    # measured (round 3): agreement .964, AEE .037 px/ms, ang mean 3.18,
    # p95 5.37, scale match .41 - thresholds leave ~15-30% margin
    assert agreement >= 0.94, agreement
    assert aee_px_ms < 0.10, aee_px_ms
    assert float(ang.mean()) < 4.0, ang.mean()
    assert float(np.percentile(ang, 95)) < 6.5, np.percentile(ang, 95)
    assert scale_match >= 0.35, scale_match


def test_streaming_continuation_equals_one_shot(bar_events):
    """process() called in pieces must equal one call (state carry)."""
    cfg = FlowConfig(width=64, height=64, chunk_size=32, steps_per_scan=2)
    one = FlowEngine(cfg).process(bar_events)
    eng = FlowEngine(cfg)
    parts = [eng.process(bar_events[:256]), eng.process(bar_events[256:])]
    # chunk boundaries differ (padding at the split), so compare only the
    # first segment, which is chunk-aligned (256 = 4 calls of 64)
    np.testing.assert_allclose(one.r_true[:256], parts[0].r_true, rtol=1e-6)
    np.testing.assert_array_equal(one.scale[:256], parts[0].scale)


def test_aperture_sub_phases_semantics(bar_events):
    """Decoupled aperture phasing (FlowConfig.aperture_sub_phases):
    AP == P must be identical to the coupled default, and finer AP must
    leave local-stage results (validity, vx/vy) bit-identical while only
    the pooled true-flow/scale columns move."""
    cfg0 = FlowConfig(width=64, height=64, chunk_size=256, steps_per_scan=4,
                      sub_phases=2)
    cfg_same = FlowConfig(width=64, height=64, chunk_size=256,
                          steps_per_scan=4, sub_phases=2,
                          aperture_sub_phases=2)
    cfg_fine = FlowConfig(width=64, height=64, chunk_size=256,
                          steps_per_scan=4, sub_phases=2,
                          aperture_sub_phases=8)
    a = FlowEngine(cfg0).process(bar_events)
    b = FlowEngine(cfg_same).process(bar_events)
    c = FlowEngine(cfg_fine).process(bar_events)
    for col in ("vx", "vy", "r_local", "theta_local", "r_true", "scale"):
        np.testing.assert_array_equal(getattr(a, col), getattr(b, col))
    # local stage untouched by finer aperture groups
    np.testing.assert_array_equal(a.vx, c.vx)
    np.testing.assert_array_equal(a.vy, c.vy)
    np.testing.assert_array_equal(a.r_local, c.r_local)
    assert len(c) == len(a)

    with pytest.raises(ValueError):
        FlowConfig(chunk_size=256, sub_phases=4, aperture_sub_phases=6)
    with pytest.raises(ValueError):
        FlowConfig(chunk_size=256, sub_phases=4, aperture_sub_phases=3)


def test_causal_snapshots_semantics(bar_events):
    """Multi-snapshot causal visibility (FlowConfig.causal_snapshots):

    1. On a chunk where no pixel fires twice, every snapshot of a pixel
       equals its pre or post value, so S > 1 must be bit-identical to
       S = 1 (the fold degenerates).
    2. On a rewrite-heavy stream, S = 4 must agree with the event-serial
       engine (chunk 1) on at least as many validity rows as S = 1 -
       intra-chunk rewrites are exactly what snapshots recover.
    """
    import pytest

    # 1: distinct pixels per chunk -> exact S-invariance
    rng = np.random.default_rng(11)
    m = 64
    n = 4 * m
    pix = rng.choice(64 * 64, size=n, replace=False)
    ev = __import__("farms_tpu.events.io", fromlist=["EventBatch"]).EventBatch(
        (pix // 64).astype(np.int32), (pix % 64).astype(np.int32),
        np.sort(rng.integers(1000, 60000, n)).astype(np.uint32),
        np.ones(n, np.int32))
    cfg1 = FlowConfig(width=64, height=64, chunk_size=m, causal_snapshots=1)
    cfg4 = FlowConfig(width=64, height=64, chunk_size=m, causal_snapshots=4)
    a = FlowEngine(cfg1).process(ev)
    b = FlowEngine(cfg4).process(ev)
    for col in ("vx", "vy", "r_true", "r_local", "scale"):
        np.testing.assert_array_equal(getattr(a, col), getattr(b, col),
                                      err_msg=f"rewrite-free {col}")

    # 2: rewrite-heavy stream (few pixels, many rewrites per chunk)
    n2 = 512
    xs = rng.integers(10, 26, n2).astype(np.int32)
    ys = rng.integers(10, 26, n2).astype(np.int32)
    ts = np.sort(rng.integers(1000, 120000, n2)).astype(np.uint32)
    ev2 = type(ev)(xs, ys, ts, np.ones(n2, np.int32))
    serial = FlowEngine(FlowConfig(width=64, height=64,
                                   chunk_size=1)).process(ev2)
    sv = serial.r_local > 0
    cfgs1 = FlowConfig(width=64, height=64, chunk_size=256,
                       causal_snapshots=1)
    cfgs4 = FlowConfig(width=64, height=64, chunk_size=256,
                       causal_snapshots=4)
    m1 = ((FlowEngine(cfgs1).process(ev2).r_local > 0) == sv).sum()
    m4 = ((FlowEngine(cfgs4).process(ev2).r_local > 0) == sv).sum()
    assert m4 >= m1, (m4, m1)

    with pytest.raises(ValueError):
        FlowConfig(chunk_size=256, sub_phases=2, causal_snapshots=3)
    with pytest.raises(ValueError):
        FlowConfig(chunk_size=256, causal_snapshots=2, use_dense=False)


def test_coarse_aperture_semantics(bar_events):
    """Coarse aperture phasing (aperture_sub_phases a DIVISOR of
    sub_phases): the plane-fit lanes stay bit-identical to the uniform
    fine-phased run (validity comes from the plane fit alone), and the
    pooled columns match an exact oracle - one dense_aperture pass over
    the flow surfaces left by ALL the aperture group's plane-fit groups
    (flow-surface evolution is aperture-independent, so a uniform run's
    final state provides those surfaces)."""
    import jax.numpy as jnp

    from farms_tpu.events.io import EventBatch
    from farms_tpu.ops.dense_flow import dense_aperture, onehot_gather
    from farms_tpu.pipeline.engine import micro_step
    from farms_tpu.state.surfaces import init_state

    W = H = 64
    m = 256
    # huge kill window: in coarse mode the staleness kill runs at
    # aperture-group starts only (uniform sub_phases=A cadence), so a
    # mid-chunk kill would make the uniform run's state diverge; with
    # kills inert both evolutions are identical and the pooling oracle
    # is exact. The default-kill cadence is covered by the validity
    # assertions below (t_surf never sees kills) and the ACCURACY sweep.
    kill = 1 << 29
    cfg_u = FlowConfig(width=W, height=H, chunk_size=m, sub_phases=2,
                       kill_old_flow_time_us=kill)
    cfg_c = FlowConfig(width=W, height=H, chunk_size=m, sub_phases=2,
                       aperture_sub_phases=1, kill_old_flow_time_us=kill)

    eng = FlowEngine(cfg_u)
    packed, _ = eng.pack(bar_events[:m], steps_per_call=1)
    batch = jnp.asarray(packed[0, 0])

    st_u, out_u = micro_step(init_state(cfg_u), batch, cfg_u)
    st_c, out_c = micro_step(init_state(cfg_c), batch, cfg_c)

    # state evolution is identical (aperture never mutates state)
    np.testing.assert_array_equal(np.asarray(st_u.t_surf),
                                  np.asarray(st_c.t_surf))
    np.testing.assert_array_equal(np.asarray(st_u.flow_len),
                                  np.asarray(st_c.flow_len))

    # oracle: pooling once over the final flow surfaces, gathered for
    # every lane; local pairs from the uniform run's wire main row 0
    tvx, tvy, scale = dense_aperture(st_u.flow_len, st_u.flow_vx,
                                     st_u.flow_vy, cfg_u)
    xs, ys = batch[0], batch[1]
    tf = onehot_gather(jnp.stack([tvx, tvy, scale.astype(jnp.float32)]),
                       xs, ys, cfg_u.array_width, cfg_u.array_height)

    aux_c = np.asarray(out_c[1]).reshape(-1)
    aux_u = np.asarray(out_u[1]).reshape(-1)
    valid_c = (aux_c & 0x80) != 0
    # validity bit-identical to the uniform fine-phased run
    np.testing.assert_array_equal(valid_c, (aux_u & 0x80) != 0)
    # local vx/vy pair (f32 wire main rows 0-1) identical to uniform
    main_c = np.asarray(out_c[0])
    main_u = np.asarray(out_u[0])
    np.testing.assert_array_equal(main_c[:2], main_u[:2])
    # pooled columns == the one-pass oracle (gated, scrubbed)
    want_tvx = np.where(valid_c, np.asarray(tf[0]), 0.0).astype(np.float32)
    want_tvy = np.where(valid_c, np.asarray(tf[1]), 0.0).astype(np.float32)
    np.testing.assert_array_equal(main_c[2].view(np.float32), want_tvx)
    np.testing.assert_array_equal(main_c[3].view(np.float32), want_tvy)
    want_scale = np.where(valid_c,
                          np.asarray(tf[2]) // cfg_u.window_jump, 0)
    np.testing.assert_array_equal(aux_c & 0x7F, want_scale)
