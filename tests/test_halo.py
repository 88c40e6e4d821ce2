"""Explicit halo-exchange engine (parallel/halo.py) vs single device.

Runs on the virtual 8-device CPU mesh (conftest.py). Shard thickness must
cover the aperture halo (max_window + 1 rows), so these configs shrink
max_window rather than the sensor.
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.parallel.halo import HaloFlowEngine
from farms_tpu.pipeline.engine import FlowEngine


@pytest.fixture(scope="module")
def events():
    return synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=1,
    )[:512]


def _compare(cfg, events, n_dev):
    ref = FlowEngine(cfg).process(events)
    got = HaloFlowEngine(cfg, num_devices=n_dev).process(events)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_allclose(ref.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.theta_true, got.theta_true,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.r_local, got.r_local, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_halo_matches_single_device(events, n_dev):
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=10, use_pallas=False)
    _compare(cfg, events, n_dev)


def test_halo_filter5(events):
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     filter_size=5, max_window=10, use_pallas=False)
    _compare(cfg, events, 2)


def test_halo_multihop_thin_shards(events):
    """8 shards x 8 rows with an 11-row halo: 2 ring hops per side.

    This is the shard-thinner-than-halo regime that round 1 rejected
    (VERDICT.md item 5); exchange_halo now assembles the band from
    multiple ppermute hops.
    """
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=10, use_pallas=False)
    _compare(cfg, events, 8)


def test_halo_pads_indivisible_width(events):
    """width 66 over 4 shards pads the arrays to 68; outputs unchanged."""
    cfg = FlowConfig(width=66, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=10, use_pallas=False)
    _compare(cfg, events, 4)


def test_halo_default_geometry_eight_shards(events):
    """The round-1 impossible config: 8 shards at width 64... scaled to
    the real default aperture. max_window=50 means the 51-row halo spans
    7 of the 8-row shards - the deepest multi-hop case."""
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2,
                     max_window=50, use_pallas=False)
    _compare(cfg, events, 8)


def test_halo_engine_sub_phases_matches_base():
    """cfg.sub_phases must produce identical outputs on the halo engine
    and the single-device engine (same causal-group semantics)."""
    import numpy as np

    from farms_tpu.events.io import synthetic_translating_bar
    from farms_tpu.pipeline.engine import FlowEngine

    ev = synthetic_translating_bar(width=64, height=48, bar_len=16,
                                   duration_us=15000, jitter_us=10, seed=4)
    ev.y[:] = np.clip(ev.y, 0, 47)
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=4)
    a = FlowEngine(cfg).process(ev)
    b = HaloFlowEngine(cfg, num_devices=4).process(ev)
    np.testing.assert_array_equal(a.scale, b.scale)
    valid = a.r_local > 0
    assert valid.sum() > 50
    np.testing.assert_allclose(b.vx, a.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.r_true, a.r_true, rtol=1e-5, atol=1e-6)


def test_halo_engine_fidelity_shape_matches_base():
    """The fidelity-preset SHAPE (sub_phases=8, coarse aperture_sub_phases=2,
    causal_snapshots=2) on the halo engine matches the single-device engine
    exactly (VERDICT.md r4 item 4: snapshots + coarse pooling in
    halo_micro_step)."""
    import numpy as np

    from farms_tpu.events.io import synthetic_translating_bar
    from farms_tpu.pipeline.engine import FlowEngine

    ev = synthetic_translating_bar(width=64, height=48, bar_len=16,
                                   duration_us=15000, jitter_us=10, seed=4)
    ev.y[:] = np.clip(ev.y, 0, 47)
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=8, aperture_sub_phases=2,
                     causal_snapshots=2)
    a = FlowEngine(cfg).process(ev)
    b = HaloFlowEngine(cfg, num_devices=4).process(ev)
    np.testing.assert_array_equal(a.scale, b.scale)
    valid = a.r_local > 0
    assert valid.sum() > 50
    np.testing.assert_allclose(b.vx, a.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.vy, a.vy, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.r_local, a.r_local, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.r_true, a.r_true, rtol=1e-5, atol=1e-6)


def test_halo_band_exchanges_issued_before_pooling_collectives():
    """Overlap structure (VERDICT.md r4 item 5): halo_micro_step issues
    EVERY phase's time-surface band ppermute (int32 operands) before any
    flow-surface/integral collective (f32 ppermute / all_gather) exists
    in the program, so XLA's latency-hiding scheduler can overlap phase
    p+1's band exchange with phase p's stencil compute on real ICI."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    import functools

    from farms_tpu.parallel.halo import halo_micro_step
    from farms_tpu.state.surfaces import init_state

    cfg = FlowConfig(width=64, height=64, chunk_size=64, max_window=10,
                     sub_phases=4, use_pallas=False)
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("tx",))
    surf = P("tx", None)
    state_specs = type(init_state(cfg))(surf, surf, surf, surf, surf, P())
    step = jax.shard_map(
        functools.partial(halo_micro_step, cfg=cfg, n=n),
        mesh=mesh, in_specs=(state_specs, P(None, None)),
        out_specs=(state_specs, (P(None, "tx"), P("tx"))),
        check_vma=False)
    batch = jnp.zeros((5, cfg.chunk_size), jnp.int32)
    jaxpr = jax.make_jaxpr(step)(init_state(cfg), batch)

    def collect(jx, out, pos=None):
        pos = pos if pos is not None else [0]
        for eq in jx.eqns:
            if eq.primitive.name in ("ppermute", "all_gather"):
                out.append((pos[0], eq.primitive.name,
                            eq.invars[0].aval.dtype.name))
            pos[0] += 1
            for sub in eq.params.values():
                if hasattr(sub, "jaxpr"):      # ClosedJaxpr
                    collect(sub.jaxpr, out, pos)
                elif type(sub).__name__ == "Jaxpr":   # shard_map body
                    collect(sub, out, pos)
        return out

    colls = collect(jaxpr.jaxpr, [])
    band = [p for p, name, dt in colls
            if name == "ppermute" and dt == "int32"]
    pool = [p for p, name, dt in colls if dt == "float32"]
    assert band and pool
    assert max(band) < min(pool), (band, pool)


def test_halo_owner_sharded_upload_matches_base():
    """Owner-sharded batch path (VERDICT.md r4 item 6): each shard
    uploads ~1/n of the chunk (its own lanes, reordered host-side), no
    output psum, host reassembles stream order - outputs identical to
    the single-device engine."""
    import numpy as np

    from farms_tpu.events.io import EventBatch
    from farms_tpu.pipeline.engine import FlowEngine

    # four parallel translating bars, one per shard band, interleaved
    # event-by-event: every scatter sub-group spreads over all 4 shards
    # (a single bar concentrates each sub-group on one shard and
    # correctly falls back; see the overflow test)
    xs, ys, ts = [], [], []
    for step in range(12):
        for yy in range(10, 40):
            for b, x0 in enumerate((2, 18, 34, 50)):
                xs.append(x0 + step)
                ys.append(yy)
                ts.append(1000 + step * 400 + (yy - 10) * 2 + b)
    order = np.argsort(np.asarray(ts), kind="stable")
    ev = EventBatch(np.asarray(xs, np.int32)[order],
                    np.asarray(ys, np.int32)[order],
                    np.asarray(ts, np.uint32)[order],
                    np.ones(len(xs), np.int32))
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=4, aperture_sub_phases=2,
                     causal_snapshots=2)
    base = FlowEngine(cfg).process(ev)
    eng = HaloFlowEngine(cfg, num_devices=4)
    # the owner-sharded layout must actually engage (2x slack):
    # verify via pack, then process end-to-end
    packed, _ = eng.pack(ev)
    assert packed.ndim == 5 and packed.shape[2] == 4
    per_shard = packed.shape[4]
    assert per_shard < cfg.chunk_size          # ~1/n + slack + tail
    b = eng.process(ev)
    assert eng._shard_layout is not None
    # vs the REPLICATED halo engine: identical outputs (the parity claim
    # of the owner-sharded upload: same compute, 1/n of the transfers)
    eng_r = HaloFlowEngine(cfg, num_devices=4)
    orig = eng_r.pack

    def replicated_pack(ev2, steps_per_call=None, compact=False):
        out = FlowEngine.pack(eng_r, ev2, steps_per_call=steps_per_call,
                              compact=False)
        eng_r._shard_layout = None
        return out

    eng_r.pack = replicated_pack
    a = eng_r.process(ev)
    assert eng_r._shard_layout is None
    for col in ("vx", "vy", "r_local", "r_true", "theta_true", "scale"):
        np.testing.assert_array_equal(np.asarray(getattr(a, col)),
                                      np.asarray(getattr(b, col)),
                                      err_msg=col)
    # vs the single-device engine: LOCAL columns are exact; the true
    # columns can flip near-tie scale argmaxes (the integral-partials
    # path associates box sums differently - fp-level ties on this
    # 4-identical-bars stream), so only sanity-bound them
    valid = np.asarray(base.r_local) > 0
    assert valid.sum() > 50
    np.testing.assert_allclose(b.vx, base.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.vy, base.vy, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.r_local, base.r_local,
                               rtol=1e-5, atol=1e-6)
    close = np.isclose(np.asarray(b.r_true), np.asarray(base.r_true),
                       rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.97, close.mean()


def test_halo_owner_sharded_overflow_falls_back():
    """A stream concentrated on one shard overflows the slack budget and
    falls back to the replicated layout, with identical outputs."""
    import numpy as np

    from farms_tpu.events.io import EventBatch
    from farms_tpu.pipeline.engine import FlowEngine

    rng = np.random.default_rng(3)
    n = 512
    x = rng.integers(0, 8, n).astype(np.int32)     # all on shard 0
    y = rng.integers(0, 48, n).astype(np.int32)
    t = np.sort(rng.integers(0, 20000, n)).astype(np.uint32)
    ev = EventBatch(x, y, t, np.ones(n, np.int32))
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=2)
    a = FlowEngine(cfg).process(ev)
    eng = HaloFlowEngine(cfg, num_devices=4)
    b = eng.process(ev)
    assert eng._shard_layout is None               # replicated fallback
    np.testing.assert_allclose(b.vx, a.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b.r_true, a.r_true, rtol=1e-5, atol=1e-6)


def test_halo_engine_correction_matches_base():
    """The FULL round-5 fidelity shape - snapshots, coarse pooling, AND
    the rank-2 center-correction pass - on the halo engine matches the
    single-device engine (owner-sharded and replicated layouts)."""
    import numpy as np

    from farms_tpu.events.io import EventBatch
    from farms_tpu.pipeline.engine import FlowEngine

    # four parallel bars + repeats: spread over shards AND rank-2 lanes
    xs, ys, ts = [], [], []
    for step in range(12):
        for yy in range(10, 40):
            for b, x0 in enumerate((2, 18, 34, 50)):
                xs.append(x0 + step)
                ys.append(yy)
                ts.append(1000 + step * 400 + (yy - 10) * 2 + b)
                if (yy + step) % 5 == 0:      # rewrite => rank-2 lanes
                    xs.append(x0 + step)
                    ys.append(yy)
                    ts.append(1000 + step * 400 + (yy - 10) * 2 + b + 1)
    order = np.argsort(np.asarray(ts), kind="stable")
    ev = EventBatch(np.asarray(xs, np.int32)[order],
                    np.asarray(ys, np.int32)[order],
                    np.asarray(ts, np.uint32)[order],
                    np.ones(len(xs), np.int32))
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=4, aperture_sub_phases=2,
                     causal_snapshots=2, center_correction=32,
                     correction_coarse_chain=True)
    base = FlowEngine(cfg).process(ev)
    eng = HaloFlowEngine(cfg, num_devices=4)
    b_sh = eng.process(ev)
    used_sharded = eng._shard_layout is not None
    # correction must actually fire (rank-2 lanes exist)
    fl, _ = FlowEngine(cfg).pack_r2(ev)
    assert fl.sum() > 20
    # replicated halo layout
    eng_r = HaloFlowEngine(cfg, num_devices=4)
    orig = eng_r.pack

    def replicated_pack(ev2, steps_per_call=None, compact=False):
        out = orig(ev2, steps_per_call=steps_per_call, compact=compact)
        if out[0].ndim == 5:
            # rebuild without the owner reorder: rerun through the base
            # packer + correction rows
            eng_r._shard_layout = None
            eng_r._r2c_queue = []
            packed, nn = FlowEngine.pack(eng_r, ev2,
                                         steps_per_call=steps_per_call,
                                         compact=False)
            fl2, ctr2 = eng_r.pack_r2(ev2, steps_per_call=steps_per_call)
            packed = np.concatenate(
                [packed, fl2[:, :, None, :].astype(np.int32)], axis=2)
            eng_r._r2c_queue = [ctr2[c] for c in range(ctr2.shape[0])]
            return packed, nn
        return out

    eng_r.pack = replicated_pack
    b_re = eng_r.process(ev)
    # sharded == replicated exactly when the sharded layout engaged
    if used_sharded:
        for col in ("vx", "vy", "r_local", "r_true", "scale"):
            np.testing.assert_array_equal(np.asarray(getattr(b_re, col)),
                                          np.asarray(getattr(b_sh, col)),
                                          err_msg=col)
    # vs base: local columns exact; true columns near-tie tolerant
    np.testing.assert_allclose(b_sh.vx, base.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b_sh.vy, base.vy, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b_sh.r_local, base.r_local,
                               rtol=1e-5, atol=1e-6)
    close = np.isclose(np.asarray(b_sh.r_true), np.asarray(base.r_true),
                       rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.97, close.mean()
