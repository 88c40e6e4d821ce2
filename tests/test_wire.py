"""Wire-format tests: device->host output packing/decoding.

The engine ships only the flow components + an aux validity/scale byte
(pipeline/engine.py wire_pack) and derives the R/Theta columns host-side
(engine._unpack_outputs). These tests pin the roundtrip for both wire
precisions and the f16-vs-f32 quantization bound.
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine


def _run(wire: str):
    cfg = FlowConfig(width=128, height=128, chunk_size=512,
                     steps_per_scan=2, wire=wire)
    ev = synthetic_translating_bar(width=128, height=128, bar_len=40,
                                   duration_us=60_000, seed=3)
    eng = FlowEngine(cfg)
    return eng.process(ev)


def test_wire_f32_columns_consistent():
    """Host-derived R/Theta columns match their defining identities."""
    out = _run("f32")
    valid = out.r_true != 0
    assert valid.any(), "fixture produced no valid flow"
    np.testing.assert_allclose(
        out.r_local[valid],
        np.sqrt(out.vx[valid] ** 2 + out.vy[valid] ** 2), rtol=1e-6)
    np.testing.assert_allclose(
        out.theta_local[valid],
        np.arctan2(out.vy[valid], out.vx[valid]), rtol=1e-6)
    # invalid rows: zeros everywhere except raw vx/vy (vFlow.cpp:390-395)
    inv = ~valid
    assert (out.theta_true[inv] == 0).all()
    assert (out.r_local[inv] == 0).all()
    assert (out.theta_local[inv] == 0).all()
    assert (out.scale[inv] == 0).all()
    # scale ids decode to actual window sizes
    cfg_scales = set(FlowConfig().scales)
    assert set(np.unique(out.scale)) <= cfg_scales


def test_wire_f16_matches_f32_within_quantization():
    a = _run("f32")
    b = _run("f16")
    # validity and scale are exact (computed on device in f32, shipped as
    # the aux byte either way)
    np.testing.assert_array_equal(a.scale, b.scale)
    np.testing.assert_array_equal(a.r_true != 0, b.r_true != 0)
    valid = a.r_true != 0
    # f16 mantissa: ~0.05% relative component error
    for col in ("vx", "vy", "r_true", "r_local"):
        av, bv = getattr(a, col)[valid], getattr(b, col)[valid]
        np.testing.assert_allclose(bv, av, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(b.theta_true[valid], a.theta_true[valid],
                               atol=2e-3)


def test_wire_sparse_matches_f16_exactly():
    """The sparse wire is a pure re-encoding of the f16 wire: dense aux
    byte + compacted f16 payloads for present/valid lanes only. The
    decoded 11-column output must be bit-identical to wire='f16'."""
    a = _run("f16")
    b = _run("sparse")
    for col in ("x", "y", "t", "pol", "r_true", "theta_true", "vx", "vy",
                "r_local", "theta_local", "scale"):
        np.testing.assert_array_equal(getattr(a, col), getattr(b, col),
                                      err_msg=col)


def test_wire_sparse_mostly_invalid_stream():
    """A stream with almost no valid flow exercises the tiny-count /
    empty-payload paths (bucketed prefix fetch, zero counts)."""
    from farms_tpu.events.io import synthetic_random_events

    cfg = FlowConfig(width=128, height=128, chunk_size=512,
                     steps_per_scan=2, wire="sparse")
    ev = synthetic_random_events(2048, width=128, height=128,
                                 rate_hz=1e4, seed=7)
    out = FlowEngine(cfg).process(ev)
    cfg16 = FlowConfig(width=128, height=128, chunk_size=512,
                       steps_per_scan=2, wire="f16")
    want = FlowEngine(cfg16).process(ev)
    np.testing.assert_array_equal(want.vx, out.vx)
    np.testing.assert_array_equal(want.r_true, out.r_true)
    np.testing.assert_array_equal(want.scale, out.scale)


def test_wire_sparse_tail_fetch_past_rider(monkeypatch):
    """A payload larger than the fixed rider must take the bounded tail
    fetch and still decode exactly (engine._fetch_sparse k > R path)."""
    import farms_tpu.pipeline.engine as eng_mod

    # shrink the rider so a high-validity bar stream overflows it; a
    # unique chunk size guarantees a fresh trace with the small rider
    monkeypatch.setattr(eng_mod, "_SPARSE_RIDER_LANES", 32)
    cfg = FlowConfig(width=128, height=128, chunk_size=320,
                     steps_per_scan=2, wire="sparse")
    cfg16 = FlowConfig(width=128, height=128, chunk_size=320,
                       steps_per_scan=2, wire="f16")
    ev = synthetic_translating_bar(width=128, height=128, bar_len=40,
                                   duration_us=60_000, seed=3)
    out = eng_mod.FlowEngine(cfg).process(ev)
    want = eng_mod.FlowEngine(cfg16).process(ev)
    assert (want.r_local > 0).sum() > 32, "fixture must overflow the rider"
    for col in ("vx", "vy", "r_true", "theta_true", "scale"):
        np.testing.assert_array_equal(getattr(want, col),
                                      getattr(out, col), err_msg=col)


def test_wire_sparse_rejects_sharded_engines():
    import pytest

    from farms_tpu.parallel.dp import ShardedFlowEngine
    from farms_tpu.events.io import synthetic_translating_bar

    cfg = FlowConfig(width=64, height=64, chunk_size=64, wire="sparse")
    ev = synthetic_translating_bar(width=64, height=64, bar_len=16,
                                   duration_us=10_000)[:128]
    eng = ShardedFlowEngine(cfg, num_devices=2)
    with pytest.raises(ValueError, match="sparse"):
        eng.process(ev)


def test_wire_f16_nan_and_overflow_survive():
    """NaN propagates; out-of-range components saturate, not inf."""
    import jax.numpy as jnp
    from farms_tpu.pipeline.engine import wire_pack

    cfg = FlowConfig(wire="f16")
    vx = jnp.asarray([1.5, np.nan, 1e9, -1e9], dtype=jnp.float32)
    vy = jnp.asarray([-2.5, 0.0, 0.0, 0.0], dtype=jnp.float32)
    z = jnp.zeros(4, jnp.float32)
    main, aux = wire_pack(vx, vy, z, z, z, cfg)
    p0 = np.asarray(main[0]).view(np.uint32)
    got_vx = (p0 & 0xFFFF).astype(np.uint16).view(np.float16)
    assert got_vx[0] == np.float16(1.5)
    assert np.isnan(got_vx[1])
    assert got_vx[2] == np.float16(65504.0)
    assert got_vx[3] == np.float16(-65504.0)


@pytest.mark.parametrize("bad", ["f64", "bf16", ""])
def test_wire_validation(bad):
    with pytest.raises(ValueError):
        FlowConfig(wire=bad)


class _NoCompact2(FlowEngine):
    # overriding _dispatch disables the compact2 path (base-dispatch
    # gate in process())
    def _dispatch(self, chunk):
        return super()._dispatch(chunk)


def test_compact2_upload_parity_and_fallbacks():
    """The delta-coded 4 B/event upload (engine.pack2/scan_chunk2) must
    produce byte-identical outputs to the 8 B compact layout; oversized
    stamp gaps escape-code exactly, and only an over-budget escape count
    or an absurd sensor falls back."""
    from farms_tpu.events.io import synthetic_translating_bar
    from farms_tpu.pipeline.engine import _C2_ESCAPES

    ev = synthetic_translating_bar(width=64, height=64, bar_len=24,
                                   duration_us=40000, jitter_us=30, seed=1)
    cfg = FlowConfig(width=64, height=64, chunk_size=256, steps_per_scan=2)
    p, aux2, n = FlowEngine(cfg).pack2(ev)
    assert aux2 is not None and p.shape[2] == 1
    a = FlowEngine(cfg).process(ev)
    b = _NoCompact2(cfg).process(ev)
    for col in ("vx", "vy", "r_true", "theta_true", "r_local",
                "theta_local", "scale"):
        np.testing.assert_array_equal(getattr(a, col), getattr(b, col))

    # a gap past the delta field escape-codes (64x64: ib=13, db=18 ->
    # gaps >= 2^18 us) and still matches the 8 B layout byte-for-byte
    ev2 = ev[:]
    ev2.t[len(ev2) // 2:] += np.uint32(1 << 19)
    _, aux2, _ = FlowEngine(cfg).pack2(ev2)
    assert aux2 is not None, "oversized gap should escape-code, not fall back"
    assert (np.asarray(aux2[1][:, :, 0, :]) < 256).any(), "no escape used"
    a = FlowEngine(cfg).process(ev2)
    b = _NoCompact2(cfg).process(ev2)
    np.testing.assert_array_equal(a.scale, b.scale)
    np.testing.assert_array_equal(a.vx, b.vx)
    np.testing.assert_array_equal(a.r_true, b.r_true)

    # more oversized gaps per step than escape slots -> exact fallback
    # (a gap every chunk_size/(E+4) lanes puts E+4 escapes in one step)
    ev3 = ev[:]
    stride = max(1, 256 // (_C2_ESCAPES + 4))
    bump = np.zeros(len(ev3), np.uint32)
    bump[::stride] = 1 << 19
    ev3.t[:] = ev3.t + np.cumsum(bump).astype(np.uint32)
    _, aux2, _ = FlowEngine(cfg).pack2(ev3)
    assert aux2 is None
    a = FlowEngine(cfg).process(ev3)
    b = _NoCompact2(cfg).process(ev3)
    np.testing.assert_array_equal(a.scale, b.scale)

    # sensors past 2^23 pixels leave < 8 delta bits -> fallback
    huge = FlowConfig(width=4096, height=4096, chunk_size=256)
    _, aux2, _ = FlowEngine(huge).pack2(ev)
    assert aux2 is None


def test_compact2_large_sensor_parity():
    """640x480 (BASELINE config 3) now rides the 4 B layout: ib=19,
    db=12 - parity against the 8 B layout on a real-geometry stream
    (VERDICT.md r3 item 6)."""
    from farms_tpu.events.io import synthetic_translating_bar

    ev = synthetic_translating_bar(width=640, height=480, bar_len=80,
                                   duration_us=20000, jitter_us=30, seed=2)
    ev.y[:] = np.clip(ev.y, 0, 479)
    cfg = FlowConfig(width=640, height=480, chunk_size=256,
                     steps_per_scan=2, max_window=10)
    p, aux2, _ = FlowEngine(cfg).pack2(ev)
    assert aux2 is not None and p.shape[2] == 1
    a = FlowEngine(cfg).process(ev)
    b = _NoCompact2(cfg).process(ev)
    for col in ("x", "y", "t", "vx", "vy", "r_true", "scale"):
        np.testing.assert_array_equal(getattr(a, col), getattr(b, col))
    valid = a.r_local > 0
    assert valid.any()
