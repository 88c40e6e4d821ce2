"""Derived-written path (no epoch scatter) equivalence tests.

micro_step's winner path can derive "pixel written this phase" as
`t_surf != t_pre` patched by host-computed equal-stamp escape lanes
(pipeline/engine.py _W_ESCAPES) instead of scattering a write epoch -
saving one scatter per event. These tests prove the derivation is EXACT:
outputs are bit-identical to the epoch-scatter path, including on streams
engineered so the same pixel fires twice with the same microsecond stamp
straddling phase boundaries (the only case the dense compare misses).
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_translating_bar
from farms_tpu.pipeline.engine import _W_ESCAPES, FlowEngine


def _equal_stamp_stream(n=6000, seed=3, phase_len=256):
    """Bar stream with equal-stamp rewrite pairs planted at phase
    boundaries.

    An escape needs a pixel whose phase-FINAL stamp equals its pre-phase
    stored value: at every `phase_len` boundary the last event of the
    phase and the first of the next are set to the same (x, y, t), with
    the pixel drawn from a row the bar stream never touches so no later
    event of the phase overwrites it.
    """
    ev = synthetic_translating_bar(width=64, height=64, bar_len=20,
                                   speed_px_per_sec=4000.0,
                                   duration_us=40000, jitter_us=17,
                                   seed=seed)
    x, y, t, pol = (ev.x[:n].copy(), ev.y[:n].copy(), ev.t[:n].copy(),
                    ev.pol[:n].copy())
    n = len(x)
    for i, b in enumerate(range(phase_len, n - 1, phase_len)):
        x[b - 1] = x[b] = 60
        y[b - 1] = y[b] = (i * 3) % 64
        t[b] = t[b - 1]
        # keep the stream sorted: the planted stamp is t[b-1], already
        # in order, and t[b] <= t[b+1] holds since t[b-1] <= old t[b]
    return EventBatch(x, y, t, pol)


def _force_epoch_path(eng):
    orig = eng.pack_wesc

    def patched(ev, steps_per_call=None):
        wesc, ok = orig(ev, steps_per_call=steps_per_call)
        ok[:] = False
        return wesc, ok

    eng.pack_wesc = patched


def _assert_same(a, b):
    for col in ("vx", "vy", "r_local", "theta_local", "r_true",
                "theta_true", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, col)), np.asarray(getattr(b, col)),
            err_msg=col)


@pytest.mark.parametrize("P,S", [(1, 1), (2, 1), (4, 2)])
def test_derived_written_matches_epoch_path(P, S):
    ev = _equal_stamp_stream()
    cfg = FlowConfig(width=64, height=64, chunk_size=512, sub_phases=P,
                     causal_snapshots=S, wire="f32")
    eng_a = FlowEngine(cfg)
    out_a = eng_a.process(ev)
    eng_b = FlowEngine(cfg)
    _force_epoch_path(eng_b)
    out_b = eng_b.process(ev)
    _assert_same(out_a, out_b)


def test_escapes_are_exercised():
    """The injected duplicate pairs must actually produce escape lanes."""
    ev = _equal_stamp_stream()
    cfg = FlowConfig(width=64, height=64, chunk_size=512, sub_phases=2,
                     wire="f32")
    eng = FlowEngine(cfg)
    wesc, ok = eng.pack_wesc(ev)
    assert ok.all()
    mp = cfg.chunk_size // cfg.sub_phases
    assert (wesc < mp).sum() > 0


def test_escape_overflow_falls_back():
    """A phase with > _W_ESCAPES equal-stamp rewrites uses the epoch path
    for that call, with identical outputs."""
    # plant > _W_ESCAPES equal-stamp boundary pairs into ONE phase:
    # lanes 256-E2..255 write E2 distinct pixels, lanes 256..256+E2-1
    # rewrite them with the same stamps, and nothing touches those
    # pixels afterwards
    n = 2048
    E2 = _W_ESCAPES + 8
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, n).astype(np.int32)
    y = rng.integers(0, 4, n).astype(np.int32)
    t = np.sort(rng.integers(0, 40000, n)).astype(np.uint32)
    x[256 - E2:256] = x[256:256 + E2] = 32
    y[256 - E2:256] = np.arange(E2)
    y[256:256 + E2] = np.arange(E2)
    t[256 - E2:256 + E2] = t[256 - E2]
    ev = EventBatch(x, y, t, np.ones(n, np.int32))
    cfg = FlowConfig(width=64, height=64, chunk_size=256, sub_phases=1,
                     wire="f32")
    eng = FlowEngine(cfg)
    wesc, ok = eng.pack_wesc(ev)
    assert not ok.all()   # the stream must actually overflow somewhere
    eng_a = FlowEngine(cfg)
    out_a = eng_a.process(ev)
    eng_b = FlowEngine(cfg)
    _force_epoch_path(eng_b)
    out_b = eng_b.process(ev)
    _assert_same(out_a, out_b)


def test_continuation_matches_one_shot():
    """_last_stamp carries across process() calls (streaming mode)."""
    ev = _equal_stamp_stream()
    cfg = FlowConfig(width=64, height=64, chunk_size=512, sub_phases=2,
                     wire="f32")
    eng_a = FlowEngine(cfg)
    out_a = eng_a.process(ev)
    eng_b = FlowEngine(cfg)
    cut = 512 * 4   # a whole number of chunks, mid-stream
    o1 = eng_b.process(EventBatch(ev.x[:cut], ev.y[:cut], ev.t[:cut],
                                  ev.pol[:cut]))
    o2 = eng_b.process(EventBatch(ev.x[cut:], ev.y[cut:], ev.t[cut:],
                                  ev.pol[cut:]))
    for col in ("vx", "vy", "r_local", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out_a, col)),
            np.concatenate([np.asarray(getattr(o1, col)),
                            np.asarray(getattr(o2, col))]), err_msg=col)
