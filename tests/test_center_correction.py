"""Rank-2 center-attribution correction tests (FlowConfig.center_correction).

Non-final events inherit the plane-fit group winner's fit (the CENTER
ATTRIBUTION term of the batched error, ACCURACY.md); the correction pass
re-fits the second-latest event per multiply-written pixel against its
OWN stamp and visibility boundary via one extra dense pass per chunk
(pipeline/engine.py micro_step, reference semantics vFlow.cpp:223-414).
"""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine


def _multi_pass_bar(passes=3, w=64):
    """Several bar sweeps over the SAME pixels + background noise - a
    collision-rich structured stream (single sweeps never rewrite a
    pixel, so rank-2 lanes would not exist)."""
    parts = []
    t_off = 0
    for i in range(passes):
        b = synthetic_translating_bar(width=w, height=w, bar_len=20,
                                      speed_px_per_sec=4000.0,
                                      duration_us=60000, jitter_us=23,
                                      seed=i)
        parts.append((b.x, b.y, b.t.astype(np.int64) + t_off))
        t_off += int(b.t[-1]) + 100
    rng = np.random.default_rng(7)
    n_bg = sum(len(p[0]) for p in parts) // 2
    parts.append((rng.integers(0, w, n_bg).astype(np.int32),
                  rng.integers(0, w, n_bg).astype(np.int32),
                  np.sort(rng.integers(0, t_off, n_bg)).astype(np.int64)))
    x = np.concatenate([p[0] for p in parts])
    y = np.concatenate([p[1] for p in parts])
    t = np.concatenate([p[2] for p in parts])
    order = np.argsort(t, kind="stable")
    return EventBatch(x[order].astype(np.int32), y[order].astype(np.int32),
                      t[order].astype(np.uint32),
                      np.ones(len(x), np.int32))


def test_pack_r2_identifies_rank2():
    # one chunk (m=8, P=2): phase 0 lanes 0..3, phase 1 lanes 4..7.
    # pixel A fires at lanes 0,1,3 (rank2 = lane 1); pixel B at lanes
    # 4,6 (rank2 = lane 4); pixel A again at lanes 5,7 (rank2 = lane 5,
    # deduped vs lane 1 keeping the LATEST -> lane 5)
    x = np.array([2, 2, 9, 2, 5, 2, 5, 2], np.int32)
    y = np.array([3, 3, 9, 3, 6, 3, 6, 3], np.int32)
    t = np.arange(8, dtype=np.uint32) * 10
    ev = EventBatch(x, y, t, np.ones(8, np.int32))
    cfg = FlowConfig(width=16, height=16, chunk_size=8, sub_phases=2,
                     steps_per_scan=1, wire="f32", center_correction=4)
    eng = FlowEngine(cfg)
    flags, centers = eng.pack_r2(ev, steps_per_call=1)
    got = sorted(np.nonzero(flags[0, 0])[0].tolist())
    assert got == [4, 5]
    # the host-built center surface holds the two rank-2 stamp1 values
    ctr = centers[0, 0]
    assert ctr[5, 6] == 41 and ctr[2, 3] == 51
    assert (ctr != 0).sum() == 2


def test_no_collisions_is_invariant():
    """With no same-pixel collisions per chunk, correction changes nothing."""
    n = 512
    x = (np.arange(n) % 60 + 2).astype(np.int32)
    y = ((np.arange(n) * 7) % 60 + 2).astype(np.int32)   # distinct per chunk
    t = (np.arange(n) * 40).astype(np.uint32)
    ev = EventBatch(x, y, t, np.ones(n, np.int32))
    base = dict(width=64, height=64, chunk_size=64, sub_phases=1,
                steps_per_scan=2, wire="f32")
    out_a = FlowEngine(FlowConfig(**base)).process(ev)
    out_b = FlowEngine(FlowConfig(**base, center_correction=8)).process(ev)
    for col in ("vx", "vy", "r_local", "r_true", "scale"):
        np.testing.assert_array_equal(np.asarray(getattr(out_a, col)),
                                      np.asarray(getattr(out_b, col)),
                                      err_msg=col)


def test_rank2_lane_matches_serial_fit():
    """An isolated rank-2 event gets its own event-serial fit, exactly.

    Bar-like geometry: chunk 0 lays three written columns (x=17..19);
    chunk 1 fires column x=20 (y ascending) and then REWRITES (20,20) -
    so the column's (20,20) event is rank-2. Its pixel is far from every
    other co-chunk event, so the corrected fit (own center stamp,
    chain-folded visibility) must equal the chunk_size=1 engine's LOCAL
    columns bit-for-bit - and the uncorrected engine must differ (it
    inherits the winner's fit, whose causal view includes (20,21)).
    """
    m = 64
    xs, ys, ts = [], [], []
    for i, cx in enumerate((17, 18, 19)):       # chunk 0: three columns
        for yy in range(14, 27):
            xs.append(cx)
            ys.append(yy)
            ts.append(5500 + i * 100 + (yy - 14))
    n0 = len(xs)
    for j in range(m - n0 % m if n0 % m else 0):    # distinct-pixel fill
        xs.append(40 + j // 16)
        ys.append(34 + j % 16)
        ts.append(5790)
    n0 = len(xs)
    for yy in range(14, 27):                    # chunk 1: column x=20
        xs.append(20)
        ys.append(yy)
        ts.append(5800 + (yy - 14))
    pair_lane = len(xs) - 7                     # the (20, 20) event
    xs.append(20)
    ys.append(20)
    ts.append(5830)                             # rewrite => rank-2 above
    n1 = len(xs) - n0
    for j in range(m - n1 % m if n1 % m else 0):
        xs.append(50 + j // 16)
        ys.append(34 + j % 16)
        ts.append(5840 + j)
    ev = EventBatch(np.asarray(xs, np.int32), np.asarray(ys, np.int32),
                    np.asarray(ts, np.uint32), np.ones(len(xs), np.int32))

    base = dict(width=64, height=64, chunk_size=m, sub_phases=1,
                steps_per_scan=1, wire="f32")
    out_c = FlowEngine(FlowConfig(**base, center_correction=8)).process(ev)
    out_1 = FlowEngine(
        FlowConfig(width=64, height=64, chunk_size=1, wire="f32")
    ).process(ev)
    out_n = FlowEngine(FlowConfig(**base)).process(ev)
    for col in ("vx", "vy", "r_local", "theta_local"):
        a = np.asarray(getattr(out_c, col))[pair_lane]
        b = np.asarray(getattr(out_1, col))[pair_lane]
        assert a == b or (np.isnan(a) and np.isnan(b)), (col, a, b)
    assert np.asarray(out_c.r_local)[pair_lane] > 0       # a real fit
    assert (np.asarray(out_n.vx)[pair_lane]
            != np.asarray(out_1.vx)[pair_lane])           # not vacuous


@pytest.mark.slow
def test_agreement_improves_on_bar():
    from farms_tpu.pipeline.oracle import run_oracle
    ev = _multi_pass_bar()
    cfg0 = FlowConfig(width=64, height=64)
    orc = run_oracle(ev, cfg0)
    ov = np.asarray(orc.r_local) > 0

    def agreement(cfg):
        got = FlowEngine(cfg).process(ev)
        gv = np.asarray(got.r_local) > 0
        return float((ov == gv).mean())

    # the correction needs a reasonably fine snapshot chain: a corrected
    # lane's visibility folds over the chunk's sub-group boundaries, so
    # neighbors rewritten within the SAME sub-group are missed - at
    # P=S=1 (chunk-granular chain) a heavily-rewritten stream loses most
    # of its neighborhood and the correction hurts instead of helping
    # (this is by design; production points pair correction with P*S
    # granularity ~8-16K, ACCURACY.md)
    base = dict(width=64, height=64, chunk_size=2048, sub_phases=4,
                causal_snapshots=4, steps_per_scan=2, wire="f32")
    plain = agreement(FlowConfig(**base))
    corr = agreement(FlowConfig(**base, center_correction=1024))
    assert corr > plain + 0.01, (plain, corr)
