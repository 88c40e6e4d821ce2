"""Pallas kernels vs the XLA dense formulation (interpreter mode on CPU).

The kernels (ops/pallas/kernels.py) implement the exact same math as
ops/dense_flow.py - the local plane fit agrees up to FMA-reordering, and
the aperture stage consumes the same f32 cumsum integral image as the
dense path, so it should agree exactly up to fusion differences. The
kernels are gridded over row bands with explicit HBM->VMEM slab DMA, so
one geometry class per banding regime is covered: small (48x40), tall
sensors past the tr=16->8 switch (64x528), and a >200K-cell geometry
(640x480, the BASELINE config-3 sensor) where the former single-block
kernels used to fall back to XLA.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.ops.dense_flow import dense_aperture, dense_local_flow
from farms_tpu.ops.pallas import kernels as pk
from farms_tpu.pipeline.engine import micro_step
from farms_tpu.state.surfaces import init_state


CFG = FlowConfig(width=48, height=40, chunk_size=64)


def _surfaces(seed=0):
    """stamp1-encoded surfaces (see state/surfaces.py): 0 = untouched."""
    rng = np.random.default_rng(seed)
    W, H = CFG.width, CFG.height
    touched = rng.random((W, H)) < 0.8
    t_pre = np.where(touched, rng.integers(1, 5_000_000, (W, H)) + 1, 0)
    t_post = t_pre.copy()
    t_post[10:30, 5:25] = t_pre[10:30, 5:25] + 1000 + (t_pre[10:30, 5:25] == 0)
    return jnp.asarray(t_pre, jnp.int32), jnp.asarray(t_post, jnp.int32)


def _assert_local_equivalent(cfg, t_pre, t_post, what, halo=0, row_offset=0):
    """Exact-selection equivalence (VERDICT.md r3 item 9): the winning
    candidate id must match the dense path EXACTLY everywhere except
    pixels where the dense path's own top-2 scores are within fp-drift
    distance (a legitimate tie - FMA contraction may differ between the
    XLA and Mosaic evaluations of the same sum). Float fields get fp
    tolerance only, with NO divergent-pixel escape fraction; boolean
    fields must match exactly wherever the selection agrees."""
    ro = jnp.int32(row_offset) if halo else row_offset
    *ref, rbest, scores = dense_local_flow(t_pre, t_post, cfg, halo=halo,
                                           row_offset=row_offset,
                                           want_ids=True)
    *out, pcand = pk.local_flow_pallas(t_pre, t_post, cfg, halo=halo,
                                       row_offset=ro, want_ids=True)
    scores = np.asarray(scores, np.float64)
    ssort = np.sort(scores, axis=0)
    local_ok = np.isfinite(ssort[0])
    tie = (ssort[1] - ssort[0]) <= 1e-5 * (np.abs(ssort[0]) + 1.0)
    decided = local_ok & ~tie
    rbest = np.asarray(rbest)
    pcand = np.asarray(pcand)
    np.testing.assert_array_equal(
        pcand[decided], rbest[decided],
        err_msg=f"{what}: candidate selection differs off-tie")
    # pixels where no candidate window fit must report no selection
    assert (pcand[~local_ok] == -1).all(), f"{what}: cand id at ~local_ok"
    # same selection => same inputs to the fit: float fields agree to fp
    # tolerance on EVERY such pixel (magnitude-aware: summation-tree
    # association drift scales with the velocity magnitude, and vx/vy
    # are cos/sin components that can sit near zero for near-axis
    # flows), booleans exactly
    agree = (pcand == rbest) & local_ok
    # accept-gate knife edges: det >= threshold and |residual| < half are
    # strict compares, so association drift can flip the accept decision
    # (one path then outputs exact 0). Distinct from selection bugs - the
    # candidate id above is already exact - and bounded tightly.
    rvx0 = np.asarray(ref[0])[agree] == 0
    ovx0 = np.asarray(out[0])[agree] == 0
    flip = rvx0 != ovx0
    assert flip.mean() <= 5e-4, (
        f"{what}: {flip.sum()}/{flip.size} accept flips")
    keep = ~flip
    rlen = np.asarray(ref[3], np.float64)[agree][keep]
    for name, r, o in zip(["vx", "vy", "gate", "len", "theta"], ref, out):
        r = np.asarray(r, np.float64)[agree][keep]
        o = np.asarray(o, np.float64)[agree][keep]
        if name == "gate":
            np.testing.assert_array_equal(o, r, err_msg=f"{what} {name}")
        elif name == "theta":
            d = np.abs(o - r) % (2 * np.pi)
            d = np.minimum(d, 2 * np.pi - d)
            bad = (d > 5e-3) & (rlen > 1e-9)
            # same bounded chaotic-fit tail as the component tiers below
            assert bad.sum() <= max(3, 2e-4 * bad.size), (
                f"{what} theta: {bad.sum()} past 5e-3 rad")
        else:
            # two-tier: the adjugate/det solve amplifies association
            # drift on ill-conditioned (near-singular) fits, so EVERY
            # pixel must sit within 5% of the velocity magnitude and at
            # most 0.1% of pixels may exceed the tight 0.1% bound
            both_nan = np.isnan(r) & np.isnan(o)
            err = np.where(both_nan, 0.0, np.abs(o - r))
            tight = err <= 1e-3 * np.abs(r) + 1e-3 * rlen + 1e-4
            loose = err <= 1e-3 * np.abs(r) + 5e-2 * rlen + 1e-4
            # catastrophically conditioned fits (det barely over the
            # threshold) can amplify 1-ulp input drift without bound;
            # allow a tiny counted tail for them - selection is already
            # asserted exact above, so nothing systematic can hide here
            assert (~loose).sum() <= max(3, 2e-4 * loose.size), (
                f"{what} {name}: {(~loose).sum()} past 5%-of-magnitude "
                f"(max {err[~loose].max():.3g})")
            assert (~tight).sum() <= max(3, 1e-3 * tight.size), (
                f"{what} {name}: {(~tight).sum()}/{tight.size} past the "
                f"0.1%-of-magnitude tier")
    # ~local_ok pixels carry the zero/invalid outputs in both paths
    for name, r, o in zip(["vx", "vy", "gate"], ref, out):
        np.testing.assert_array_equal(np.asarray(o)[~local_ok],
                                      np.asarray(r)[~local_ok],
                                      err_msg=f"{what} {name} @ ~local_ok")


def _assert_aperture_equivalent(cfg, fl, fvx, fvy, what, halo=0):
    """Exact scale-selection equivalence: scale ids match the dense path
    exactly except dense-side near-tie winners; pooled means get fp
    tolerance only on scale-agreeing pixels (no escape fraction)."""
    rtvx, rtvy, rscale, ml = dense_aperture(fl, fvx, fvy, cfg, halo=halo,
                                            want_ids=True)
    ptvx, ptvy, pscale = pk.aperture_pallas(fl, fvx, fvy, cfg, halo=halo)
    ml = np.asarray(ml, np.float64)
    msort = np.sort(ml, axis=0)
    # ties: top-2 mean lengths within fp drift, or a max straddling the
    # pooled>0 knife edge
    tie = (msort[-1] - msort[-2]) <= 1e-5 * (np.abs(msort[-1]) + 1e-6)
    tie |= np.abs(msort[-1]) <= 1e-7
    rscale = np.asarray(rscale)
    pscale = np.asarray(pscale)
    np.testing.assert_array_equal(
        pscale[~tie], rscale[~tie],
        err_msg=f"{what}: scale selection differs off-tie")
    agree = pscale == rscale
    for name, r, o in zip(["tvx", "tvy"], (rtvx, rtvy), (ptvx, ptvy)):
        np.testing.assert_allclose(
            np.asarray(o, np.float64)[agree],
            np.asarray(r, np.float64)[agree],
            rtol=1e-3, atol=1e-4, err_msg=f"{what} {name}")


def test_local_flow_matches_dense():
    t_pre, t_post = _surfaces()
    _assert_local_equivalent(CFG, t_pre, t_post, "local")


def test_local_flow_wraparound_and_untouched():
    """Future stamps (mod-2^32 wrap) and untouched-cell coordinates."""
    rng = np.random.default_rng(1)
    W, H = CFG.width, CFG.height
    # mix small and huge stamp1 values so some neighbors appear "in the
    # future" (mod-2^32 wrap) and some are untouched (0)
    touched = rng.random((W, H)) < 0.5
    t_pre = jnp.asarray(
        np.where(touched,
                 rng.choice([101, 5001, 2**31 + 7, 2**32 - 3], size=(W, H)),
                 0).astype(np.uint32).view(np.int32), jnp.int32)
    t_post = t_pre
    _assert_local_equivalent(CFG, t_pre, t_post, "wrap")


def test_local_flow_snapshots_match_dense():
    """Multi-snapshot causal fold: pallas == dense with a 3-surface
    snapshot chain (oldest, boundary, post)."""
    rng = np.random.default_rng(9)
    W, H = CFG.width, CFG.height
    touched = rng.random((W, H)) < 0.7
    # a tight stamp range so many centers fall between a neighbor's mid
    # and post write (the case only the snapshot chain can see)
    pre = np.where(touched, rng.integers(1, 3_000, (W, H)) + 1, 0)
    mid = pre.copy()
    hot = rng.random((W, H)) < 0.5
    mid[hot] = pre[hot] + rng.integers(200, 2000, (W, H))[hot] \
        + (pre[hot] == 0)
    post = mid.copy()
    hot2 = rng.random((W, H)) < 0.5
    post[hot2] = mid[hot2] + rng.integers(200, 2000, (W, H))[hot2] \
        + (mid[hot2] == 0)
    snaps = (jnp.asarray(pre, jnp.int32), jnp.asarray(mid, jnp.int32))
    t_post = jnp.asarray(post, jnp.int32)
    _assert_local_equivalent(CFG, snaps, t_post, "snapshots")
    # the fold must actually see the intermediate surface: dense with
    # snapshots differs from dense pre/post-only somewhere
    ref = dense_local_flow(snaps, t_post, CFG)
    base = dense_local_flow(snaps[0], t_post, CFG)
    diff = any(
        bool((~np.isclose(np.asarray(b, np.float64),
                          np.asarray(r, np.float64), equal_nan=True)).any())
        for b, r in zip(base, ref))
    assert diff, "snapshot chain had no effect on this fixture"


def test_local_flow_stamp_shift_invariance():
    """Adding a constant (mod 2^32) to every stamp must not change outputs.

    All plane-fit math depends only on stamp *differences*; only the 0/1
    stamp1 encodings are absolute. With surfaces holding no 0/1 values,
    shifting the whole timeline by 2^31 + delta (driving every stamp1 into
    the negative int32 range) must therefore be a no-op. Before the round-1
    ADVICE fix, signed compares broke this for the shifted half.
    """
    rng = np.random.default_rng(4)
    W, H = CFG.width, CFG.height
    base = rng.integers(100, 40_000, (W, H)).astype(np.uint32)
    hot = base.copy()
    hot[10:30, 5:25] += 1000
    shift = np.uint32(2**31 + 12345)
    for fn in (dense_local_flow, pk.local_flow_pallas):
        lo = fn(jnp.asarray(base.view(np.int32)),
                jnp.asarray(hot.view(np.int32)), CFG)
        hi = fn(jnp.asarray((base + shift).view(np.int32)),
                jnp.asarray((hot + shift).view(np.int32)), CFG)
        for name, a, b in zip(["vx", "vy", "gate", "len", "theta"], lo, hi):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{fn.__name__} {name} not shift-invariant")


@pytest.mark.parametrize("quirk", [False, True])
def test_aperture_matches_dense(quirk):
    cfg = FlowConfig(width=48, height=40, chunk_size=64,
                     replicate_y_clamp_quirk=quirk)
    rng = np.random.default_rng(2)
    W, H = cfg.width, cfg.height
    mask = rng.random((W, H)) < 0.3
    fl = jnp.asarray(rng.random((W, H)) * mask, jnp.float32)
    fvx = jnp.asarray(rng.standard_normal((W, H)), jnp.float32) * (fl > 0)
    fvy = jnp.asarray(rng.standard_normal((W, H)), jnp.float32) * (fl > 0)
    _assert_aperture_equivalent(cfg, fl, fvx, fvy, f"aperture quirk={quirk}")


def _both_stages_match(cfg, seed):
    """Run both kernels vs dense at cfg's geometry with exact-selection
    equivalence (fp tolerance on float fields only)."""
    rng = np.random.default_rng(seed)
    W, H = cfg.width, cfg.height
    touched = rng.random((W, H)) < 0.3
    t_pre = jnp.asarray(
        np.where(touched, rng.integers(1, 5_000_000, (W, H)) + 1, 0),
        jnp.int32)
    _assert_local_equivalent(cfg, t_pre, t_pre, f"local {W}x{H}")

    mask = rng.random((W, H)) < 0.3
    fl = jnp.asarray(rng.random((W, H)) * mask, jnp.float32)
    fvx = jnp.asarray(rng.standard_normal((W, H)), jnp.float32) * (fl > 0)
    fvy = jnp.asarray(rng.standard_normal((W, H)), jnp.float32) * (fl > 0)
    _assert_aperture_equivalent(cfg, fl, fvx, fvy, f"apert {W}x{H}")


@pytest.mark.slow
def test_local_flow_k7_pallas_matches_dense():
    """k=7 on the Pallas path (VERDICT.md r3 item 5): at 320x320 the
    VMEM gate rejects k=7 (the chip runs the XLA dense path, measured in
    BENCHMARKS.jsonl config2_1M_fs7), but small sensors DO select the
    kernel - this pins its equivalence right where `--filtersize 7
    --backend auto` uses it. Slow: the dense reference unrolls 169
    offset maps (multi-minute CPU compile)."""
    cfg = FlowConfig(width=40, height=32, filter_size=7,
                     min_evts_on_plane=10, chunk_size=32)
    assert pk.local_flow_supported(cfg), "gate should accept k=7 here"
    rng = np.random.default_rng(12)
    W, H = cfg.width, cfg.height
    touched = rng.random((W, H)) < 0.6
    t_pre = jnp.asarray(
        np.where(touched, rng.integers(1, 500_000, (W, H)) + 1, 0),
        jnp.int32)
    t_post = t_pre.at[10:30, 8:24].add(1000)
    _assert_local_equivalent(cfg, t_pre, t_post, "k7")


def test_tall_sensor_tr8_band():
    """Height past 512 switches the kernels to 8-row bands."""
    _both_stages_match(FlowConfig(width=64, height=528), seed=5)


def test_large_sensor_640x480():
    """>200K cells (BASELINE config 3): the gridded slab-DMA path at a
    geometry the former single-block kernels could not run. Slow on CPU
    (the dense reference alone is ~100 s) but this is the one equivalence
    check standing between the small-geometry tests and the real-chip
    BASELINE runs."""
    _both_stages_match(FlowConfig(width=640, height=480), seed=6)


def test_micro_step_pallas_vs_dense():
    """Full micro-step agreement between the XLA and Pallas dense paths."""
    rng = np.random.default_rng(3)
    m = 64
    cfg_x = FlowConfig(width=48, height=40, chunk_size=m, use_pallas=False)
    cfg_p = FlowConfig(width=48, height=40, chunk_size=m, use_pallas=True)
    x = rng.integers(0, cfg_x.width, m)
    y = rng.integers(0, cfg_x.height, m)
    t = np.sort(rng.integers(1, 100_000, m)).astype(np.int64)
    batch = np.stack([x, y, t, np.ones(m), np.zeros(m)], 0).astype(np.int32)
    # host winner resolution: last event per pixel
    seen = {}
    for i in range(m):
        seen[(x[i], y[i])] = i
    batch[4] = [1 if seen[(x[i], y[i])] == i else 0 for i in range(m)]
    st_x = init_state(cfg_x)
    st_p = init_state(cfg_p)
    for _ in range(2):  # two steps: second sees non-trivial carried state
        st_x, out_x = micro_step(st_x, jnp.asarray(batch), cfg_x)
        st_p, out_p = micro_step(st_p, jnp.asarray(batch), cfg_p)
    # wire outputs: main rows are f32 bitcasts - compare as floats; the
    # aux byte (validity + scale) must agree exactly
    main_x = np.asarray(out_x[0]).view(np.float32)
    main_p = np.asarray(out_p[0]).view(np.float32)
    close = np.isclose(main_x, main_p, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99, f"micro_step mismatch: {(~close).sum()}"
    np.testing.assert_array_equal(np.asarray(out_x[1]), np.asarray(out_p[1]))


# --------------------------------------------------------------------------
# sharded-tile (halo) mode: kernels on halo-extended shard bands
# --------------------------------------------------------------------------

def _split_with_halo(arr, n, h):
    """Host-side reference of parallel/halo.py's exchange_halo: split [W,H]
    into n row bands, each extended by h rows from its neighbors
    (zero-filled past the global edge)."""
    W = arr.shape[0]
    rows = W // n
    padded = np.pad(np.asarray(arr), ((h, h), (0, 0)))
    return [jnp.asarray(padded[i * rows:i * rows + rows + 2 * h])
            for i in range(n)]


@pytest.mark.parametrize("n", [2, 4])
def test_local_flow_halo_matches_dense_halo(n):
    """local_flow_pallas(halo=R, row_offset) == dense halo mode per shard."""
    t_pre, t_post = _surfaces(seed=7)
    R = CFG.support_radius
    pres = _split_with_halo(t_pre, n, R)
    posts = _split_with_halo(t_post, n, R)
    rows = CFG.width // n
    for i in range(n):
        _assert_local_equivalent(CFG, pres[i], posts[i],
                                 f"local shard {i}/{n}", halo=R,
                                 row_offset=i * rows)


@pytest.mark.parametrize("n", [2, 4])
def test_aperture_halo_matches_dense_halo(n):
    """aperture_pallas(halo=A) == dense halo mode per shard (exact: both
    consume the same f32 integral)."""
    cfg = FlowConfig(width=48, height=40, chunk_size=64, max_window=10,
                     window_jump=5)
    rng = np.random.default_rng(3)
    W, H = cfg.width, cfg.height
    has = rng.random((W, H)) < 0.3
    flow_len = jnp.asarray(np.where(has, rng.uniform(0.5, 3, (W, H)), 0.0),
                           jnp.float32)
    ang = rng.uniform(-np.pi, np.pi, (W, H))
    flow_vx = jnp.asarray(np.where(has, np.cos(ang), 0.0), jnp.float32)
    flow_vy = jnp.asarray(np.where(has, np.sin(ang), 0.0), jnp.float32)
    A = cfg.max_window + 1
    lens = _split_with_halo(flow_len, n, A)
    vxs = _split_with_halo(flow_vx, n, A)
    vys = _split_with_halo(flow_vy, n, A)
    for i in range(n):
        ref = dense_aperture(lens[i], vxs[i], vys[i], cfg, halo=A)
        out = pk.aperture_pallas(lens[i], vxs[i], vys[i], cfg, halo=A)
        for name, r, o in zip(["tvx", "tvy", "scale"], ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"shard {i}/{n} {name}")


def test_halo_engine_pallas_matches_dense():
    """Full HaloFlowEngine: Pallas kernels (interpret mode) == XLA dense."""
    from farms_tpu.events.io import synthetic_translating_bar
    from farms_tpu.parallel.halo import HaloFlowEngine

    ev = synthetic_translating_bar(width=64, height=48, bar_len=16,
                                   duration_us=15000, jitter_us=10, seed=2)
    ev.y[:] = np.clip(ev.y, 0, 47)
    outs = []
    for use_pallas in (False, True):
        cfg = FlowConfig(width=64, height=48, chunk_size=128,
                         steps_per_scan=2, max_window=10, window_jump=5,
                         use_pallas=use_pallas)
        eng = HaloFlowEngine(cfg, num_devices=4)
        outs.append(eng.process(ev))
    a, b = outs
    np.testing.assert_array_equal(a.scale, b.scale)
    valid = a.r_local > 0
    assert valid.sum() > 50
    # summation-tree association differs between the paths (cached
    # kernel); absolute drift scales with |v| (~1e3 px/s here), and vx is
    # the small cos-component of a near-axis flow, so tolerance is
    # magnitude-relative rather than component-relative
    atol = 1e-5 * float(np.max(a.r_local))
    np.testing.assert_allclose(b.vx, a.vx, rtol=1e-3, atol=atol)
    np.testing.assert_allclose(b.r_true, a.r_true, rtol=1e-3, atol=atol)


def test_vmem_gate_walks_geometry_boundary():
    """Walk sensor geometries across the VMEM support estimates and prove
    the gates err safe: every geometry the gates accept must actually be
    under the budget with its scratch+temps model, every rejection must
    engage the XLA fallback in micro_step's auto mode, and the boundary
    (first rejected height) must exist for each filter size - i.e. the
    gate is a real cutoff, not a constant (VERDICT.md r2 weak 7)."""
    from farms_tpu.ops.pallas.kernels import (_VMEM_BUDGET,
                                              _aperture_tile_rows,
                                              _aperture_vmem_bytes,
                                              _local_tile_rows,
                                              _local_vmem_bytes)

    for fs in (3, 5, 7):
        accepted, rejected = [], []
        for h in (128, 320, 512, 768, 1024, 2048, 4096, 8192):
            cfg = FlowConfig(width=64, height=h, filter_size=fs)
            est = _local_vmem_bytes(cfg, _local_tile_rows(cfg))
            (accepted if pk.local_flow_supported(cfg) else rejected).append(h)
            # the gate must agree with its own estimate - no bypass path
            assert pk.local_flow_supported(cfg) == (est <= _VMEM_BUDGET)
        # monotone cutoff: everything accepted is smaller than everything
        # rejected (larger heights can't re-enter the budget)
        if accepted and rejected:
            assert max(accepted) < min(rejected)
        # k=7 must reject well before k=3 does
        if fs == 7:
            assert rejected and min(rejected) <= 1024
        if fs == 3:
            assert 512 in accepted

    # aperture gate: same properties along the scale axis
    ok_m, bad_m = [], []
    for mw in (10, 50, 100, 200, 400):
        cfg = FlowConfig(width=64, height=640, max_window=mw, window_jump=5)
        est = _aperture_vmem_bytes(cfg, _aperture_tile_rows(cfg))
        assert pk.aperture_supported(cfg) == (est <= _VMEM_BUDGET)
        (ok_m if pk.aperture_supported(cfg) else bad_m).append(mw)
    if ok_m and bad_m:
        assert max(ok_m) < min(bad_m)


def test_vmem_gate_rejection_falls_back_to_dense():
    """A geometry past the budget must still produce correct results via
    the auto-mode XLA fallback (gate rejection is safe, not an error)."""
    import jax.numpy as jnp

    cfg = FlowConfig(width=32, height=8192, filter_size=7, chunk_size=32,
                     min_evts_on_plane=3)
    assert not pk.local_flow_supported(cfg)
    # use_pallas=None auto mode: must trace + run the dense path
    rng = np.random.default_rng(0)
    m = 32
    batch = np.stack([rng.integers(0, 32, m), rng.integers(0, 8192, m),
                      np.sort(rng.integers(1, 10000, m)), np.ones(m),
                      np.zeros(m)], 0).astype(np.int32)
    seen = {}
    for i in range(m):
        seen[(batch[0, i], batch[1, i])] = i
    batch[4] = [1 if seen[(batch[0, i], batch[1, i])] == i else 0
                for i in range(m)]
    st = init_state(cfg)
    st, out = micro_step(st, jnp.asarray(batch), cfg)
    assert np.isfinite(np.asarray(out[0]).view(np.float32)).all()


def test_local_flow_k5_cached_matches_dense():
    """k=5 now runs the cached winner-solve kernel (previously only the
    recompute kernel, whose VMEM estimate rejected 320x320 k=5 and fell
    back to XLA on chip)."""
    cfg = FlowConfig(width=48, height=40, chunk_size=64, filter_size=5,
                     min_evts_on_plane=3)
    assert pk.local_flow_supported(cfg)
    rng = np.random.default_rng(21)
    W, H = cfg.width, cfg.height
    touched = rng.random((W, H)) < 0.7
    t_pre = jnp.asarray(
        np.where(touched, rng.integers(1, 100_000, (W, H)) + 1, 0),
        jnp.int32)
    t_post = t_pre.at[12:36, 8:30].add(800)
    _assert_local_equivalent(cfg, t_pre, t_post, "k5")
