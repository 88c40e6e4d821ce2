"""Integral-image aperture pooling vs a naive NumPy implementation.

SURVEY.md SS4 item (3): property tests of the argmax-over-scales pooling
against a direct O(s^2) rescan.
"""
import numpy as np
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.ops.aperture import aperture_batch, build_integral


def _naive_pool(flow_len, flow_vx, flow_vy, x, y, cfg):
    W, H = cfg.width, cfg.height
    y_clamp = (W if cfg.replicate_y_clamp_quirk else H) - 1
    best_val, best = 0.0, None
    for s in cfg.scales:
        x0, x1 = max(0, x - s), min(x + s, W - 1)
        y0, y1 = max(0, y - s), min(y + s, y_clamp)
        g = flow_len[x0:x1 + 1, y0:y1 + 1] > 0
        n = int(g.sum())
        if n == 0:
            continue
        mean_len = flow_len[x0:x1 + 1, y0:y1 + 1][g].sum() / n
        if mean_len > best_val:
            best_val = mean_len
            best = (
                flow_vx[x0:x1 + 1, y0:y1 + 1][g].sum() / n,
                flow_vy[x0:x1 + 1, y0:y1 + 1][g].sum() / n,
                s,
            )
    if best is None:
        return flow_vx[x, y], flow_vy[x, y], 0
    return best


def _random_surfaces(W, H, density, seed):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(W, H)) < density
    ln = np.where(mask, rng.uniform(0.5, 5.0, (W, H)), 0.0).astype(np.float32)
    vx = np.where(mask, rng.normal(size=(W, H)), 0.0).astype(np.float32)
    vy = np.where(mask, rng.normal(size=(W, H)), 0.0).astype(np.float32)
    return ln, vx, vy


def test_pooling_matches_naive():
    W = H = 80
    cfg = FlowConfig(width=W, height=H)
    ln, vx, vy = _random_surfaces(W, H, 0.1, seed=11)
    integ = build_integral(jnp.asarray(ln), jnp.asarray(vx), jnp.asarray(vy))

    rng = np.random.default_rng(5)
    xs = rng.integers(0, W, 50).astype(np.int32)
    ys = rng.integers(0, H, 50).astype(np.int32)
    tvx, tvy, sc = aperture_batch(
        integ, jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray(xs), jnp.asarray(ys), cfg,
    )
    tvx, tvy, sc = np.asarray(tvx), np.asarray(tvy), np.asarray(sc)
    for i in range(len(xs)):
        evx, evy, es = _naive_pool(ln, vx, vy, int(xs[i]), int(ys[i]), cfg)
        assert sc[i] == es, f"event {i}: scale {sc[i]} != {es}"
        np.testing.assert_allclose(tvx[i], evx, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(tvy[i], evy, rtol=2e-4, atol=1e-5)


def test_first_strict_maximum_tie_break():
    """Equal pool means at several scales: the smallest scale wins
    (reference strict `>` scan, vFlow.cpp:1052-1059)."""
    W = H = 64
    cfg = FlowConfig(width=W, height=H)
    # uniform flow everywhere: every scale pools the same mean
    ln = np.full((W, H), 2.0, dtype=np.float32)
    vx = np.full((W, H), 1.5, dtype=np.float32)
    vy = np.full((W, H), -1.0, dtype=np.float32)
    integ = build_integral(jnp.asarray(ln), jnp.asarray(vx), jnp.asarray(vy))
    tvx, tvy, sc = aperture_batch(
        integ, jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray([32], dtype=jnp.int32), jnp.asarray([32], dtype=jnp.int32),
        cfg,
    )
    assert int(sc[0]) == 0
    np.testing.assert_allclose(float(tvx[0]), 1.5, rtol=1e-5)


def test_empty_surface_falls_back_to_center():
    W = H = 32
    cfg = FlowConfig(width=W, height=H)
    ln = np.zeros((W, H), dtype=np.float32)
    vx = np.zeros((W, H), dtype=np.float32)
    vy = np.zeros((W, H), dtype=np.float32)
    integ = build_integral(jnp.asarray(ln), jnp.asarray(vx), jnp.asarray(vy))
    tvx, tvy, sc = aperture_batch(
        integ, jnp.asarray(vx), jnp.asarray(vy),
        jnp.asarray([10], dtype=jnp.int32), jnp.asarray([10], dtype=jnp.int32),
        cfg,
    )
    assert float(tvx[0]) == 0.0 and float(tvy[0]) == 0.0 and int(sc[0]) == 0


def test_y_clamp_quirk_flag():
    """With the quirk on, y windows clamp by width (vFlow.cpp:998-1000)."""
    W, H = 48, 32
    ln, vx, vy = _random_surfaces(W, H, 0.2, seed=2)
    for quirk in (False, True):
        cfg = FlowConfig(width=W, height=H, replicate_y_clamp_quirk=quirk)
        integ = build_integral(jnp.asarray(ln), jnp.asarray(vx), jnp.asarray(vy))
        tvx, tvy, sc = aperture_batch(
            integ, jnp.asarray(vx), jnp.asarray(vy),
            jnp.asarray([24], dtype=jnp.int32),
            jnp.asarray([30], dtype=jnp.int32), cfg,
        )
        evx, evy, es = _naive_pool(ln, vx, vy, 24, 30, cfg)
        assert int(sc[0]) == es
        np.testing.assert_allclose(float(tvx[0]), evx, rtol=2e-4, atol=1e-5)
