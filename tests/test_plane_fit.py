"""Unit tests of the batched plane-fit math against numpy.linalg.lstsq.

SURVEY.md SS4 test strategy item (2): the closed-form 3x3 normal-equation
solve must agree with a straightforward least-squares fit on random patches,
including the det<1 rejection and the inlier rule.
"""
import numpy as np
import jax.numpy as jnp

from farms_tpu.config import FlowConfig
from farms_tpu.ops.local_flow import local_flow_batch


def _run_single(t_surf, touched, x, y, t_ev, cfg):
    """Run local_flow_batch for one event (stamp1-encodes the surfaces)."""
    t1 = np.where(touched, t_surf.astype(np.int64) + 1, 0).astype(np.int32)
    out = local_flow_batch(
        jnp.asarray(t1), jnp.asarray(t1),
        jnp.asarray([x], dtype=jnp.int32),
        jnp.asarray([y], dtype=jnp.int32),
        jnp.asarray([t_ev + 1], dtype=jnp.int32),
        cfg,
    )
    return [np.asarray(o)[0] for o in out]


def _plane_surface(W, H, a_us, b_us, t0_us):
    """t(x, y) = t0 + a*x + b*y microseconds, all pixels touched."""
    xs = np.arange(W)[:, None]
    ys = np.arange(H)[None, :]
    return (t0_us + a_us * xs + b_us * ys).astype(np.int32)


def test_perfect_plane_recovers_velocity():
    W = H = 32
    cfg = FlowConfig(width=W, height=H, min_evts_on_plane=5)
    a_us, b_us = 40.0, 25.0  # us per pixel gradients
    surf = _plane_surface(W, H, a_us, b_us, 1000)
    touched = np.ones((W, H), dtype=bool)
    x, y = 16, 16
    t_ev = int(surf[x, y])
    vx, vy, valid, length, theta = _run_single(surf, touched, x, y, t_ev, cfg)
    assert valid
    # reference convention (vFlow.cpp:1373-1377): gradient (a,b) in s/px,
    # speed = 1/|grad|, angle = atan2(a, b)
    grad = np.array([a_us, b_us]) * 1e-6
    speed = 1.0 / np.linalg.norm(grad)
    ang = np.arctan2(grad[0], grad[1])
    np.testing.assert_allclose(vx, speed * np.cos(ang), rtol=1e-4)
    np.testing.assert_allclose(vy, speed * np.sin(ang), rtol=1e-4)


def test_matches_numpy_lstsq_gradients():
    rng = np.random.default_rng(7)
    W = H = 32
    cfg = FlowConfig(width=W, height=H, min_evts_on_plane=0)
    for _ in range(20):
        a_us = rng.uniform(5, 200)
        b_us = rng.uniform(5, 200)
        surf = _plane_surface(W, H, a_us, b_us, 500)
        noise = rng.integers(-3, 4, size=surf.shape)
        surf = (surf + noise).astype(np.int32)
        touched = np.ones((W, H), dtype=bool)
        x = int(rng.integers(5, W - 5))
        y = int(rng.integers(5, H - 5))
        # keep every support cell in the past so no wraparound penalties
        # perturb candidate selection (the serial reference never sees
        # future stamps either)
        f2 = 2 * cfg.f_rad
        t_ev = int(surf[x - f2:x + f2 + 1, y - f2:y + f2 + 1].max()) + 50
        surf[x, y] = t_ev  # event pixel holds the event itself
        vx, vy, valid, _, _ = _run_single(surf, touched, x, y, t_ev, cfg)

        # emulate candidate choice: all 9 candidates valid; find the one the
        # kernel should pick, then lstsq-fit that window
        f = cfg.f_rad
        best, best_score = None, np.inf
        for di in (-f, 0, f):
            for dj in (-f, 0, f):
                win = surf[x + di - f:x + di + f + 1, y + dj - f:y + dj + f + 1]
                score = float(np.mean(t_ev - win.astype(np.float64)))
                if score < best_score:
                    best_score, best = score, (di, dj)
        di, dj = best
        win = surf[x + di - f:x + di + f + 1, y + dj - f:y + dj + f + 1]
        xs, ys = np.meshgrid(
            np.arange(x + di - f, x + di + f + 1),
            np.arange(y + dj - f, y + dj + f + 1),
            indexing="ij",
        )
        A = np.stack([xs.ravel(), ys.ravel(), np.ones(win.size)], 1)
        Y = win.ravel().astype(np.float64) * 1e-6
        abc, *_ = np.linalg.lstsq(A, Y, rcond=None)
        speed = 1.0 / np.hypot(abc[0], abc[1])
        ang = np.arctan2(abc[0], abc[1])
        np.testing.assert_allclose(vx, speed * np.cos(ang), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(vy, speed * np.sin(ang), rtol=1e-3, atol=1e-3)


def test_det_rejection_on_degenerate_patch():
    """All rows identical (untouched pixels at (0,0)) => det < 1 => invalid."""
    W = H = 16
    cfg = FlowConfig(width=W, height=H)
    surf = np.zeros((W, H), dtype=np.int32)
    touched = np.zeros((W, H), dtype=bool)
    vx, vy, valid, _, _ = _run_single(surf, touched, 8, 8, 100, cfg)
    assert not valid
    assert vx == 0 and vy == 0


def test_inlier_threshold_rejects_noise():
    """Pure random stamps: a plane fit finds few inliers => rejected."""
    rng = np.random.default_rng(3)
    W = H = 16
    cfg = FlowConfig(width=W, height=H, min_evts_on_plane=9)
    surf = rng.integers(1, 10**6, size=(W, H)).astype(np.int32)
    touched = np.ones((W, H), dtype=bool)
    t_ev = 10**6 + 1
    surf[8, 8] = t_ev
    vx, vy, valid, _, _ = _run_single(surf, touched, 8, 8, t_ev, cfg)
    assert not valid


def test_border_event_uses_inward_candidate():
    """Events at x=0 can only use candidates shifted inward (vFlow.cpp:889)."""
    W = H = 32
    cfg = FlowConfig(width=W, height=H, min_evts_on_plane=3)
    surf = _plane_surface(W, H, 40.0, 25.0, 1000)
    touched = np.ones((W, H), dtype=bool)
    t_ev = int(surf[0, 16])
    vx, vy, valid, _, _ = _run_single(surf, touched, 0, 16, t_ev, cfg)
    # with a clean plane, the inward candidate (x=1) has a full window
    assert valid


def test_corner_event_still_possible():
    W = H = 32
    cfg = FlowConfig(width=W, height=H, min_evts_on_plane=3)
    # wavefront arriving at the corner last, so the corner event is newest
    surf = _plane_surface(W, H, -40.0, -25.0, 1000 + 65 * 31)
    touched = np.ones((W, H), dtype=bool)
    t_ev = int(surf[0, 0])
    vx, vy, valid, *_ = _run_single(surf, touched, 0, 0, t_ev, cfg)
    assert valid  # candidate at (1,1) has a full in-bounds window
