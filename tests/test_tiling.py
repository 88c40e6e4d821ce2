"""Spatially-tiled engine vs single-device: identical outputs.

Runs on the virtual 8-device CPU mesh (conftest); exercises the GSPMD halo
exchanges induced by the dense stencils and the cross-tile aperture
pooling (windows reach up to 50 px across tile borders at the defaults;
here tiles are 8-16 px wide so every window spans many tiles)."""
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.parallel.tiling import SpatialFlowEngine
from farms_tpu.pipeline.engine import FlowEngine


@pytest.fixture(scope="module")
def events():
    return synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=1,
    )[:512]


@pytest.mark.parametrize("n_dev", [2, 8])
def test_tiled_matches_single_device(events, n_dev):
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)
    ref = FlowEngine(cfg).process(events)
    got = SpatialFlowEngine(cfg, num_devices=n_dev).process(events)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_allclose(ref.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.theta_true, got.theta_true,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.r_local, got.r_local, rtol=1e-5, atol=1e-6)


def test_tiling_requires_dense():
    cfg = FlowConfig(width=64, height=64, use_dense=False)
    with pytest.raises(ValueError):
        SpatialFlowEngine(cfg, num_devices=2)


def test_tiled_pads_indivisible_width(events):
    """width 60 over 8 tiles pads arrays to 64; outputs match the
    unpadded single-device engine exactly (pad cells never written, all
    border rules use the semantic sensor bounds)."""
    ev = events
    keep = ev.x < 60
    from farms_tpu.events.io import EventBatch
    ev = EventBatch(ev.x[keep], ev.y[keep], ev.t[keep], ev.pol[keep])
    cfg = FlowConfig(width=60, height=64, chunk_size=64, steps_per_scan=2)
    ref = FlowEngine(cfg).process(ev)
    got = SpatialFlowEngine(cfg, num_devices=8).process(ev)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_allclose(ref.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.vx, got.vx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.vy, got.vy, rtol=1e-5, atol=1e-6)


def test_tiled_2d_mesh_matches_single_device(events):
    """2-D ('tx','ty') sensor-plane tiling (SURVEY.md section 7 sketch 2),
    with a non-divisible height exercising y-axis padding."""
    ev = events
    keep = ev.y < 62
    from farms_tpu.events.io import EventBatch
    ev = EventBatch(ev.x[keep], ev.y[keep], ev.t[keep], ev.pol[keep])
    cfg = FlowConfig(width=64, height=62, chunk_size=64, steps_per_scan=2)
    ref = FlowEngine(cfg).process(ev)
    got = SpatialFlowEngine(cfg, mesh_shape=(4, 2)).process(ev)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_allclose(ref.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.theta_true, got.theta_true,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.r_local, got.r_local, rtol=1e-5, atol=1e-6)
