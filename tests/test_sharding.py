"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import synthetic_translating_bar
from farms_tpu.parallel.dp import ShardedFlowEngine
from farms_tpu.pipeline.engine import FlowEngine


@pytest.fixture(scope="module")
def events():
    return synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=1,
    )[:512]


def test_virtual_devices_present():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_single_device(events, n_dev):
    cfg = FlowConfig(width=64, height=64, chunk_size=64, steps_per_scan=2)
    ref = FlowEngine(cfg).process(events)
    got = ShardedFlowEngine(cfg, num_devices=n_dev).process(events)
    np.testing.assert_array_equal(ref.scale, got.scale)
    np.testing.assert_allclose(ref.r_true, got.r_true, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref.r_local, got.r_local, rtol=1e-5, atol=1e-6)


def test_chunk_not_divisible_raises():
    cfg = FlowConfig(width=64, height=64, chunk_size=63)
    with pytest.raises(ValueError):
        ShardedFlowEngine(cfg, num_devices=8)
