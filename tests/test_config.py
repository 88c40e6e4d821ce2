"""Config semantics, incl. the reference's filter-size normalization."""
from farms_tpu.config import FlowConfig, normalize_filter_size


def test_filter_size_normalization():
    # reference vFlow.cpp:32-33: <5 -> 3, even -> odd-1
    assert normalize_filter_size(1) == 3
    assert normalize_filter_size(3) == 3
    assert normalize_filter_size(4) == 3
    assert normalize_filter_size(5) == 5
    assert normalize_filter_size(6) == 5
    assert normalize_filter_size(7) == 7
    assert normalize_filter_size(8) == 7


def test_config_applies_normalization():
    cfg = FlowConfig(filter_size=4)
    assert cfg.filter_size == 3
    assert cfg.f_rad == 1
    assert cfg.plane_size == 9


def test_derived_scales():
    cfg = FlowConfig()
    # reference vFlow.cpp:73-74: windowJump=5, maxWindow=50 -> 11 scales
    assert cfg.num_scales == 11
    assert cfg.scales == (0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
    assert cfg.halo_width == 50


def test_custom_scale_pyramid():
    cfg = FlowConfig(window_jump=10, max_window=30)
    assert cfg.scales == (0, 10, 20, 30)
