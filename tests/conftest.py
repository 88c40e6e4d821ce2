"""Test configuration: force a virtual 8-device CPU platform.

Sharding logic is exercised without TPU hardware via
`--xla_force_host_platform_device_count` (SURVEY.md SS4). The environment's
sitecustomize may already have imported jax and registered a TPU backend,
so the platform is overridden through jax.config (effective until the first
backend initialization) rather than environment variables.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

# Tier the suite (VERDICT.md r4 item 8): the tests below each take
# >= ~20 s on CPU (measured, `--durations`); marking them `slow` keeps
# `pytest -m "not slow"` under ~10 minutes as the CI/driver fast signal
# while the default full run still covers everything. Every subsystem
# keeps at least one fast representative (golden chunk-1 parity, pallas
# k3/k5 equivalence, halo/sharding single-device matches, wire parity).
_SLOW = {
    "test_filter_size_7_dense_matches_oracle",
    "test_local_flow_k7_pallas_matches_dense",
    "test_causal_snapshots_semantics",
    "test_aperture_sub_phases_semantics",
    "test_halo_filter5",
    "test_two_process_multihost_matches_single_process",
    "test_halo_engine_sub_phases_matches_base",
    "test_tiled_pads_indivisible_width",
    "test_reference_binary_vs_engine_mixed",
    "test_tiled_2d_mesh_matches_single_device",
    "test_vmem_gate_rejection_falls_back_to_dense",
    "test_filter_size_sweep_matches_oracle",
    "test_halo_default_geometry_eight_shards",
    "test_wire_sparse_tail_fetch_past_rider",
    "test_multihost_engine_single_process_matches_flow_engine",
    "test_cli_engine_selection",
    "test_stream_equals_oneshot_with_phases_and_f16_wire",
    # round-5 additions >= ~40 s each; their fast-tier representatives
    # are the written-escape tests, the correction invariance/pack_r2
    # units, the halo overflow fallback, and the jaxpr-ordering assert
    "test_halo_engine_correction_matches_base",
    "test_multihost_engine_correction_matches_flow_engine",
    "test_halo_owner_sharded_upload_matches_base",
    "test_halo_engine_fidelity_shape_matches_base",
    "test_derived_written_matches_epoch_path",
    "test_rank2_lane_matches_serial_fit",
    "test_continuation_matches_one_shot",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        if it.name.split("[")[0] in _SLOW:
            it.add_marker(pytest.mark.slow)
