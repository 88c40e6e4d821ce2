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
