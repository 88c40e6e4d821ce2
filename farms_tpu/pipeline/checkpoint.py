"""Checkpoint / resume for streaming runs.

The reference has no persistence beyond its output file (SURVEY.md §5) -
processing is one-shot. Here, long event streams are processed in chunks
with all engine state in one `SurfaceState` pytree, so checkpointing is
saving the surface arrays plus the stream's latched t0. A resumed engine continues
the normalized timeline exactly where it stopped (validated by
tests/test_checkpoint.py against an uninterrupted run).
"""
from __future__ import annotations

import numpy as np

from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.state.surfaces import SurfaceState

FORMAT_VERSION = 2


def save_engine(engine: FlowEngine, path: str) -> str:
    """Write the engine's full state to an .npz file."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    state = engine.state
    np.savez_compressed(
        path,
        version=np.int32(FORMAT_VERSION),
        t_surf=np.asarray(state.t_surf),
        epoch=np.asarray(state.epoch),
        flow_len=np.asarray(state.flow_len),
        flow_vx=np.asarray(state.flow_vx),
        flow_vy=np.asarray(state.flow_vy),
        step=np.asarray(state.step),
        t0=np.uint32(engine._t0 if engine._t0 is not None else 0),
        has_t0=np.bool_(engine._t0 is not None),
    )
    return path


def load_engine(engine: FlowEngine, path: str) -> FlowEngine:
    """Restore a previously saved state into an engine (same config)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    import jax.numpy as jnp

    with np.load(path) as data:
        version = int(data["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        shape = data["t_surf"].shape
        expect = (engine.cfg.width, engine.cfg.height)
        if shape != expect:
            raise ValueError(
                f"checkpoint geometry {shape} != config geometry {expect}")
        engine.state = SurfaceState(
            t_surf=jnp.asarray(data["t_surf"]),
            epoch=jnp.asarray(data["epoch"]),
            flow_len=jnp.asarray(data["flow_len"]),
            flow_vx=jnp.asarray(data["flow_vx"]),
            flow_vy=jnp.asarray(data["flow_vy"]),
            step=jnp.asarray(data["step"]),
        )
        engine._t0 = np.uint32(data["t0"]) if bool(data["has_t0"]) else None
    return engine
