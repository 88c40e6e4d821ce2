"""Checkpoint / resume for streaming runs.

The reference has no persistence beyond its output file (SURVEY.md §5) -
processing is one-shot. Here, long event streams are processed in chunks
with all engine state in one `SurfaceState` pytree, so checkpointing is
saving the surface arrays plus the stream's latched t0. A resumed engine
continues the normalized timeline exactly where it stopped (validated by
tests/test_checkpoint.py against an uninterrupted run).

Sharded engines: checkpoints are engine-portable. Arrays are saved at the
SEMANTIC sensor geometry (padding stripped - pad cells are never written,
see FlowConfig.padded_to), and `load_engine` re-pads to the target
engine's array geometry and re-applies its sharding placement
(`engine._state_shardings`), so a single-device checkpoint restores into a
HaloFlowEngine/SpatialFlowEngine mesh and vice versa.
"""
from __future__ import annotations

import numpy as np

from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.state.surfaces import SurfaceState

FORMAT_VERSION = 3


def save_engine(engine: FlowEngine, path: str) -> str:
    """Write the engine's full state to an .npz file."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    state = engine.state
    W, H = engine.cfg.width, engine.cfg.height    # semantic geometry
    np.savez_compressed(
        path,
        version=np.int32(FORMAT_VERSION),
        t_surf=np.asarray(state.t_surf)[:W, :H],
        epoch=np.asarray(state.epoch)[:W, :H],
        flow_len=np.asarray(state.flow_len)[:W, :H],
        flow_vx=np.asarray(state.flow_vx)[:W, :H],
        flow_vy=np.asarray(state.flow_vy)[:W, :H],
        step=np.asarray(state.step),
        t0=np.uint32(engine._t0 if engine._t0 is not None else 0),
        has_t0=np.bool_(engine._t0 is not None),
    )
    return path


def load_engine(engine: FlowEngine, path: str) -> FlowEngine:
    """Restore a previously saved state into an engine (same sensor).

    The target engine may use any sharding strategy and any padded array
    geometry; the semantic sensor (width x height) must match.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    import jax.numpy as jnp

    cfg = engine.cfg
    Wa, Ha = cfg.array_width, cfg.array_height

    def repad(arr, fill):
        pw, ph = Wa - arr.shape[0], Ha - arr.shape[1]
        if pw or ph:
            arr = np.pad(arr, ((0, pw), (0, ph)), constant_values=fill)
        return jnp.asarray(arr)

    with np.load(path) as data:
        version = int(data["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        shape = data["t_surf"].shape
        expect = (cfg.width, cfg.height)
        if shape != expect:
            raise ValueError(
                f"checkpoint geometry {shape} != config geometry {expect}")
        # Neutralize write-epoch history (ADVICE.md r3, high): epoch is
        # only ever consumed via equality with a *future* write epoch
        # (micro_step: written = epoch == ep_val, ep_val = step*P + p).
        # Within one run ep_vals are unique, but a restore into an engine
        # with a smaller sub_phases P shrinks the per-step epoch stride,
        # so future ep_vals can collide with saved ones and spuriously
        # mark untouched pixels as written-this-group. Mapping every
        # historical epoch to a sentinel (< -1, never a valid ep_val)
        # is exact: at a step boundary no pixel was written by the
        # *current* group, which is all the field encodes.
        ep = data["epoch"]
        ep = np.where(ep >= 0, np.int32(-2), ep).astype(np.int32)
        state = SurfaceState(
            t_surf=repad(data["t_surf"], 0),
            epoch=repad(ep, -1),
            flow_len=repad(data["flow_len"], 0.0),
            flow_vx=repad(data["flow_vx"], 0.0),
            flow_vy=repad(data["flow_vy"], 0.0),
            step=jnp.asarray(data["step"]),
        )
        # re-apply the engine's sharding placement (single-device engines
        # pass through; sharded engines distribute over their mesh)
        # place_state also re-seeds the pack_wesc host stamp mirror from
        # the restored t_surf (a stale mirror would derive wrong
        # equal-stamp escapes for the derived-written path)
        engine.state = engine.place_state(state)
        engine._t0 = np.uint32(data["t0"]) if bool(data["has_t0"]) else None
    return engine
