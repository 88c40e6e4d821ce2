"""Multi-host engine tests.

Two layers of evidence for parallel/multihost.py:

1. In-process: MultiHostFlowEngine on the virtual 8-device CPU mesh
   (process_count == 1, the degenerate single-host case) must match the
   plain single-device FlowEngine bit-for-bit.
2. Cross-process: two real OS processes, each owning 2 virtual CPU
   devices, wired into one 4-device system via jax.distributed
   (coordination + gloo collectives over localhost). Both processes run
   the replicated chronological feed through a ('tx','ev') = (2,2) global
   mesh; their outputs must agree with each other and with a
   single-process run (VERDICT.md round-1 item 4).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import EventBatch, synthetic_translating_bar
from farms_tpu.pipeline.engine import FlowEngine

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _worker_cfg() -> FlowConfig:
    return FlowConfig(width=64, height=48, chunk_size=64, steps_per_scan=2,
                      max_window=10, window_jump=5, use_pallas=False,
                      sub_phases=2, causal_snapshots=2,
                      center_correction=16, correction_coarse_chain=True)


def _worker_stream():
    full = synthetic_translating_bar(width=64, height=48, bar_len=20,
                                     speed_px_per_sec=2000.0,
                                     duration_us=20000)
    # duplicate every 16th event at its predecessor's pixel so rank-2
    # lanes exist and the correction path genuinely fires
    import numpy as _np
    fx, fy = full.x.copy(), full.y.copy()
    fx[1::16] = fx[::16][:fx[1::16].size]
    fy[1::16] = fy[::16][:fy[1::16].size]
    full = EventBatch(fx, fy, full.t, full.pol)
    half = len(full) // 2
    return (EventBatch(full.x[:half], full.y[:half], full.t[:half],
                       full.pol[:half]),
            EventBatch(full.x[half:], full.y[half:], full.t[half:],
                       full.pol[half:]))


def _reference_columns():
    eng = FlowEngine(_worker_cfg())
    ev, ev2 = _worker_stream()
    out = eng.process(ev)
    out2 = eng.process(ev2)
    return {
        "r_true": np.concatenate([out.r_true, out2.r_true]),
        "theta_true": np.concatenate([out.theta_true, out2.theta_true]),
        "vx": np.concatenate([out.vx, out2.vx]),
        "vy": np.concatenate([out.vy, out2.vy]),
        "r_local": np.concatenate([out.r_local, out2.r_local]),
        "scale": np.concatenate([out.scale, out2.scale]),
    }


def test_multihost_engine_single_process_matches_flow_engine():
    import jax
    from farms_tpu.parallel.multihost import (MultiHostFlowEngine,
                                              make_global_mesh)

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_global_mesh(tx=4, ev=len(jax.devices()) // 4)
    eng = MultiHostFlowEngine(_worker_cfg(), mesh=mesh)
    ev, ev2 = _worker_stream()
    got = eng.process(ev)
    got2 = eng.process(ev2)
    ref = _reference_columns()
    np.testing.assert_array_equal(
        np.concatenate([got.r_true, got2.r_true]), ref["r_true"])
    np.testing.assert_array_equal(
        np.concatenate([got.vx, got2.vx]), ref["vx"])
    np.testing.assert_array_equal(
        np.concatenate([got.scale, got2.scale]), ref["scale"])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _scrubbed_env() -> dict:
    """Environment for worker processes: plain CPU jax, no axon plugin."""
    env = dict(os.environ)
    # drop the axon sitecustomize (it initializes a PJRT backend at
    # interpreter start, before jax.distributed.initialize can run)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + parts)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


def test_two_process_multihost_matches_single_process(tmp_path):
    port = _free_port()
    env = _scrubbed_env()
    worker = os.path.join(HERE, "_multihost_worker.py")
    outs = [str(tmp_path / f"proc{p}.npz") for p in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(p), outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    ref = _reference_columns()
    got = [np.load(o) for o in outs]
    for col in ("r_true", "theta_true", "vx", "vy", "r_local", "scale"):
        # both processes see identical, complete outputs...
        np.testing.assert_array_equal(got[0][col], got[1][col],
                                      err_msg=f"procs disagree on {col}")
        # ...equal to the single-process engine's
        np.testing.assert_allclose(got[0][col], ref[col], rtol=0, atol=0,
                                   err_msg=f"multi-host {col} != single")

    # rank-distributed writer (VERDICT.md r3 item 8): the txt written
    # from disjoint per-process lane shards - with the output allgather
    # poisoned - must be byte-identical to the single-process file
    from farms_tpu.events.io import write_flow_txt

    ev, ev2 = _worker_stream()
    full = EventBatch(np.concatenate([ev.x, ev2.x]),
                      np.concatenate([ev.y, ev2.y]),
                      np.concatenate([ev.t, ev2.t]),
                      np.concatenate([ev.pol, ev2.pol]))
    single = FlowEngine(_worker_cfg())
    want_txt = write_flow_txt(single.process(full),
                              str(tmp_path / "single"))
    dist_txt = str(tmp_path / "dist_FARMSOut_batch.txt")
    assert os.path.exists(dist_txt), "distributed writer produced no file"
    with open(want_txt, "rb") as a, open(dist_txt, "rb") as b:
        assert a.read() == b.read(), "distributed txt != single-process txt"


def test_multihost_engine_correction_matches_flow_engine():
    """The full round-5 fidelity shape - snapshots, coarse pooling, and
    the rank-2 center correction - on the (single-process) multihost
    engine over the ('tx','ev') mesh matches the base engine."""
    import numpy as np

    from farms_tpu.config import FlowConfig
    from farms_tpu.events.io import EventBatch
    from farms_tpu.parallel.multihost import (MultiHostFlowEngine,
                                              make_global_mesh)
    from farms_tpu.pipeline.engine import FlowEngine

    rng = np.random.default_rng(2)
    n = 1024
    x = rng.integers(0, 64, n).astype(np.int32)
    y = rng.integers(0, 48, n).astype(np.int32)
    t = np.sort(rng.integers(0, 30000, n)).astype(np.uint32)
    # guarantee rank-2 lanes: every 16th event rewrites its predecessor's
    # pixel (same plane-fit group by adjacency)
    x[1::16] = x[::16][:x[1::16].size]
    y[1::16] = y[::16][:y[1::16].size]
    ev = EventBatch(x, y, t, np.ones(n, np.int32))
    cfg = FlowConfig(width=64, height=48, chunk_size=128, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=4, aperture_sub_phases=2,
                     causal_snapshots=2, center_correction=32,
                     correction_coarse_chain=True)
    a = FlowEngine(cfg).process(ev)
    mesh = make_global_mesh(tx=4, ev=2)
    b = MultiHostFlowEngine(cfg, mesh=mesh).process(ev)
    # rank-2 lanes must exist so the correction actually fires
    fl, _ = FlowEngine(cfg).pack_r2(ev)
    assert fl.sum() > 5
    for col in ("vx", "vy", "r_local", "r_true", "scale"):
        np.testing.assert_allclose(np.asarray(getattr(b, col)),
                                   np.asarray(getattr(a, col)),
                                   rtol=1e-5, atol=1e-6, err_msg=col)
