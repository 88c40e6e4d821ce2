"""Worker process for the 2-process multi-host test.

Launched by tests/test_multihost.py with a scrubbed environment
(JAX_PLATFORMS=cpu, no axon sitecustomize). Each process owns 2 virtual
CPU devices; the two processes form one 4-device system wired through
jax.distributed (coordination over localhost, collectives over gloo).

Usage: python _multihost_worker.py <port> <process_id> <out.npz>
"""
import sys


def main() -> int:
    port, pid, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
        cluster_detection_method="deactivate",
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    from farms_tpu.config import FlowConfig
    from farms_tpu.events.io import EventBatch, synthetic_translating_bar
    from farms_tpu.parallel.multihost import MultiHostFlowEngine, make_global_mesh

    cfg = FlowConfig(width=64, height=48, chunk_size=64, steps_per_scan=2,
                     max_window=10, window_jump=5, use_pallas=False,
                     sub_phases=2, causal_snapshots=2,
                     center_correction=16, correction_coarse_chain=True)
    mesh = make_global_mesh(tx=2, ev=2)
    eng = MultiHostFlowEngine(cfg, mesh=mesh)

    # the replicated chronological feed: every process loads the same stream;
    # it is processed in two calls to also cover carried global state
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
    ev = EventBatch(full.x[:half], full.y[:half], full.t[:half],
                    full.pol[:half])
    ev2 = EventBatch(full.x[half:], full.y[half:], full.t[half:],
                     full.pol[half:])
    out = eng.process(ev)
    out2 = eng.process(ev2)

    # ---- rank-distributed output writer (VERDICT.md r3 item 8) ----
    # a separate engine on an ev-ACROSS-processes mesh (transposed device
    # grid: process p owns ev lane p at both tx rows), so the staged
    # parts are genuinely disjoint; _fetch is poisoned to prove no output
    # allgather runs
    devs = np.array(jax.devices()).reshape(2, 2).T
    from jax.sharding import Mesh
    wmesh = Mesh(devs, axis_names=("tx", "ev"))
    weng = MultiHostFlowEngine(cfg, mesh=wmesh)

    def _no_fetch(o):
        raise AssertionError("write_flow_distributed must not allgather")
    weng._fetch = _no_fetch
    # the staging base must be SHARED across processes (parts land on the
    # common filesystem); out_path is per-process, its directory is not
    import os
    weng.write_flow_distributed(
        full, os.path.join(os.path.dirname(out_path), "dist"))

    np.savez(out_path,
             r_true=np.concatenate([out.r_true, out2.r_true]),
             theta_true=np.concatenate([out.theta_true, out2.theta_true]),
             vx=np.concatenate([out.vx, out2.vx]),
             vy=np.concatenate([out.vy, out2.vy]),
             r_local=np.concatenate([out.r_local, out2.r_local]),
             scale=np.concatenate([out.scale, out2.scale]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
