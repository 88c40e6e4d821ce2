"""Golden diff against the COMPILED reference binary.

Round-1 verdict: every correctness claim chained through our own float64
oracle (pipeline/oracle.py), leaving an oracle-shares-a-misreading failure
mode unexcluded. This test closes that loop: it compiles the actual
reference translation units (vFlow.cpp, Event.cpp, FlowEvent.cpp from the
read-only checkout) against a minimal argv driver
(native/ref_harness/main_ref.cpp - upstream main.cpp needs Boost, which is
absent here; the driver calls the same runFileCopy entry point,
main.cpp:186-198), runs it on synthetic fixtures, and diffs its 11-column
`_FARMSOut_batch.txt` (vFlow.cpp:433-442) against both the float64 oracle
and the engine at chunk_size=1.

Eigen headers come from the TensorFlow wheel's bundled copy. The test skips
(visibly) if the toolchain or headers are missing.
"""
import glob
import math
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from farms_tpu.config import FlowConfig
from farms_tpu.events.io import (
    EventBatch,
    synthetic_random_events,
    synthetic_translating_bar,
    write_events_txt,
)
from farms_tpu.pipeline.engine import FlowEngine
from farms_tpu.pipeline.oracle import run_oracle

REF_SRC = "/root/reference/src"
REF_INC = "/root/reference/include"
HARNESS = os.path.join(os.path.dirname(__file__), os.pardir,
                       "native", "ref_harness", "main_ref.cpp")


def _eigen_include() -> str | None:
    for sp in sys.path:
        hits = glob.glob(os.path.join(sp, "tensorflow", "include", "Eigen",
                                      "Core"))
        if hits:
            return os.path.dirname(os.path.dirname(hits[0]))
    return None


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    gxx = shutil.which("g++")
    eigen = _eigen_include()
    if gxx is None or eigen is None or not os.path.isdir(REF_SRC):
        pytest.skip("reference toolchain unavailable "
                    f"(g++={gxx}, eigen={eigen})")
    out = str(tmp_path_factory.mktemp("refbin") / "farms_ref")
    cmd = [
        gxx, "-O2", "-std=c++17", "-w",
        f"-I{REF_INC}", f"-I{eigen}",
        os.path.join(REF_SRC, "vFlow.cpp"),
        os.path.join(REF_SRC, "Event.cpp"),
        os.path.join(REF_SRC, "FlowEvent.cpp"),
        HARNESS,
        "-o", out,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        pytest.skip(f"reference build failed: {proc.stderr[-500:]}")
    return out


def _run_reference(binary, ev: EventBatch, cfg: FlowConfig, workdir):
    base = str(workdir / "events")
    write_events_txt(ev, base + ".txt")
    subprocess.run(
        [binary, base, str(cfg.height), str(cfg.width),
         str(cfg.filter_size), str(cfg.min_evts_on_plane), str(len(ev))],
        check=True, capture_output=True, timeout=300)
    cols = np.loadtxt(base + "_FARMSOut_batch.txt", dtype=np.float64,
                      ndmin=2)
    assert cols.shape == (len(ev), 11)
    return {
        "x": cols[:, 0].astype(np.int32),
        "y": cols[:, 1].astype(np.int32),
        "t": cols[:, 2],
        "pol": cols[:, 3].astype(np.int32),
        "r_true": cols[:, 4],
        "theta_true": cols[:, 5],
        "vx": cols[:, 6],
        "vy": cols[:, 7],
        "r_local": cols[:, 8],
        "theta_local": cols[:, 9],
        "scale": cols[:, 10].astype(np.int32),
    }


def _diff(ref, got, max_flips=0):
    """ref: dict from the binary; got: FlowOutput. f64-vs-f32 tolerance."""
    np.testing.assert_array_equal(ref["x"], got.x)
    np.testing.assert_array_equal(ref["y"], got.y)
    np.testing.assert_array_equal(ref["t"], np.asarray(got.t, np.float64))
    ref_valid = ref["r_local"] > 0
    got_valid = np.asarray(got.r_local) > 0
    flips = int((ref_valid != got_valid).sum())
    assert flips <= max_flips, f"validity flips: {flips}"
    m = ref_valid & got_valid
    assert m.sum() > 50  # fixtures must actually produce flow
    np.testing.assert_allclose(got.r_local[m], ref["r_local"][m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got.r_true[m], ref["r_true"][m],
                               rtol=1e-3, atol=1e-4)
    ang = np.angle(np.exp(1j * (ref["theta_local"][m] - got.theta_local[m])))
    assert np.degrees(np.abs(ang)).max() < 0.1
    ang_t = np.angle(np.exp(1j * (ref["theta_true"][m] - got.theta_true[m])))
    assert np.degrees(np.abs(ang_t)).max() < 0.1
    assert (ref["scale"][m] == got.scale[m]).mean() > 0.995


@pytest.fixture(scope="module")
def bar64():
    return synthetic_translating_bar(
        width=64, height=64, bar_len=20, duration_us=30000,
        speed_px_per_sec=1000, jitter_us=20, seed=1)[:600]


def test_reference_binary_vs_oracle(ref_binary, bar64, tmp_path):
    """The float64 oracle must match the compiled reference (near) exactly."""
    cfg = FlowConfig(width=64, height=64, replicate_y_clamp_quirk=True)
    ref = _run_reference(ref_binary, bar64, cfg, tmp_path)
    got = run_oracle(bar64, cfg)
    _diff(ref, got, max_flips=0)
    m = ref["r_local"] > 0
    # oracle is the same math in the same precision, but the binary's
    # output file carries only default-ofstream precision (6 significant
    # digits, vFlow.cpp:436-440) - the bound is the print rounding
    np.testing.assert_allclose(got.r_local[m], ref["r_local"][m], rtol=6e-6)
    np.testing.assert_allclose(got.r_true[m], ref["r_true"][m], rtol=6e-6)
    np.testing.assert_array_equal(got.scale, ref["scale"])


@pytest.mark.parametrize("dense", [False, True])
def test_reference_binary_vs_engine_bar(ref_binary, bar64, tmp_path, dense):
    cfg = FlowConfig(width=64, height=64, chunk_size=1, steps_per_scan=32,
                     use_dense=dense, replicate_y_clamp_quirk=True)
    ref = _run_reference(ref_binary, bar64, cfg, tmp_path)
    got = FlowEngine(cfg).process(bar64)
    _diff(ref, got, max_flips=0)


def test_reference_binary_vs_engine_mixed(ref_binary, tmp_path):
    """Bar + random noise: duplicate pixels, borders, invalid fits, k=5.

    Pure random events almost never pass the 5-inlier plane gate (neither
    here nor in the binary), so the fixture mixes a coherent bar (real
    flow) with noise events (exercise rejected fits and duplicates).
    """
    bar = synthetic_translating_bar(
        width=48, height=48, bar_len=16, duration_us=25000,
        speed_px_per_sec=1200, jitter_us=25, seed=9)[:600]
    noise = synthetic_random_events(200, width=48, height=48, rate_hz=3e6,
                                    seed=9)
    order = np.argsort(np.concatenate([bar.t, noise.t]), kind="stable")
    ev = EventBatch(
        x=np.concatenate([bar.x, noise.x])[order].astype(np.int32),
        y=np.concatenate([bar.y, noise.y])[order].astype(np.int32),
        t=np.concatenate([bar.t, noise.t])[order].astype(np.uint32),
        pol=np.concatenate([bar.pol, noise.pol])[order].astype(np.int32),
    )
    cfg = FlowConfig(width=48, height=48, filter_size=5, chunk_size=1,
                     steps_per_scan=32, replicate_y_clamp_quirk=True)
    ref = _run_reference(ref_binary, ev, cfg, tmp_path)
    got = FlowEngine(cfg).process(ev)
    # f32 engine vs f64 binary may flip knife-edge det/inlier cases
    _diff(ref, got, max_flips=len(ev) // 100)
