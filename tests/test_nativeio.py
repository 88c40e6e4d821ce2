"""Native C++ fast-I/O library vs the NumPy fallback."""
import numpy as np
import pytest

from farms_tpu.events.io import (
    load_events_txt,
    read_flow_txt,
    synthetic_random_events,
    write_events_txt,
)
from farms_tpu.utils import nativeio

pytestmark = pytest.mark.skipif(
    not nativeio.available(), reason="native library not built"
)


def test_native_parse_matches_numpy(tmp_path):
    ev = synthetic_random_events(5000, width=320, height=320, seed=4)
    path = write_events_txt(ev, str(tmp_path / "ev"))
    arr = nativeio.parse_events(path, None)
    assert arr is not None and arr.shape == (5000, 4)
    np.testing.assert_array_equal(arr[:, 0].astype(np.int32), ev.x)
    np.testing.assert_array_equal(arr[:, 2].astype(np.int64), ev.t.astype(np.int64))


def test_native_parse_clamps_polarity(tmp_path):
    p = tmp_path / "neg.txt"
    p.write_text("1 2 10 -1\n3 4 20 1\n")
    arr = nativeio.parse_events(str(p), None)
    assert list(arr[:, 3].astype(int)) == [0, 1]


def test_native_parse_cap(tmp_path):
    p = tmp_path / "cap.txt"
    p.write_text("".join(f"{i} {i} {i} 1\n" for i in range(100)))
    arr = nativeio.parse_events(str(p), 13)
    assert arr.shape[0] == 13


def test_native_write_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 500
    mat = np.zeros((n, 11))
    mat[:, 0] = rng.integers(0, 320, n)
    mat[:, 1] = rng.integers(0, 320, n)
    mat[:, 2] = rng.integers(0, 10**6, n)
    mat[:, 3] = rng.integers(0, 2, n)
    mat[:, 4:10] = rng.normal(size=(n, 6))
    mat[:, 10] = rng.integers(0, 11, n) * 5
    path = str(tmp_path / "out.txt")
    assert nativeio.write_flow(path, mat)
    back = read_flow_txt(path)
    np.testing.assert_array_equal(back.x, mat[:, 0].astype(np.int32))
    np.testing.assert_allclose(back.vx, mat[:, 6], rtol=1e-4)
    np.testing.assert_array_equal(back.scale, mat[:, 10].astype(np.int32))


@pytest.mark.parametrize("subphases", [1, 4])
def test_native_compact_pack_matches_numpy(subphases):
    """farms_pack_compact (C++) vs the engine's NumPy fallback: identical
    words (flat index | winner bit) and stamps, including per-sub-phase
    winner resolution blocks (ADVICE r2: the _check_compact.py scratch
    check, promoted to a proper test)."""
    from farms_tpu.config import FlowConfig
    from farms_tpu.events.io import synthetic_random_events
    from farms_tpu.pipeline.engine import FlowEngine
    from farms_tpu.utils import nativeio

    if not nativeio.available() or not hasattr(nativeio._lib(),
                                               "farms_pack_compact"):
        pytest.skip("native library not built")

    cfg = FlowConfig(width=64, height=48, chunk_size=256, steps_per_scan=2,
                     sub_phases=subphases)
    ev = synthetic_random_events(1500, width=64, height=48, rate_hz=2e6,
                                 seed=5)

    eng = FlowEngine(cfg)
    native, n1 = eng.pack(ev, compact=True)

    # force the NumPy path by hiding the native symbol
    eng2 = FlowEngine(cfg)
    orig = nativeio.pack_compact
    nativeio.pack_compact = lambda *a, **k: None
    try:
        numpy_packed, n2 = eng2.pack(ev, compact=True)
    finally:
        nativeio.pack_compact = orig

    assert n1 == n2 == len(ev)
    assert native.shape == numpy_packed.shape and native.shape[2] == 2
    np.testing.assert_array_equal(native, numpy_packed)
