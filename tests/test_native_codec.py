"""Native C++ decoder: parity with the python codec on the golden corpus."""

import pickle
from pathlib import Path

import pytest

from midi_model_tpu.midi.codec import _py_midi2opus, _py_opus2score
from midi_model_tpu.native import native_codec

GOLDEN = Path(__file__).parent / "golden" / "codec.pkl"

native = native_codec()
if native is None:
    try:
        from midi_model_tpu.native.build import build

        build(verbose=False)
        import importlib

        import midi_model_tpu.native as native_pkg

        importlib.reload(native_pkg)
        native = native_pkg.native_codec()
    except Exception:
        native = None

pytestmark = pytest.mark.skipif(native is None, reason="native codec not built")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN, "rb") as f:
        return pickle.load(f)


def test_midi2opus_matches_python(goldens):
    for name, g in goldens.items():
        assert native.midi2opus(g["bytes"]) == _py_midi2opus(g["bytes"]), name
        assert native.midi2opus(g["bytes"]) == g["opus"], name


def test_midi2score_matches_python(goldens):
    for name, g in goldens.items():
        assert native.midi2score(g["bytes"]) == g["score"], name


def test_opus2score_matches_python(goldens):
    for name, g in goldens.items():
        if name.startswith("bad_"):
            continue
        assert native.opus2score(g["opus"]) == _py_opus2score(g["opus"]), name


def test_malformed():
    assert native.midi2opus(b"") == [1000, []]
    assert native.midi2opus(b"MT") == [1000, []]
    assert native.midi2score(b"\x00" * 64) == [1000, []]


def test_speedup(goldens):
    """The native decoder should be several times faster than python."""
    import time

    blobs = [g["bytes"] for n, g in goldens.items() if not n.startswith("bad_")]

    t0 = time.perf_counter()
    for _ in range(5):
        for b in blobs:
            native.midi2score(b)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        for b in blobs:
            _py_opus2score(_py_midi2opus(b))
    t_python = time.perf_counter() - t0

    assert t_native < t_python, (t_native, t_python)
