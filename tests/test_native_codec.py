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


def test_hostile_varints_parity():
    """Crafted oversized/truncated varints must not crash (the native varint
    saturates at 2^55 instead of overflowing into a negative length — a
    negative length previously produced an out-of-bounds read/SIGBUS) and
    must decode identically to the python path, which clamps reads to the
    track payload. Reference behavior for comparison: MIDI.py raises on some
    of these; both of our decoders return the partial track instead."""
    import struct

    def mk(body):
        return (b"MThd" + struct.pack(">IHHH", 6, 1, 1, 480)
                + b"MTrk" + struct.pack(">I", len(body)) + body)

    huge = bytes([0xFF] * 9 + [0x7F])  # varint with 9 continuation bytes
    cases = [
        b"\x00\xFF\x01" + huge + b"AB",      # meta length >> payload
        b"\x00\xF0" + huge + b"ZZ",          # sysex length >> payload
        b"\x00\xFF\x01" + bytes([0xFF] * 5),  # varint truncated mid-stream
        b"\x00\xFF\x51" + huge,               # huge length, empty body
        b"\x00\x90\x40",                      # truncated channel event
        b"\x00\xF2\x01",                      # truncated song_position
        b"\x00\xF4",                          # lone unknown F-series lead
    ]
    for body in cases:
        data = mk(body)
        assert native.midi2opus(data) == _py_midi2opus(data), body

    # Two-track file: the huge meta length must clamp the cursor to the end
    # of track 1, not corrupt the chunk framing of track 2.
    two = (b"MThd" + struct.pack(">IHHH", 6, 1, 2, 480)
           + b"MTrk" + struct.pack(">I", 15)
           + b"\x00\xFF\x01" + huge + b"AB"
           + b"MTrk" + struct.pack(">I", 4) + b"\x00\xFF\x2F\x00")
    expect = [480, [["text_event", 0, b"AB"]], []]
    assert native.midi2opus(two) == expect
    assert _py_midi2opus(two) == expect
