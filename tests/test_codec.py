"""MIDI byte-codec parity tests against reference goldens.

Goldens were produced by tools/make_goldens.py running the reference
implementation (/root/reference/MIDI.py) over a synthetic corpus that covers
running status, velocity-0 note-offs, FIFO note matching, unterminated notes,
all meta events, sysex, and malformed inputs.
"""

import pickle
from pathlib import Path

import pytest

from midi_model_tpu.midi import (
    midi2ms_score,
    midi2opus,
    midi2score,
    opus2midi,
    score2midi,
    score2opus,
    score2stats,
    score_type,
)

GOLDEN = Path(__file__).parent / "golden" / "codec.pkl"


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN, "rb") as f:
        return pickle.load(f)


def _names(goldens):
    return sorted(goldens)


def test_goldens_exist(goldens):
    assert len(goldens) >= 20


def test_midi2opus_parity(goldens):
    for name, g in goldens.items():
        assert midi2opus(g["bytes"]) == g["opus"], name


def test_midi2score_parity(goldens):
    for name, g in goldens.items():
        assert midi2score(g["bytes"]) == g["score"], name


def test_score2midi_parity(goldens):
    """Re-encoding the decoded score must give byte-identical output."""
    for name, g in goldens.items():
        assert score2midi(g["score"]) == g["score2midi"], name


def test_opus2midi_roundtrip_stable(goldens):
    """bytes -> opus -> bytes -> opus must be a fixed point."""
    for name, g in goldens.items():
        if name.startswith("bad_"):
            continue
        reencoded = opus2midi(g["opus"])
        assert midi2opus(reencoded) == midi2opus(opus2midi(midi2opus(reencoded))), name


def test_ms_score_parity(goldens):
    for name, g in goldens.items():
        if g["ms_score"] is None:
            continue
        assert midi2ms_score(g["bytes"]) == g["ms_score"], name


def test_score2stats_parity(goldens):
    for name, g in goldens.items():
        if g["stats"] is None:
            continue
        assert score2stats(g["score"]) == g["stats"], name


def test_score2opus_inverse(goldens):
    """score2opus of a decoded score, re-scored, is stable."""
    for name, g in goldens.items():
        if name.startswith("bad_"):
            continue
        opus = score2opus(g["score"])
        assert score_type(opus) in ("opus", "")
        # round trip through bytes again
        assert midi2score(opus2midi(opus)) == midi2score(g["score2midi"]), name


def test_malformed_inputs():
    assert midi2opus(b"") == [1000, []]
    assert midi2opus(b"MT") == [1000, []]
    assert midi2opus(b"RIFFxxxxWAVE") == [1000, []]
    assert midi2score(b"\x00" * 100) == [1000, []]


def test_empty_structures():
    assert opus2midi(None)[:4] == b"MThd"
    assert score2midi([480]) == opus2midi([480])
    assert midi2score(opus2midi([480, []])) == [480, []]
