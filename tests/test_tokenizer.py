"""Tokenizer parity tests against reference goldens (all 4 configs)."""

import pickle
import random
from pathlib import Path

import pytest

from midi_model_tpu.tokenizer import MIDITokenizer

GOLDEN = Path(__file__).parent / "golden" / "tokenizer.pkl"
CODEC_GOLDEN = Path(__file__).parent / "golden" / "codec.pkl"

CONFIGS = ["v1_raw", "v1_opt", "v2_raw", "v2_opt"]


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN, "rb") as f:
        return pickle.load(f)


@pytest.fixture(scope="module")
def scores():
    with open(CODEC_GOLDEN, "rb") as f:
        return {k: v["score"] for k, v in pickle.load(f).items()
                if not k.startswith("bad_")}


def make_tok(key):
    version, mode = key.split("_")
    tok = MIDITokenizer(version)
    tok.set_optimise_midi(mode == "opt")
    return tok


@pytest.mark.parametrize("key", CONFIGS)
def test_vocab_layout(goldens, key):
    g = goldens[key]
    tok = make_tok(key)
    assert tok.vocab_size == g["vocab_size"]
    assert tok.max_token_seq == g["max_token_seq"]
    assert tok.events == g["events"]
    assert tok.event_parameters == g["event_parameters"]
    assert tok.event_ids == g["event_ids"]
    assert tok.parameter_ids == g["parameter_ids"]
    assert tok.to_dict() == g["to_dict"]


@pytest.mark.parametrize("key", CONFIGS)
def test_tokenize_parity(goldens, scores, key):
    g = goldens[key]
    tok = make_tok(key)
    for name, rec in g["files"].items():
        if "error" in rec:
            continue
        got = tok.tokenize(scores[name])
        assert got == rec["tokens"], f"{key}/{name}"


@pytest.mark.parametrize("key", CONFIGS)
def test_detokenize_parity(goldens, key):
    g = goldens[key]
    tok = make_tok(key)
    for name, rec in g["files"].items():
        if "error" in rec:
            continue
        assert tok.detokenize(rec["tokens"]) == rec["detok"], f"{key}/{name}"


@pytest.mark.parametrize("key", CONFIGS)
def test_detokenize_to_midi_bytes_parity(goldens, key):
    from midi_model_tpu.midi import score2midi

    g = goldens[key]
    tok = make_tok(key)
    for name, rec in g["files"].items():
        if "error" in rec:
            continue
        assert score2midi(tok.detokenize(rec["tokens"])) == rec["detok_midi"], \
            f"{key}/{name}"


@pytest.mark.parametrize("key", CONFIGS)
def test_second_pass_stability(goldens, key):
    """tokenize(detokenize(tokens)) must match the reference's second pass."""
    g = goldens[key]
    tok = make_tok(key)
    for name, rec in g["files"].items():
        if "error" in rec:
            continue
        assert tok.tokenize(rec["detok"]) == rec["tokens2"], f"{key}/{name}"


@pytest.mark.parametrize("key", CONFIGS)
def test_check_quality_parity(goldens, key):
    g = goldens[key]
    tok = make_tok(key)
    for name, rec in g["files"].items():
        if "error" in rec:
            continue
        assert tuple(tok.check_quality(rec["tokens"])) == tuple(rec["quality"]), \
            f"{key}/{name}"


def test_augment_parity(goldens, scores):
    """Seeded augmentation must consume the RNG identically to the reference."""
    tok = MIDITokenizer("v2")
    ref = goldens["v2_augment_seed1234"]
    for name, expected in ref.items():
        seq = tok.tokenize(scores[name])
        random.seed(1234)
        assert tok.augment(seq) == expected, name


def test_event_roundtrip():
    for version in ("v1", "v2"):
        tok = MIDITokenizer(version)
        for name, params in tok.events.items():
            event = [name] + [min(3, tok.event_parameters[p] - 1) for p in params]
            tokens = tok.event2tokens(event)
            assert tokens and len(tokens) == tok.max_token_seq
            assert tok.tokens2event(tokens) == event
        # out-of-range params are rejected
        assert tok.event2tokens(["set_tempo", 0, 0, 0, 10**6]) == []
        assert tok.tokens2event([tok.pad_id] * tok.max_token_seq) == []


@pytest.mark.parametrize("key", CONFIGS)
def test_python_scan_matches_native(goldens, scores, key, monkeypatch):
    """Both scan-phase implementations must tokenize identically."""
    import midi_model_tpu.tokenizer.base as base

    if base._native_scan() is None:
        pytest.skip("native scan not built")
    tok = make_tok(key)
    native_out = {name: tok.tokenize(score) for name, score in scores.items()}
    monkeypatch.setattr(base, "_native_scan", lambda: None)
    for name, score in scores.items():
        assert tok.tokenize(score) == native_out[name], f"{key}/{name}"


def test_grammar_tables():
    tok = MIDITokenizer("v2")
    t = tok.vocab.grammar_tables()
    assert t["first_event_id"] == tok.eos_id + 1
    assert t["n_events"] == len(tok.events)
    note_off = tok.event_ids["note"] - t["first_event_id"]
    assert t["n_params"][note_off] == 7
    lo, hi = t["param_lo"][note_off, 0], t["param_hi"][note_off, 0]
    assert list(range(lo, hi)) == tok.parameter_ids["time1"]


def test_midi2img_geometry_golden():
    """midi2img paints exactly the reference's pixels (colors are random in
    the reference, so the golden captures image size + painted-pixel mask;
    ref midi_tokenizer.py:343-363 / 1002-1022)."""
    import pickle
    from pathlib import Path

    import numpy as np

    from midi_model_tpu.midi import midi2score
    from midi_model_tpu.tokenizer import MIDITokenizer

    golden_dir = Path(__file__).parent / "golden"
    with open(golden_dir / "midi2img.pkl", "rb") as f:
        goldens = pickle.load(f)
    with open(golden_dir / "codec.pkl", "rb") as f:
        codec = pickle.load(f)

    for ver, g in goldens.items():
        tok = MIDITokenizer(ver)
        score = midi2score(codec["rand_03"]["bytes"])
        deco = tok.detokenize(tok.tokenize(score))
        img = tok.midi2img(deco)
        assert img.size == tuple(g["size"]), ver
        mask = np.asarray(img).sum(axis=-1) > 0
        np.testing.assert_array_equal(mask, g["mask"], err_msg=ver)
