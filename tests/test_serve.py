"""Serving core tests (headless: no gradio / fluidsynth needed)."""

import numpy as np
import pytest

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve import GenerationRequest, MidiGenerationService


@pytest.fixture(scope="module")
def service():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    return MidiGenerationService(params, cfg, batch_size=2, chunk_size=4)


def test_custom_prompt_rows(service):
    req = GenerationRequest(instruments=["Acoustic Grand", "Violin"],
                            drum_kit="Standard", bpm=120,
                            time_signature="3/4", key_signature=15)
    rows, disable_patch, disable_channels = service.custom_prompt(req)
    tok = service.tokenizer
    assert rows[0][0] == tok.bos_id
    events = [tok.tokens2event(r) for r in rows[1:]]
    names = [e[0] for e in events]
    assert names[:3] == ["time_signature", "key_signature", "set_tempo"]
    assert names.count("patch_change") == 3  # 2 instruments + drums
    assert disable_patch
    # channels 0,1 (instruments) and 9 (drums) stay enabled
    assert set(range(16)) - set(disable_channels) == {0, 1, 9}


def test_midi_prompt(service):
    import pickle
    from pathlib import Path

    with open(Path(__file__).parent / "golden" / "codec.pkl", "rb") as f:
        goldens = pickle.load(f)
    data = goldens["rand_00"]["bytes"]
    req = GenerationRequest(midi_bytes=data, midi_events=16)
    rows = service.midi_prompt(req)
    assert 0 < len(rows) <= 16
    assert rows[0][0] == service.tokenizer.bos_id


def test_streaming_run_and_finish(service, tmp_path):
    req = GenerationRequest(gen_events=6, seed=3, bpm=100)
    chunks = list(service.run(req))
    assert chunks, "no streamed chunks"
    total = sum(c.shape[1] for c in chunks)
    assert 0 < total <= 6
    assert all(c.shape[0] == 2 for c in chunks)

    paths = service.finish(service.last_output, out_dir=str(tmp_path))
    assert len(paths) == 2
    from midi_model_tpu.midi import midi2score

    for p in paths:
        with open(p, "rb") as f:
            score = midi2score(f.read())
        assert score[0] == 480  # detokenize emits fixed 480 tpq


def test_render_audio_without_synth(service):
    out = service.render_audio([np.zeros((4, 8), np.int64)])
    assert out == [None]  # no soundfont configured -> graceful no-op


def test_continuation_and_undo(service):
    req = GenerationRequest(gen_events=4, seed=1, bpm=90)
    list(service.run(req))
    first = [list(map(list, s)) for s in service.last_output]
    first_len = len(first[0])

    state = [0]
    req2 = GenerationRequest(gen_events=3, seed=2)
    list(service.continue_run(req2, first, state, select=0))
    continued = [list(map(list, s)) for s in service.last_output]
    assert len(continued[0]) > first_len
    assert continued[0][:first_len] == first[0]
    assert state == [0, first_len]

    # undo restores the pre-continuation sequences
    undone, state2 = service.undo_continuation(continued, state)
    assert [s[:first_len] for s in undone] == [s[:first_len] for s in first]
    assert len(undone[0]) == first_len
    assert state2 == [0]

    # select > 0: everyone continues from output 1; undo restores snapshot
    state3 = [0]
    list(service.continue_run(req2, first, state3, select=1))
    assert isinstance(state3[-1], list)
    restored, _ = service.undo_continuation(
        [list(map(list, s)) for s in service.last_output], state3)
    assert restored == first


def test_model_zoo_registry():
    from midi_model_tpu.serve.app import MODEL_ZOO

    assert any(v["config"] == "tv2o-medium" for v in MODEL_ZOO.values())
    assert any(v["config"] == "tv1-medium" for v in MODEL_ZOO.values())


def test_run_streams_progressively(service):
    """run() must yield chunks WHILE generation runs (worker thread + queue),
    not after — the regression the round-1 advisor flagged (app.py:186)."""
    req = GenerationRequest(gen_events=12, seed=1)
    gen = service.run(req)
    first = next(gen)  # must arrive without exhausting the generator
    assert first.ndim == 3 and first.shape[0] == service.batch_size
    rest = list(gen)
    total = first.shape[1] + sum(c.shape[1] for c in rest)
    assert total >= 1
    # chunk_size=4 with 12 events -> multiple chunks
    assert len(rest) >= 1
    assert service.last_output.shape[1] >= total


def test_build_ui_streaming_handler(service, tmp_path, monkeypatch):
    """Execute the real gradio wiring against a stub backend and drive the
    registered generate handler end-to-end: visualizer messages must stream
    progressively and the final yield must carry files + output state."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from _gradio_stub import install

    registry = install()
    monkeypatch.chdir(tmp_path)  # finish() writes outputs/ in cwd

    from midi_model_tpu.serve.app import build_ui

    app = build_ui(service)
    assert app is not None
    clicks = [r for r in registry if r["kind"] == "click"]
    # generate, continue, undo (+ zoo load)
    assert len(clicks) >= 3
    do_run = next(r["fn"] for r in clicks if r["fn"].__name__ == "do_run")

    yields = list(do_run(
        0,            # tab
        ["Violin"],   # instruments
        "Standard",   # drum kit
        120,          # bpm
        "auto", 0,    # time sig, key sig
        None, 128,    # midi file, midi events
        True, True, True, False,  # midi options
        3, False,     # seed, random seed
        8,            # gen events
        1.0, 0.94, 20, True))  # temp, top_p, top_k, allow_cc

    assert len(yields) >= 3  # initial + >=1 chunk + final
    first_msgs = json.loads(yields[0][0])
    names = [m["name"] for m in first_msgs]
    assert "visualizer_clear" in names and "visualizer_append" in names
    mid_msgs = json.loads(yields[1][0])
    assert any(m["name"] == "visualizer_append" for m in mid_msgs)
    assert any(m["name"] == "progress" for m in mid_msgs)
    final = yields[-1]
    final_msgs = json.loads(final[0])
    assert any(m["name"] == "visualizer_end" for m in final_msgs)
    state = final[1]
    assert isinstance(state, list) and len(state) == service.batch_size
    files = final[3: 3 + service.batch_size]
    for p in files:
        assert str(p).endswith(".mid")
        assert (tmp_path / p).exists() or __import__("os").path.exists(p)

    # continuation handler drives from the state, undo pops it back
    do_continue = next(r["fn"] for r in clicks
                       if r["fn"].__name__ == "do_continue")
    cont_yields = list(do_continue("1", state, [], 3, False, 4, 1.0, 0.94,
                                   20, True))
    assert len(cont_yields) >= 2
    cont_state = cont_yields[-1][1]
    assert len(cont_state[0]) > len(state[0])


@pytest.fixture(scope="module")
def batched_service():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    svc = MidiGenerationService(params, cfg, batch_size=2, chunk_size=4,
                                context_limit=64, batcher_slots=8)
    yield svc
    svc.batcher_service.close()


def test_batcher_backed_run(batched_service, tmp_path):
    """batcher_slots>0 routes run() through the shared continuous batcher:
    same streaming contract ([B, n, T] chunks + last_output) as the aligned
    path (VERDICT round 2 #3)."""
    svc = batched_service
    req = GenerationRequest(gen_events=6, bpm=100,
                            instruments=["Acoustic Grand"])
    chunks = list(svc.run(req))
    assert chunks, "no streamed chunks"
    assert all(c.shape[0] == 2 for c in chunks)
    total = sum(c.shape[1] for c in chunks)
    assert 0 < total <= 6
    out = np.asarray(svc.last_output)
    assert out.ndim == 3 and out.shape[0] == 2
    paths = svc.finish(out, out_dir=str(tmp_path))
    assert len(paths) == 2


def test_batcher_backed_concurrent_sessions(batched_service):
    """3 concurrent sessions share the one batcher (slot admissions, not a
    session queue) and each receives a complete independent stream."""
    import threading

    svc = batched_service
    results = {}

    def session(i):
        req = GenerationRequest(gen_events=4, bpm=90 + i,
                                temp=0.9 + 0.05 * i)
        results[i] = list(svc.run(req))

    threads = [threading.Thread(target=session, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1, 2}
    for i, chunks in results.items():
        assert chunks and all(c.shape[0] == 2 for c in chunks)
        assert 0 < sum(c.shape[1] for c in chunks) <= 4
