"""v1-tokenizer model family: the jitted pipeline works end to end too."""

import numpy as np
import pytest

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.sampling import build_mask_table, generate


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v1", False, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(1), cfg)
    return cfg, params


def test_v1_vocab_and_masks(setup):
    cfg, _ = setup
    tok = cfg.tokenizer
    assert tok.vocab_size == 3239
    table = build_mask_table(tok)
    assert table.n_events == 4
    allowed0 = set(np.nonzero(table.first)[0].tolist())
    assert allowed0 == set(tok.event_ids.values()) | {tok.eos_id}


def test_v1_generation_grammatical(setup):
    cfg, params = setup
    tok = cfg.tokenizer
    out = generate(params, cfg, batch_size=2, max_len=12, seed=9)
    assert out.shape[2] == tok.max_token_seq == 8
    for b in range(out.shape[0]):
        for row in out[b, 1:]:
            row = row.tolist()
            if row[0] in (tok.eos_id, tok.pad_id):
                continue
            assert tok.tokens2event(row), row


def test_v1_roundtrip_through_detokenize(setup):
    cfg, params = setup
    tok = cfg.tokenizer
    rows = [[tok.bos_id] + [tok.pad_id] * 7,
            tok.event2tokens(["set_tempo", 0, 0, 0, 120]),
            tok.event2tokens(["note", 0, 0, 0, 8, 0, 60, 90])]
    prompt = np.asarray(rows, np.int64)
    out = generate(params, cfg, prompt=prompt, batch_size=1, max_len=16, seed=4)
    score = tok.detokenize([list(r) for r in out[0]])
    assert score[0] == 480 and len(score) > 1
    from midi_model_tpu.midi import midi2score, score2midi

    rt = midi2score(score2midi(score))
    assert rt[0] == 480
