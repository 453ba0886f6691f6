"""BatcherService: concurrent streaming clients over one shared batch
(VERDICT round 2 #3 — the serving layer the reference's queued-concurrency
app never had)."""

import numpy as np
import pytest

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher
from midi_model_tpu.serve.batcher_service import BatcherService


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def bos_prompt(tok, extra=0):
    rows = [[tok.bos_id] + [tok.pad_id] * (tok.max_token_seq - 1)]
    for i in range(extra):
        rows.append(tok.event2tokens(["set_tempo", 0, 0, 0, 100 + i]))
    return np.asarray(rows, np.int32)


def solo_reference(params, cfg, prompts, budgets):
    """Ground truth: each request decoded greedily in its own batcher."""
    out = []
    for p, budget in zip(prompts, budgets):
        b = ContinuousBatcher(params, cfg, n_slots=2, max_seq=64, chunk=3,
                              greedy=True)
        rid = b.submit(p, max_events=budget)
        out.append(b.run_all()[rid].rows)
    return out


def test_three_interleaved_streams(setup):
    """3 requests (one queued past the 2 slots) stream independently and
    reproduce their solo-batcher greedy rows exactly."""
    cfg, params = setup
    tok = cfg.tokenizer
    prompts = [bos_prompt(tok), bos_prompt(tok, 1), bos_prompt(tok, 2)]
    budgets = [5, 7, 4]
    refs = solo_reference(params, cfg, prompts, budgets)

    svc = BatcherService(ContinuousBatcher(params, cfg, n_slots=2, max_seq=64,
                                           chunk=3, greedy=True))
    try:
        handles = [svc.submit_stream(p, max_events=n)
                   for p, n in zip(prompts, budgets)]
        streams = {}
        for (rid, it), ref in zip(handles, refs):
            rows = [r for chunk in it for r in np.asarray(chunk)]
            streams[rid] = np.asarray(rows, np.int32).reshape(-1, refs[0].shape[-1])
        for (rid, _), ref, budget in zip(handles, refs, budgets):
            got = streams[rid]
            np.testing.assert_array_equal(got, ref)
            fin = svc.results[rid]
            np.testing.assert_array_equal(fin.rows, ref)
            assert fin.reason in ("eos", "budget")
    finally:
        svc.close()


def test_group_streams_aligned_blocks(setup):
    """submit_group: [B, n, T] chunks concatenate to each request's solo rows
    (pad-filled after early finishers)."""
    cfg, params = setup
    tok = cfg.tokenizer
    prompts = [bos_prompt(tok), bos_prompt(tok, 2)]
    budgets = [6, 6]
    refs = solo_reference(params, cfg, prompts, budgets)

    svc = BatcherService(ContinuousBatcher(params, cfg, n_slots=2, max_seq=64,
                                           chunk=3, greedy=True))
    try:
        chunks = list(svc.submit_group(prompts, max_events=6))
        assert all(c.ndim == 3 and c.shape[0] == 2 for c in chunks)
        full = np.concatenate(chunks, axis=1)  # [2, total, T]
        for i, ref in enumerate(refs):
            got = full[i, : len(ref)]
            np.testing.assert_array_equal(got, ref)
            # anything past this stream's end is pad fill
            assert np.all(full[i, len(ref):] == tok.pad_id)
        assert all(f is not None for f in svc.last_group)
    finally:
        svc.close()


def test_group_rejects_oversize(setup):
    cfg, params = setup
    tok = cfg.tokenizer
    svc = BatcherService(ContinuousBatcher(params, cfg, n_slots=2, max_seq=64,
                                           chunk=2))
    try:
        with pytest.raises(ValueError, match="exceeds n_slots"):
            svc.submit_group([bos_prompt(tok)] * 3, max_events=2)
    finally:
        svc.close()
