"""Pipelined batcher (dispatch N+1 before fetching N) output parity.

``ContinuousBatcher(pipeline=True)`` overlaps the host fetch round-trip with
device compute by keeping one chunk in flight (serve/batcher.py step()).  The
semantics shift by one chunk — admissions and host-side retirements land a
chunk late, and a retired slot decodes one deterministic overshoot chunk that
is discarded via the dispatch-time snapshot — but every request's OUTPUT rows
must be identical to the non-pipelined batcher, for any admission pattern.
(The reference has no batching at all; its loop is app.py:27-120.)
"""

import numpy as np
import pytest

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher


@pytest.fixture(scope="module")
def tiny():
    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                        n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    return params, config


def bos_prompt(tok, extra: int = 0):
    rows = [[tok.bos_id] + [tok.pad_id] * (tok.max_token_seq - 1)]
    for _ in range(extra):
        rows.append([tok.pad_id] * tok.max_token_seq)
    return np.asarray(rows, np.int32)


def run_session(params, config, pipeline, plan, n_slots=2, chunk=3,
                max_steps=200, **kw):
    """Drive a full session; plan = [(submit_at_step, extra, budget, seed)]."""
    tok = config.tokenizer
    b = ContinuousBatcher(params, config, n_slots=n_slots, max_seq=64,
                          chunk=chunk, temp=1.0, top_p=1.0, top_k=8, seed=0,
                          pipeline=pipeline, **kw)
    pending = sorted(plan, key=lambda p: p[0])
    ids, results, streamed = [], {}, {}

    def on_rows(rid, rows):
        streamed.setdefault(rid, []).append(rows)

    for step_i in range(max_steps):
        while pending and pending[0][0] <= step_i:
            _, extra, budget, seed = pending.pop(0)
            ids.append(b.submit(bos_prompt(tok, extra), max_events=budget,
                                seed=seed))
        if not b.any_active and not pending:
            break
        for f in b.step(on_rows=on_rows):
            results[f.request_id] = f
    assert not pending and not b.any_active, "session did not drain"
    streamed = {r: np.concatenate(v) for r, v in streamed.items()}
    return ids, results, streamed


PLAN = [
    # (step, prompt_extra, budget, seed) — staggered admissions + retirement
    # churn so slots get reused while a chunk is in flight
    (0, 0, 5, 11),
    (0, 1, 9, 22),
    (1, 0, 4, 33),
    (3, 2, 7, 44),
    (4, 0, 3, 55),
]


@pytest.mark.parametrize("kw", [dict(), dict(greedy=True)],
                         ids=["sampled", "greedy"])
def test_pipeline_matches_nonpipelined(tiny, kw):
    params, config = tiny
    ids0, ref, stream0 = run_session(params, config, False, PLAN, **kw)
    ids1, got, stream1 = run_session(params, config, True, PLAN, **kw)
    assert ids0 == ids1 and set(ref) == set(got)
    for rid in ref:
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)
        assert ref[rid].reason == got[rid].reason
        # streamed rows == final rows, both modes
        np.testing.assert_array_equal(stream1.get(rid, np.zeros((0, 8))),
                                      got[rid].rows)


def test_pipeline_capacity_retirement(tiny):
    # max_seq tiny so slots retire at cache capacity mid-flight
    params, config = tiny
    plan = [(0, 0, 10**9, 7), (2, 1, 10**9, 8)]
    _, ref, _ = run_session(params, config, False, plan, disable_eos=True)
    _, got, _ = run_session(params, config, True, plan, disable_eos=True)
    for rid in ref:
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)
        assert ref[rid].reason == got[rid].reason == "budget"


def test_pipeline_drains_inflight_chunk(tiny):
    params, config = tiny
    tok = config.tokenizer
    b = ContinuousBatcher(params, config, n_slots=2, max_seq=64, chunk=4,
                          temp=1.0, top_p=1.0, top_k=8, pipeline=True,
                          disable_eos=True)
    b.submit(bos_prompt(tok), max_events=6, seed=1)
    out = b.run_all()
    assert len(out) == 1 and not b.any_active
    (fin,) = out.values()
    assert fin.rows.shape[0] == 6
