"""Multi-chip continuous batching: slots sharded over the mesh's data axis.

Proves the shard_map'd batcher (serve/batcher.py ``mesh=``) produces
per-slot outputs identical to the single-device batcher under greedy
decoding, with admission/retirement running unchanged on the host.
"""

import numpy as np
import pytest

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.parallel.mesh import make_mesh
from midi_model_tpu.serve.batcher import ContinuousBatcher


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


def _run(batcher, prompts, budgets):
    rids = [batcher.submit(p, b) for p, b in zip(prompts, budgets)]
    results = batcher.run_all()
    assert set(results) == set(rids)
    return {r: results[r] for r in rids}


def test_dp_matches_single_device_greedy(setup):
    """4-way data-sharded batcher == single-device batcher, slot for slot,
    including queued admissions reusing freed slots mid-run."""
    cfg, params = setup
    tok = cfg.tokenizer
    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    prompts = [bos_prompt(tok), bos_prompt(tok, 2), bos_prompt(tok, 1),
               bos_prompt(tok, 3), bos_prompt(tok)]
    budgets = [5, 7, 4, 6, 3]
    kw = dict(n_slots=4, max_seq=64, chunk=3, greedy=True)
    ref = _run(ContinuousBatcher(params, cfg, **kw), prompts, budgets)
    got = _run(ContinuousBatcher(params, cfg, mesh=mesh, **kw),
               prompts, budgets)
    for rid in ref:
        assert ref[rid].reason == got[rid].reason
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)


def test_dp_8way_staggered_submission(setup):
    """8 shards, 1 slot each; a request submitted mid-flight lands in a freed
    slot and still matches the aligned jitted generate."""
    from midi_model_tpu.sampling import generate

    cfg, params = setup
    tok = cfg.tokenizer
    mesh = make_mesh(jax.devices(), dp=8, tp=1)
    batcher = ContinuousBatcher(params, cfg, n_slots=8, max_seq=64, chunk=4,
                                greedy=True, mesh=mesh)
    r1 = batcher.submit(bos_prompt(tok), max_events=6)
    results = {}
    for fin in batcher.step():
        results[fin.request_id] = fin
    r2 = batcher.submit(bos_prompt(tok, extra=2), max_events=5)
    for fin in batcher.run_all().items():
        results[fin[0]] = fin[1]
    assert {r1, r2} <= set(results)

    for rid, prompt in ((r1, bos_prompt(tok)), (r2, bos_prompt(tok, extra=2))):
        ref = generate(params, cfg, prompt=prompt.astype(np.int64),
                       batch_size=1, max_len=prompt.shape[0] + 8, greedy=True)
        ref_gen = ref[0, prompt.shape[0]:]
        got = results[rid].rows
        n = min(len(got), len(ref_gen))
        assert n > 0
        np.testing.assert_array_equal(got[:n], ref_gen[:n])


def test_dp_requires_divisible_slots(setup):
    cfg, params = setup
    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    with pytest.raises(ValueError, match="divisible"):
        ContinuousBatcher(params, cfg, n_slots=6, mesh=mesh)
