"""Tensor-parallel continuous batching (serve/batcher.py ``mesh`` with a
``model`` axis > 1): the event net runs Megatron-sharded (heads/mlp
column- and row-parallel, pools lane-sharded, two psums per layer) while
the token net + sampler stay replicated — so the tp batcher must produce
per-slot outputs IDENTICAL to the single-device batcher under greedy
decoding, and compose with data sharding (dp x tp).

This is the tv2o-large bf16 capacity path: high slot counts without int8
(VERDICT round 3 missing #3).
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


def test_tp_matches_single_device_greedy(setup):
    """tp=2 batcher (dp=1) == single-device batcher, slot for slot —
    including mid-run admissions through the tp-sharded group prefill."""
    cfg, params = setup
    tok = cfg.tokenizer
    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    prompts = [bos_prompt(tok), bos_prompt(tok, 2), bos_prompt(tok, 1)]
    budgets = [5, 7, 4]
    kw = dict(n_slots=2, max_seq=64, chunk=3, greedy=True)
    ref = _run(ContinuousBatcher(params, cfg, **kw), prompts, budgets)
    got = _run(ContinuousBatcher(params, cfg, mesh=mesh, **kw),
               prompts, budgets)
    for rid in ref:
        assert ref[rid].reason == got[rid].reason
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)


def test_dp_tp_composed_matches_single_device_greedy(setup):
    """dp=2 x tp=2 mesh: slots split over data, heads over model — still
    slot-for-slot identical to the single-chip batcher."""
    cfg, params = setup
    tok = cfg.tokenizer
    mesh = make_mesh(jax.devices()[:4], dp=2, tp=2)
    prompts = [bos_prompt(tok, i) for i in range(5)]
    budgets = [5, 6, 4, 7, 3]
    kw = dict(n_slots=4, max_seq=64, chunk=3, greedy=True)
    ref = _run(ContinuousBatcher(params, cfg, **kw), prompts, budgets)
    got = _run(ContinuousBatcher(params, cfg, mesh=mesh, **kw),
               prompts, budgets)
    for rid in ref:
        assert ref[rid].reason == got[rid].reason
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)


def test_tp_int8_matches_single_device_int8_greedy(setup):
    """kv_int8 composes with the model axis: each shard carries its own
    128-lane scale row (ops/paged_allheads.alloc_pools ``shards``), and
    per-token-per-head absmax quantization is head-independent — so the
    tp2 int8 batcher is bit-identical to the single-chip int8 batcher."""
    cfg, params = setup
    tok = cfg.tokenizer
    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    prompts = [bos_prompt(tok), bos_prompt(tok, 2), bos_prompt(tok, 1)]
    budgets = [5, 7, 4]
    kw = dict(n_slots=2, max_seq=64, chunk=3, greedy=True, kv_int8=True)
    ref = _run(ContinuousBatcher(params, cfg, **kw), prompts, budgets)
    got = _run(ContinuousBatcher(params, cfg, mesh=mesh, **kw),
               prompts, budgets)
    for rid in ref:
        assert ref[rid].reason == got[rid].reason
        np.testing.assert_array_equal(ref[rid].rows, got[rid].rows)
