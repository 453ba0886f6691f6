"""Continuous-batch serving tests (per-slot cache lengths, admission, parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
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


def test_single_request_matches_aligned_greedy(setup):
    """One slot, greedy: must reproduce the aligned jitted generate."""
    from midi_model_tpu.sampling import generate

    cfg, params = setup
    tok = cfg.tokenizer
    prompt = bos_prompt(tok)
    ref = generate(params, cfg, prompt=prompt.astype(np.int64), batch_size=1,
                   max_len=9, greedy=True)

    batcher = ContinuousBatcher(params, cfg, n_slots=2, max_seq=64, chunk=4,
                                greedy=True)
    rid = batcher.submit(prompt, max_events=8)
    results = batcher.run_all()
    assert rid in results
    got = results[rid].rows
    ref_gen = ref[0, 1:]  # drop bos
    n = min(len(got), len(ref_gen))
    assert n > 0
    np.testing.assert_array_equal(got[:n], ref_gen[:n])


def test_multiple_staggered_requests(setup):
    """Requests with different prompts/budgets share the batch and all finish."""
    cfg, params = setup
    tok = cfg.tokenizer
    batcher = ContinuousBatcher(params, cfg, n_slots=2, max_seq=64, chunk=3,
                                seed=7)
    r1 = batcher.submit(bos_prompt(tok), max_events=5)
    r2 = batcher.submit(bos_prompt(tok, extra=2), max_events=7)
    r3 = batcher.submit(bos_prompt(tok, extra=1), max_events=4)  # queued
    results = batcher.run_all()
    assert set(results) == {r1, r2, r3}
    for rid, budget in ((r1, 5), (r2, 7), (r3, 4)):
        fin = results[rid]
        assert fin.reason in ("eos", "budget")
        assert len(fin.rows) <= budget
        if fin.reason == "budget":
            assert len(fin.rows) == budget
        # rows are grammatical
        for row in fin.rows:
            ev = tok.tokens2event(list(row))
            assert ev or row[0] in (tok.pad_id, tok.eos_id)


def test_slot_reuse_after_finish(setup):
    cfg, params = setup
    tok = cfg.tokenizer
    batcher = ContinuousBatcher(params, cfg, n_slots=1, max_seq=64, chunk=2,
                                seed=3)
    r1 = batcher.submit(bos_prompt(tok), max_events=3)
    res1 = batcher.run_all()
    assert r1 in res1
    r2 = batcher.submit(bos_prompt(tok, extra=1), max_events=3)
    res2 = batcher.run_all()
    assert r2 in res2
    assert not batcher.any_active


def test_kv_int8_small_slots_runs_token_kernel(setup):
    """kv_int8 at <=64 slots must never be a compile failure.  Round 2
    fenced the token-row kernel off here after scoped-vmem compile
    rejections; round 4 root-caused those to XLA's custom-fusion cloning
    dropping the kernel's explicit vmem limit (utils/xla_opts.py) and the
    step program now compiles with the scoped default raised — the kernel
    stays on in every configuration and the streams stay correct."""
    cfg, params = setup
    tok = cfg.tokenizer
    batcher = ContinuousBatcher(params, cfg, n_slots=32, max_seq=64, chunk=2,
                                greedy=True, kv_int8=True)
    assert batcher._token_kernel_ok
    big = ContinuousBatcher(params, cfg, n_slots=96, max_seq=64, chunk=2,
                            kv_int8=True)
    assert big._token_kernel_ok
    bf16 = ContinuousBatcher(params, cfg, n_slots=32, max_seq=64, chunk=2)
    assert bf16._token_kernel_ok

    rid = batcher.submit(bos_prompt(tok), max_events=4)
    results = batcher.run_all()
    assert rid in results and len(results[rid].rows) <= 4
    for row in results[rid].rows:
        ev = tok.tokens2event(list(row))
        assert ev or row[0] in (tok.pad_id, tok.eos_id)


def test_deep_net_token_kernel_gate():
    """>16-layer nets (tv2o-large): the token-row kernel's VMEM-resident
    weights + slot-scaled register spills exceed the chip's 128 MB above
    32 slots (measured 141.7 MB at 128; a PHYSICAL limit, not the round-3
    scoped-accounting bug) — above 32 slots the batcher must switch the
    kernel to the streamed-MLP layout (round 5: gate/up/down leave
    residency and double-buffer through a 2-slot rotation)."""
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=20, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    small = ContinuousBatcher(params, cfg, n_slots=32, max_seq=32, chunk=2)
    assert small._token_kernel_ok and not small._token_stream_mlp
    big = ContinuousBatcher(params, cfg, n_slots=96, max_seq=32, chunk=2)
    assert big._token_kernel_ok and big._token_stream_mlp


def test_per_request_constraints_share_batch(setup):
    """Requests with different grammar bans share one batch: the banned ids
    never appear in the constrained stream, and an unconstrained slot's
    stream is bit-identical to a run without the constrained neighbour
    (the allow plane is per-slot, masks.build_allow_vector)."""
    cfg, params = setup
    tok = cfg.tokenizer
    v = tok.vocab

    solo = ContinuousBatcher(params, cfg, n_slots=2, max_seq=64, chunk=4,
                             seed=11, disable_eos=True)
    r_solo = solo.submit(bos_prompt(tok), max_events=6)
    ref_rows = solo.run_all()[r_solo].rows

    both = ContinuousBatcher(params, cfg, n_slots=2, max_seq=64, chunk=4,
                             seed=11, disable_eos=True)
    r_plain = both.submit(bos_prompt(tok), max_events=6)
    banned_channels = [0, 2, 5]
    r_banned = both.submit(bos_prompt(tok), max_events=6,
                           disable_patch_change=True,
                           disable_control_change=True,
                           disable_channels=banned_channels)
    results = both.run_all()

    np.testing.assert_array_equal(results[r_plain].rows, ref_rows)

    banned_ids = {v.event_ids["patch_change"], v.event_ids["control_change"]}
    chan_base = v.param_base("channel")
    banned_ids |= {chan_base + c for c in banned_channels}
    seen = set(np.asarray(results[r_banned].rows).ravel().tolist())
    assert len(results[r_banned].rows) > 0
    assert not (seen & banned_ids), seen & banned_ids
    # a fresh request on the reused slot is unconstrained again
    r_after = both.submit(bos_prompt(tok), max_events=3)
    both.run_all()
    assert np.all(both._allow == 1.0)
    assert r_after is not None


def test_64_slots_construct(setup, monkeypatch):
    """The rounds-2/3 64-slot construction fence is GONE: the crash was the
    embed-gather fusion 60 KB over the DEFAULT scoped-vmem budget, and the
    decode_step_compiler_options() raise _step_jitted() always applies
    clears it (verified on the live v5e 2026-08-19; history in
    tools/repro_64slot_crash.py).  Construction must succeed on every
    backend, including TPU."""
    cfg, params = setup
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ContinuousBatcher(params, cfg, n_slots=64, max_seq=64)


def test_grouped_splice_matches_per_request(setup):
    """An admission wave spliced in ONE dispatch (_splice_group, round 5:
    1 + k device dispatches per wave -> 2) is slot-for-slot identical to
    per-request _splice_slot installs — greedy outputs must match exactly
    across mixed prompt lengths (two prefill buckets) and a padded group
    (g=3 -> gpad=4 with one invalid member)."""
    import midi_model_tpu.serve.batcher as bt

    cfg, params = setup
    tok = cfg.tokenizer
    prompts = [bos_prompt(tok), bos_prompt(tok, extra=2),
               bos_prompt(tok, extra=1), bos_prompt(tok, extra=3),
               bos_prompt(tok)]

    def run(grouped):
        saved = bt._splice_group
        if not grouped:
            def per_request(slots, p_lens, valid, pools, hidden, index,
                            pre_k, pre_v, h_last, **kw):
                s = np.asarray(slots)
                pl = np.asarray(p_lens)
                v = np.asarray(valid)
                for j in range(len(v)):
                    if not v[j]:
                        continue
                    pools, hidden, index = bt._splice_slot(
                        jnp.asarray(s[j]), jnp.asarray(pl[j]), pools,
                        hidden, index, pre_k[:, j: j + 1],
                        pre_v[:, j: j + 1], h_last[j], **kw)
                return pools, hidden, index

            bt._splice_group = per_request
        try:
            b = bt.ContinuousBatcher(params, cfg, n_slots=8, max_seq=64,
                                     chunk=4, greedy=True)
            rids = [b.submit(p, max_events=6) for p in prompts]
            results = b.run_all()
        finally:
            bt._splice_group = saved
        return [np.asarray(results[r].rows) for r in rids]

    for a, c in zip(run(True), run(False)):
        np.testing.assert_array_equal(a, c)
