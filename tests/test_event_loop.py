"""Parity: the whole-event-loop kernel vs the per-event kernel pair.

The merged kernel (ops/event_loop.py) must reproduce — event for event —
what the round-3 path produces: token rows from the token-row kernel
(ops/token_loop.py) and event-net state from the whole-step kernel
(ops/fused_step.py), chained per event with the same per-step Gumbel
streams.  Both references run in interpret mode on the same geometry, so
sampled rows compare EXACTLY (same draws); hidden/pools compare to bf16
tolerance (the merged kernel's event-embedding sum accumulates in f32 and
its chunked down-projection adds f32 partials in chunk order).

A second test drives the INTEGRATED chunk loop (_decode_events_impl with
the merged path monkeypatched usable in interpret mode) against the plain
CPU path in greedy mode — covering the E-dispatch loop, eos rewind, and
tail-handoff logic.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import event_loop, fused_step, token_loop
from midi_model_tpu.sampling import build_mask_table
from midi_model_tpu.sampling.generate import (_decode_events_jitted,
                                              _mask_arrays, decode_events,
                                              normalize_prompt, prefill)


@pytest.fixture(scope="module", params=[256, 1024])
def setup(request):
    """n_inner=256 exercises the zero-padded single MLP chunk (F < D);
    1024 exercises multi-chunk column/row splitting (nf=2)."""
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=512, n_inner=request.param)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    return cfg, params


def _state(cfg, params, b, max_seq):
    prompt = jnp.asarray(normalize_prompt(cfg.tokenizer, None, b))
    return prefill(params, cfg, prompt, max_seq)


@pytest.mark.parametrize("stream_tok", [False, True])
@pytest.mark.parametrize("greedy", [True, False])
def test_merged_matches_kernel_pair(setup, greedy, stream_tok):
    """stream_tok=True forces the tv2o-large layout: the token net's
    gate/up/down ride the weight rotation as packed zero-padded chunks
    (here FFN width < hidden, so the padding path is exercised); rows must
    stay bit-identical to the resident layout."""
    cfg, params = setup
    b, n_ev = 4, 4
    state = _state(cfg, params, b, 64)
    masks = _mask_arrays(build_mask_table(cfg.tokenizer, disable_eos=True))
    temp, top_p, top_k = 1.0, 0.98, 20
    key = jax.random.PRNGKey(7)
    ps = state.pools.page_size
    pps = state.pools.k.shape[0] // (cfg.net.num_layers * b)

    # ---- reference: the round-3 kernel pair, chained per event -----------
    ref_state = state
    fused = fused_step.prepare_fused(params["net"])
    ref_rows = []
    for e in range(n_ev):
        step_key = jax.random.fold_in(key, e)
        row, _ = token_loop.decode_token_row(
            params, cfg, ref_state.hidden, masks, temp, top_p, top_k,
            step_key, greedy=greedy, interpret=True)
        emb = midinet.embed_events(params, row[:, None, :])
        index = jnp.broadcast_to(ref_state.cur_len, (b,))
        h, pools = fused_step.fused_decode_step(
            fused, cfg.net, emb[:, 0], ref_state.pools, index,
            page_size=ps, pages_per_slot=pps, uniform_append=True,
            interpret=True)
        ref_rows.append(np.asarray(row))
        ref_state = ref_state._replace(pools=pools, hidden=h,
                                      cur_len=ref_state.cur_len + 1)

    # ---- merged kernel: same Gumbel streams, one dispatch ----------------
    t_max = cfg.tokenizer.max_token_seq
    if greedy:
        gumbel = jnp.zeros((n_ev, t_max * b, event_loop.K_CAP), jnp.float32)
    else:
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
            jnp.arange(n_ev))
        gumbel = jax.vmap(lambda k2: jax.random.gumbel(
            k2, (t_max * b, event_loop.K_CAP), jnp.float32))(keys)
    merged = event_loop.prepare_inputs(params, cfg, masks,
                                       stream_tok_mlp=stream_tok)
    rows, xout, pools = event_loop.merged_decode_events(
        merged, cfg, state.hidden, state.pools, state.cur_len, temp, top_p,
        top_k, gumbel, page_size=ps, pages_per_slot=pps, n_events=n_ev,
        greedy=greedy, interpret=True)

    got_rows = np.asarray(rows)  # [E, B, T]
    for e in range(n_ev):
        np.testing.assert_array_equal(got_rows[e], ref_rows[e],
                                      err_msg=f"event {e}")
    from midi_model_tpu.models.llama import rms_norm

    hidden = rms_norm(xout, merged["final_norm"], cfg.net.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(hidden, np.float32),
                               np.asarray(ref_state.hidden, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(pools.k, np.float32),
                               np.asarray(ref_state.pools.k, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(pools.v, np.float32),
                               np.asarray(ref_state.pools.v, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_integrated_chunk_loop_greedy(setup, monkeypatch):
    """The E-dispatch loop + tail handoff inside _decode_events_impl must
    reproduce the plain CPU chunk loop row for row (greedy: identical
    sampling on both paths)."""
    cfg, params = setup
    b = 4
    masks = _mask_arrays(build_mask_table(cfg.tokenizer, disable_eos=True))
    key = jax.random.PRNGKey(3)
    n_chunk = 11  # not a multiple of E=4: exercises the tail loop

    def run():
        state = _state(cfg, params, b, 64)
        return decode_events(params, cfg, state, masks, n_chunk, 1.0, 0.98,
                             20, key, greedy=True)

    _, rows_ref, n_ref = run()
    rows_ref = np.asarray(rows_ref)

    monkeypatch.setattr(event_loop, "usable", lambda *a, **k: True)
    monkeypatch.setattr(event_loop, "EVENTS_PER_DISPATCH", 4)
    orig = event_loop.merged_decode_events
    monkeypatch.setattr(event_loop, "merged_decode_events",
                        functools.partial(orig, interpret=True))
    # decode_events caches its jitted impl; the merged gate is a
    # trace-time branch, so force a retrace under the patches (and again
    # after, so later tests don't reuse the interpret-mode trace)
    _decode_events_jitted.cache_clear()
    try:
        _, rows_got, n_got = run()
    finally:
        _decode_events_jitted.cache_clear()

    assert int(n_got) == int(n_ref)
    np.testing.assert_array_equal(np.asarray(rows_got), rows_ref)


@pytest.mark.parametrize("name,expect32,expect64", [
    # (stream_tok_mlp at 32 slots, at 64 slots); None = kernel doesn't fit,
    # split path.  Anchored on 2026-08-19 v5e compile reports: medium/64
    # resident demanded 123.95M of the 117.65M stack limit, streamed 104.99M
    # of 99.65M;
    # large must stream at 32; above 32 slots the slot-scaled
    # stack outgrows VMEM for every model/layout -> split path (None).
    ("tv2o-medium", False, None),
    ("tv2o-large", True, None),
])
def test_plan_layout_matches_measured_matrix(name, expect32, expect64):
    config = MIDIModelConfig.from_name(name)
    params = jax.eval_shape(
        lambda k: midinet.init_params(k, config, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    assert event_loop.plan_layout(params, config, 32) is expect32
    assert event_loop.plan_layout(params, config, 64) is expect64
