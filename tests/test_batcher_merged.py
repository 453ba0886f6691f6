"""Slot-for-slot parity: the ragged whole-event-loop kernel vs the split
batcher scan.

The continuous batcher's chunk step has two implementations:

- the split scan (`serve/batcher._step_impl`'s `one_event` loop): one token
  row + one event-net step per scan iteration — the portable reference
  semantics;
- the RAGGED merged kernel (`ops/event_loop.merged_decode_ragged`): the
  whole chunk in ONE dispatch with per-slot lengths, retirement, knobs,
  allow planes, and seed streams handled in-kernel.

These tests drive full batcher sessions — staggered admissions, mixed
prompt lengths, mid-chunk eos/budget retirement, slot reuse, per-request
sampling knobs and constraint planes, cache-capacity retirement — through
both implementations (merged in interpret mode on the CPU mesh) and assert
the produced rows and finish reasons are identical per request.

Sampled parity additionally forces the split path through the token-row
kernel (interpret) so both draw from the same per-(seed, position) Gumbel
streams.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import event_loop, token_loop
from midi_model_tpu.serve import batcher as batcher_mod
from midi_model_tpu.serve.batcher import ContinuousBatcher


@pytest.fixture(scope="module")
def tiny():
    # n_embd=512 with 4 heads: head_dim=128 lane-aligns the packed page row
    # without padding, the merged kernel's requirement (same geometry as
    # test_event_loop); n_inner=256 exercises the zero-padded MLP chunk
    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                        n_embd=512, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    return params, config


def _prompt(tok, n_rows: int, seed: int = 0):
    """bos + (n_rows-1) pad rows: ragged lengths with benign content.

    The merged kernel and the split XLA path carry documented bf16-epsilon
    numeric deltas (event_loop.py docstring), so uniformly-random garbage
    prompt rows make greedy near-ties flip between the paths; session-level
    parity uses benign prompts, and the BIT-EXACT ragged coverage lives in
    the kernel-level tests below (ragged vs replicated-aligned references,
    which share every contraction order)."""
    del seed
    rows = np.full((n_rows, tok.max_token_seq), tok.pad_id, np.int32)
    rows[0, 0] = tok.bos_id
    return rows


def _drive(params, config, plan, *, merged_on: bool, greedy: bool,
           split_token_kernel: bool = False, n_slots: int = 4,
           max_seq: int = 64, chunk: int = 5, page_size: int = 8,
           max_steps: int = 60, **batcher_kw):
    """Run a full batcher session under forced merged/split paths.

    ``plan``: list of (submit_at_step, prompt_rows, budget, submit_kwargs).
    Returns {request_id: (rows, reason)} — request ids are assigned in plan
    order on both paths (same submission order), so they correspond.
    """
    saved = (event_loop.usable, event_loop.merged_decode_ragged,
             token_loop.usable, token_loop.decode_token_row)
    batcher_mod._step_jitted.cache_clear()
    try:
        if merged_on:
            event_loop.usable = lambda *a, **k: True
            event_loop.merged_decode_ragged = functools.partial(
                saved[1], interpret=True)
        else:
            event_loop.usable = lambda *a, **k: False
            if split_token_kernel:
                token_loop.usable = lambda *a, **k: True
                token_loop.decode_token_row = functools.partial(
                    saved[3], interpret=True)
        b = ContinuousBatcher(params, config, n_slots=n_slots,
                              max_seq=max_seq, chunk=chunk, greedy=greedy,
                              page_size=page_size, seed=0, **batcher_kw)
        if merged_on:
            assert b._merged is not None, "merged path not engaged"
        else:
            assert b._merged is None
        results = {}
        pending = sorted(plan, key=lambda p: p[0])
        for step_i in range(max_steps):
            while pending and pending[0][0] <= step_i:
                _, prompt, budget, kw = pending.pop(0)
                b.submit(prompt, max_events=budget, **kw)
            if not b.any_active and not pending:
                break
            for f in b.step():
                results[f.request_id] = (f.rows, f.reason)
        assert not pending and not b.any_active, "session did not drain"
        return results
    finally:
        (event_loop.usable, event_loop.merged_decode_ragged,
         token_loop.usable, token_loop.decode_token_row) = saved
        batcher_mod._step_jitted.cache_clear()


def _assert_same(got, ref):
    assert set(got) == set(ref)
    for rid in ref:
        np.testing.assert_array_equal(
            got[rid][0], ref[rid][0],
            err_msg=f"request {rid} rows differ "
                    f"(merged reason={got[rid][1]}, split={ref[rid][1]})")
        assert got[rid][1] == ref[rid][1], f"request {rid} reason"


# NOTE on test design: the merged kernel carries two documented
# bf16-epsilon numeric deltas vs the split XLA path (event_loop.py
# docstring: f32 event-embedding sum; chunk-ordered down-proj partials), so
# greedy near-ties CAN flip between implementations — measured at ~1-2 bf16
# ulps of hidden drift per event.  EXACT parity therefore comes in two
# layers: (a) the kernel-level tests below compare the ragged kernel
# against replicated-aligned references that share every contraction order
# (bit-exact), and (b) the session tests here assert INVARIANCES of the
# merged path that any integration bug (index bookkeeping, retirement,
# admission, splice, seed routing) would break: chunk-size invariance and
# batch-composition invariance, both bit-exact within the merged numerics.
# A semantic cross-check vs the split path pins counts/reasons/grammar.


def test_greedy_chunk_invariance(tiny):
    """Mixed prompt lengths and budgets: the merged batcher must produce
    IDENTICAL per-request rows at chunk=1, 3, and 5 — retirement, index
    advance, and the chunk-boundary hidden hand-off cannot depend on where
    dispatch boundaries fall."""
    params, config = tiny
    tok = config.tokenizer
    plan = [
        (0, _prompt(tok, 1), 7, {}),
        (0, _prompt(tok, 3, seed=1), 11, {}),
        (0, _prompt(tok, 9, seed=2), 4, {}),   # retires mid-chunk (budget)
        (0, _prompt(tok, 2, seed=3), 9, {}),
    ]
    ref = _drive(params, config, plan, merged_on=True, greedy=True, chunk=5)
    for chunk in (1, 3):
        got = _drive(params, config, plan, merged_on=True, greedy=True,
                     chunk=chunk)
        _assert_same(got, ref)


def test_greedy_slot_count_invariance(tiny):
    """A request's greedy stream cannot depend on co-tenants, queueing, or
    which slot it lands in: 2 slots (queued, reused) vs 4 slots (all
    admitted at once) must produce identical per-request rows."""
    params, config = tiny
    tok = config.tokenizer
    plan = [
        (0, _prompt(tok, 1), 6, {}),
        (0, _prompt(tok, 4, seed=1), 8, {}),
        (0, _prompt(tok, 2, seed=2), 5, {}),   # queued behind the first two
        (0, _prompt(tok, 6, seed=3), 7, {}),   # reuses a freed slot
    ]
    wide = _drive(params, config, plan, merged_on=True, greedy=True,
                  n_slots=4)
    narrow = _drive(params, config, plan, merged_on=True, greedy=True,
                    n_slots=2)
    _assert_same(narrow, wide)


def test_sampled_chunk_invariance_seeds_knobs_allow(tiny):
    """Per-request seeds, sampling knobs, and constraint planes: the
    position-keyed draw streams make sampled output chunk-size invariant."""
    params, config = tiny
    tok = config.tokenizer
    plan = [
        (0, _prompt(tok, 1), 6, dict(seed=11, temp=0.9, top_k=8)),
        (0, _prompt(tok, 4, seed=1), 8,
         dict(seed=22, top_p=0.7, disable_channels=[3, 7])),
        (0, _prompt(tok, 2, seed=2), 5,
         dict(seed=33, disable_patch_change=True,
              disable_control_change=True)),
        (0, _prompt(tok, 3, seed=3), 7, dict(seed=44, top_k=4)),
    ]
    ref = _drive(params, config, plan, merged_on=True, greedy=False, chunk=7)
    got = _drive(params, config, plan, merged_on=True, greedy=False, chunk=3)
    _assert_same(got, ref)


def test_capacity_retirement_chunk_invariance(tiny):
    """A slot that hits cache capacity mid-chunk must retire identically
    whether the boundary falls mid-chunk or on it (index clamps, later rows
    pad, reason 'budget')."""
    params, config = tiny
    tok = config.tokenizer
    plan = [
        (0, _prompt(tok, 3, seed=5), 10**6, {}),  # runs into capacity
        (0, _prompt(tok, 1), 5, {}),
    ]
    kw = dict(n_slots=2, max_seq=32, merged_on=True, greedy=True)
    ref = _drive(params, config, plan, chunk=5, **kw)
    got = _drive(params, config, plan, chunk=4, **kw)
    _assert_same(got, ref)
    # the capacity request really was capacity-bound, not budget-bound
    assert ref[0][1] == "budget" and ref[0][0].shape[0] < 10**6
    assert ref[0][0].shape[0] == 32 - 3  # decoded exactly to capacity


def test_merged_vs_split_semantics(tiny):
    """Cross-implementation semantic check (exact rows are epsilon-
    sensitive, see note above): with eos disabled and budget-driven
    retirement, both paths must produce exactly-budget row counts, the same
    finish reasons, and grammar-valid rows (token 0 is an event id)."""
    params, config = tiny
    tok = config.tokenizer
    plan = [
        (0, _prompt(tok, 1), 7, {}),
        (0, _prompt(tok, 5, seed=1), 9, {}),
        (1, _prompt(tok, 2, seed=2), 4, {}),
    ]
    kw = dict(greedy=True, disable_eos=True)
    got = _drive(params, config, plan, merged_on=True, **kw)
    ref = _drive(params, config, plan, merged_on=False, **kw)
    assert set(got) == set(ref)
    first_event_id = tok.eos_id + 1
    n_events = len(tok.events)
    for rid in ref:
        assert got[rid][0].shape == ref[rid][0].shape
        assert got[rid][1] == ref[rid][1]
        tok0 = got[rid][0][:, 0]
        assert ((tok0 >= first_event_id)
                & (tok0 < first_event_id + n_events)).all()


def _interleave(states, l_n, pps, ps, b):
    from midi_model_tpu.ops.paged_allheads import PagedPools

    k = jnp.stack([st.pools.k.reshape(l_n, pps, ps, -1) for st in states],
                  axis=1).reshape(l_n * b * pps, ps, -1)
    v = jnp.stack([st.pools.v.reshape(l_n, pps, ps, -1) for st in states],
                  axis=1).reshape(l_n * b * pps, ps, -1)
    return PagedPools(k=k, v=v)


@pytest.mark.parametrize("greedy", [True, False])
def test_ragged_kernel_bit_exact_vs_aligned(tiny, greedy):
    """KERNEL-level bit-exactness at ragged lengths: each slot of the
    ragged batch must match row-for-row a REPLICATED aligned-kernel run of
    that slot (same batch size, so every contraction order is shared —
    b=1 vs b=4 XLA matmuls reassociate at epsilon and would not compare).
    Covers per-slot work tables, RoPE positions, RMW appends, and the
    per-slot Gumbel stream routing; no retirement (eos disabled)."""
    from midi_model_tpu.ops.paged_allheads import PagedPools
    from midi_model_tpu.sampling import build_mask_table
    from midi_model_tpu.sampling.generate import (_mask_arrays,
                                                  normalize_prompt, prefill)

    params, config = tiny
    tok = config.tokenizer
    lens = [1, 3, 9, 6]
    b, n_ev = len(lens), 5
    l_n = config.net.num_layers
    t_max = tok.max_token_seq
    masks = _mask_arrays(build_mask_table(tok, disable_eos=True))
    merged = event_loop.prepare_inputs(params, config, masks)
    rng = np.random.default_rng(0)

    states = []
    for ln in lens:
        prompt = np.asarray(normalize_prompt(tok, None, 1))
        if ln > 1:
            extra = rng.integers(3, tok.vocab_size, (1, ln - 1, t_max))
            prompt = np.concatenate([prompt, extra], axis=1)
        states.append(prefill(params, config, jnp.asarray(prompt), 64))
    ps = states[0].pools.page_size
    pps = states[0].pools.k.shape[0] // l_n
    index = jnp.asarray(lens, jnp.int32)
    seeds = jnp.arange(b, dtype=jnp.uint32) + 100

    def g_event(e):
        keys = jax.vmap(lambda sd, ix: jax.random.fold_in(
            jax.random.PRNGKey(sd), ix + e))(seeds, index)
        return jnp.swapaxes(
            jax.vmap(lambda k2: jax.random.gumbel(
                k2, (t_max, event_loop.K_CAP), jnp.float32))(keys),
            0, 1).reshape(t_max * b, event_loop.K_CAP)

    gumbel = (jnp.zeros((n_ev, t_max * b, event_loop.K_CAP), jnp.float32)
              if greedy else jax.vmap(g_event)(jnp.arange(n_ev)))

    solo_rows = []
    for s, st in enumerate(states):
        g1 = (gumbel if greedy
              else jnp.repeat(gumbel[:, s::b, :], b, axis=1))
        hid_r = jnp.repeat(st.hidden, b, axis=0)
        k_r = jnp.repeat(st.pools.k.reshape(l_n, 1, pps, ps, -1), b,
                         axis=1).reshape(l_n * b * pps, ps, -1)
        v_r = jnp.repeat(st.pools.v.reshape(l_n, 1, pps, ps, -1), b,
                         axis=1).reshape(l_n * b * pps, ps, -1)
        r, _, _ = event_loop.merged_decode_events(
            merged, config, hid_r, PagedPools(k=k_r, v=v_r), st.cur_len,
            1.0, 0.98, 20, g1, page_size=ps, pages_per_slot=pps,
            n_events=n_ev, greedy=greedy, interpret=True)
        solo_rows.append(np.asarray(r)[:, 0])

    pools_b = _interleave(states, l_n, pps, ps, b)
    hidden_b = jnp.concatenate([st.hidden for st in states], axis=0)
    allow = jnp.ones((b, tok.vocab_size), jnp.float32)
    rows_r, _, pools_r = event_loop.merged_decode_ragged(
        merged, config, hidden_b, pools_b, index, jnp.ones((b,), bool),
        allow, 1.0, 0.98, 20, gumbel, page_size=ps, pages_per_slot=pps,
        n_events=n_ev, greedy=greedy, interpret=True)
    rows_r = np.asarray(rows_r)
    for s in range(b):
        np.testing.assert_array_equal(rows_r[:, s], solo_rows[s],
                                      err_msg=f"slot {s} (len {lens[s]})")
    # appends landed at each slot's own positions: rows len..len+n_ev-1
    k5 = np.asarray(pools_r.k.reshape(l_n, b, pps * ps, -1), np.float32)
    k0 = np.asarray(pools_b.k.reshape(l_n, b, pps * ps, -1), np.float32)
    for s, ln in enumerate(lens):
        changed = np.argwhere((k5[:, s] != k0[:, s]).any(axis=(0, 2)))[:, 0]
        assert set(changed.tolist()) == set(range(ln, ln + n_ev)), \
            f"slot {s} appended rows {changed} != [{ln}, {ln + n_ev})"


def test_ragged_kernel_uniform_matches_aligned(tiny):
    """On a UNIFORM all-alive batch every ragged addition must be an exact
    no-op: rows, xout, and pools bit-identical to merged_decode_events."""
    from midi_model_tpu.sampling import build_mask_table
    from midi_model_tpu.sampling.generate import (_mask_arrays,
                                                  normalize_prompt, prefill)

    params, config = tiny
    tok = config.tokenizer
    b, n_ev = 4, 4
    prompt = np.asarray(normalize_prompt(tok, None, b))
    state = prefill(params, config, jnp.asarray(prompt), 64)
    masks = _mask_arrays(build_mask_table(tok, disable_eos=True))
    merged = event_loop.prepare_inputs(params, config, masks)
    ps = state.pools.page_size
    pps = state.pools.k.shape[0] // (config.net.num_layers * b)
    t_max = tok.max_token_seq
    gumbel = jax.vmap(lambda k2: jax.random.gumbel(
        k2, (t_max * b, event_loop.K_CAP), jnp.float32))(
        jax.random.split(jax.random.PRNGKey(5), n_ev))

    rows_a, xout_a, pools_a = event_loop.merged_decode_events(
        merged, config, state.hidden, state.pools, state.cur_len, 1.0,
        0.98, 20, gumbel, page_size=ps, pages_per_slot=pps, n_events=n_ev,
        interpret=True)
    index = jnp.full((b,), int(state.cur_len), jnp.int32)
    allow = jnp.ones((b, tok.vocab_size), jnp.float32)
    rows_r, xout_r, pools_r = event_loop.merged_decode_ragged(
        merged, config, state.hidden, state.pools, index,
        jnp.ones((b,), bool), allow, 1.0, 0.98, 20, gumbel,
        page_size=ps, pages_per_slot=pps, n_events=n_ev, interpret=True)
    np.testing.assert_array_equal(np.asarray(rows_a), np.asarray(rows_r))
    np.testing.assert_array_equal(np.asarray(xout_a, np.float32),
                                  np.asarray(xout_r, np.float32))
    np.testing.assert_array_equal(np.asarray(pools_a.k, np.float32),
                                  np.asarray(pools_r.k, np.float32))
    np.testing.assert_array_equal(np.asarray(pools_a.v, np.float32),
                                  np.asarray(pools_r.v, np.float32))


def test_seed_reproduces_across_paths(tiny):
    """A seeded request must reproduce the SAME rows whether the batcher
    runs the merged kernel or the split scan (both on Gumbel streams)."""
    params, config = tiny
    tok = config.tokenizer
    plan_alone = [(0, _prompt(tok, 2, seed=9), 6, dict(seed=77))]
    plan_crowded = [
        (0, _prompt(tok, 6, seed=8), 9, dict(seed=1)),
        (0, _prompt(tok, 2, seed=9), 6, dict(seed=77)),
        (1, _prompt(tok, 4, seed=7), 5, dict(seed=2)),
    ]
    alone = _drive(params, config, plan_alone, merged_on=True, greedy=False)
    crowded = _drive(params, config, plan_crowded, merged_on=True,
                     greedy=False)
    np.testing.assert_array_equal(alone[0][0], crowded[1][0])
