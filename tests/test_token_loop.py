"""Fused token-row kernel (ops/token_loop.py) vs the XLA scan
(sampling.generate.token_row_scan), in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import token_loop
from midi_model_tpu.sampling.generate import _mask_arrays, token_row_scan
from midi_model_tpu.sampling.masks import build_mask_table


@pytest.fixture(scope="module")
def setup():
    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.float32)
    masks = _mask_arrays(build_mask_table(config.tokenizer))
    b = 4
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (b, config.n_embd), jnp.float32) * 0.5
    return config, params, masks, hidden


def test_greedy_matches_scan(setup):
    """Greedy rows and ended flags are identical to the XLA scan."""
    config, params, masks, hidden = setup
    key = jax.random.PRNGKey(2)
    row_ref, ended_ref = token_row_scan(params, config, hidden, masks,
                                        1.0, 0.98, 20, key, greedy=True)
    row, ended = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 0.98, 20, key, greedy=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(row), np.asarray(row_ref))
    np.testing.assert_array_equal(np.asarray(ended), np.asarray(ended_ref))


def test_topk1_sampling_is_greedy(setup):
    """top_k=1 collapses the categorical draw to the argmax — a deterministic
    check of the full sampled path (mask apply + extraction loop)."""
    config, params, masks, hidden = setup
    key = jax.random.PRNGKey(3)
    row_ref, _ = token_row_scan(params, config, hidden, masks,
                                1.0, 1.0, 1, key, greedy=True)
    row, _ = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 1.0, 1, key, greedy=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(row), np.asarray(row_ref))


def test_sampled_rows_obey_grammar(setup):
    """Sampled tokens always come from the grammar-allowed sets."""
    config, params, masks, hidden = setup
    first, steps_tbl, pad_only = (np.asarray(m) for m in masks)
    tok = config.tokenizer
    row, ended = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 0.98, 20, jax.random.PRNGKey(4),
        greedy=False, interpret=True)
    row = np.asarray(row)
    first_event_id = tok.eos_id + 1
    for r in range(row.shape[0]):
        assert first[row[r, 0]], row[r]
        if row[r, 0] == tok.eos_id:
            assert np.all(row[r, 1:] == tok.pad_id)
            continue
        e = int(np.clip(row[r, 0] - first_event_id, 0, steps_tbl.shape[0] - 1))
        for i in range(1, row.shape[1]):
            assert steps_tbl[e, i, row[r, i]], (r, i, row[r])


def test_forced_pad_rows(setup):
    """forced_pad rows emit all-pad rows (retired batcher slots)."""
    config, params, masks, hidden = setup
    b = hidden.shape[0]
    forced = jnp.asarray([True, False, True, False])
    row, ended = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 0.98, 20, jax.random.PRNGKey(5),
        greedy=False, forced_pad=forced, interpret=True)
    row_ref, ended_ref = token_row_scan(
        params, config, hidden, masks, 1.0, 0.98, 20, jax.random.PRNGKey(5),
        greedy=True, forced_pad=forced)
    row = np.asarray(row)
    pad = config.tokenizer.pad_id
    assert np.all(row[0] == pad) and np.all(row[2] == pad)
    # un-forced rows still decode a grammatical row (not all pad at step 0)
    first = np.asarray(masks[0])
    assert first[row[1, 0]] and first[row[3, 0]]


def test_allow_plane_matches_scan(setup):
    """Per-slot constraint plane: the kernel's banned ids never appear, and
    rows match the XLA scan with the same plane (top_k=1 determinism)."""
    from midi_model_tpu.sampling.masks import build_allow_vector

    config, params, masks, hidden = setup
    tok = config.tokenizer
    b = hidden.shape[0]
    allow_rows = np.ones((b, tok.vocab_size), np.float32)
    allow_rows[0] = build_allow_vector(tok, disable_patch_change=True,
                                       disable_channels=[1, 3])
    allow_rows[2] = build_allow_vector(tok, disable_control_change=True)
    allow = jnp.asarray(allow_rows)
    key = jax.random.PRNGKey(6)
    row_ref, _ = token_row_scan(params, config, hidden, masks,
                                1.0, 1.0, 1, key, greedy=True, allow=allow)
    row, _ = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 1.0, 1, key, greedy=False,
        allow=allow, interpret=True)
    np.testing.assert_array_equal(np.asarray(row), np.asarray(row_ref))
    v = tok.vocab
    banned0 = {v.event_ids["patch_change"], v.param_base("channel") + 1,
               v.param_base("channel") + 3}
    assert not (set(np.asarray(row)[0].tolist()) & banned0)


def test_streamed_mlp_matches_resident(setup):
    """The streamed-MLP layout (deep token nets: MLP weights DMA'd through
    a 2-slot rotation instead of VMEM-resident) is bit-identical to the
    resident kernel — sampled mode, per-row knobs."""
    config, params, masks, hidden = setup
    key = jax.random.PRNGKey(7)
    temp = jnp.asarray([1.0, 0.8, 1.2, 1.0])
    top_p = jnp.asarray([0.98, 0.9, 1.0, 0.5])
    top_k = jnp.asarray([20, 8, 1, 64])
    row_ref, ended_ref = token_loop.decode_token_row(
        params, config, hidden, masks, temp, top_p, top_k, key,
        greedy=False, interpret=True)
    row, ended = token_loop.decode_token_row(
        params, config, hidden, masks, temp, top_p, top_k, key,
        greedy=False, stream_mlp=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(row), np.asarray(row_ref))
    np.testing.assert_array_equal(np.asarray(ended), np.asarray(ended_ref))


def test_streamed_mlp_pads_narrow_ffn():
    """A token net with FFN width < hidden exercises the zero-padded down
    rows / gated lanes (exactness of the padding)."""
    config = MIDIModelConfig.get_config("v2", True, 4, 4, 256, 512)
    # narrow the token net's FFN below hidden (get_config gives ffn/4=128)
    assert config.net_token.intermediate_size < config.net_token.hidden_size
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.float32)
    masks = _mask_arrays(build_mask_table(config.tokenizer))
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (4, config.n_embd), jnp.float32) * 0.5
    key = jax.random.PRNGKey(2)
    row_ref, _ = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 0.98, 20, key, greedy=True,
        interpret=True)
    row, _ = token_loop.decode_token_row(
        params, config, hidden, masks, 1.0, 0.98, 20, key, greedy=True,
        stream_mlp=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(row), np.asarray(row_ref))
