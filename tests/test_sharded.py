"""Data-parallel sharded serving (sampling/sharded.py) on the 8-device CPU
mesh: per-shard parity with the single-device decode, and the host loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.parallel.mesh import make_mesh
from midi_model_tpu.sampling.generate import (_mask_arrays, build_mask_table,
                                              decode_events, normalize_prompt,
                                              prefill)
from midi_model_tpu.sampling.sharded import (decode_events_dp, generate_dp,
                                             prefill_dp)


@pytest.fixture(scope="module")
def small():
    # tiny nets, real tokenizer (grammar tables must be real)
    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                        n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    masks = _mask_arrays(build_mask_table(config.tokenizer))
    return config, params, masks


def test_decode_chunk_matches_per_shard(small):
    """One sharded decode chunk == running each shard locally with its
    folded key."""
    config, params, masks = small
    dp = 4
    mesh = make_mesh(jax.devices()[:dp], dp=dp, tp=1)
    b_local, n, max_seq = 2, 4, 64
    b = dp * b_local
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, b))
    key = jax.random.PRNGKey(7)

    state = prefill_dp(params, config, prompt, max_seq, mesh)
    state, rows, n_done = decode_events_dp(
        params, config, state, masks, n, 1.0, 0.98, 20, key, mesh)
    rows = np.asarray(rows)
    assert rows.shape == (b, n, config.tokenizer.max_token_seq)
    assert np.asarray(n_done).shape == (dp,)

    for i in range(dp):
        sl = slice(i * b_local, (i + 1) * b_local)
        st = prefill(params, config, prompt[sl], max_seq)
        st, rows_i, nd = decode_events(
            params, config, st, masks, n, 1.0, 0.98, 20,
            jax.random.fold_in(key, i))
        np.testing.assert_array_equal(rows[sl], np.asarray(rows_i))
        assert int(nd) == int(np.asarray(n_done)[i])


def test_generate_dp_end_to_end(small):
    """Host loop: grammatical rows, right shape, prompt preserved."""
    config, params, masks = small
    mesh = make_mesh(jax.devices(), dp=8, tp=1)
    out = generate_dp(params, config, mesh, batch_size=8, max_len=12,
                      chunk_size=4, seed=3)
    assert out.shape[0] == 8 and out.shape[1] <= 12
    tok = config.tokenizer
    first = np.asarray(masks[0])
    for r in range(8):
        for row in out[r, 1:]:  # row 0 is bos
            assert row[0] == tok.pad_id or first[row[0]]


def test_generate_dp_matches_single_chip_shard(small):
    """generate_dp's first shard == a single-device generate run with the
    shard's key stream (fold_in(chunk_key, 0))."""
    from midi_model_tpu.sampling import generate as gen_mod

    config, params, masks = small
    dp = 2
    mesh = make_mesh(jax.devices()[:dp], dp=dp, tp=1)
    out = generate_dp(params, config, mesh, batch_size=4, max_len=10,
                      chunk_size=10, seed=11)

    # replicate shard 0 by hand: same chunk key derivation as generate_dp
    key = jax.random.PRNGKey(11)
    _, sub = jax.random.split(key)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, 2))
    st = prefill(params, config, prompt, 10)
    st, rows, n_done = decode_events(
        params, config, st, masks, 9, 1.0, 0.98, 20,
        jax.random.fold_in(sub, 0))
    rows = np.asarray(rows[:, : int(n_done)])
    np.testing.assert_array_equal(out[:2, 1:1 + rows.shape[1]], rows)
