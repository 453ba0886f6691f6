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


# ---- tensor-parallel decode (model axis) --------------------------------

def test_generate_tp_matches_single_chip():
    """tp=2 Megatron decode (heads + mlp sharded, lane-sharded pools, two
    psums per layer) reproduces single-device greedy generation token for
    token (VERDICT round 2 stretch #9: model-sharded decode for large)."""
    from midi_model_tpu.sampling.generate import generate
    from midi_model_tpu.sampling.sharded import generate_tp, tp_shard_params

    # head geometry that splits cleanly: 8 heads x 32 dims, local 4x32=128
    # lanes (head_stride invariant under the split); mlp 256 -> 128/shard
    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=8,
                                        n_embd=256, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    ref = generate(params, config, batch_size=2, max_len=10, greedy=True)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    sharded = tp_shard_params(params, mesh)
    out = generate_tp(sharded, config, mesh, batch_size=2, max_len=10,
                      greedy=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_generate_tp_int8_matches_single_chip_int8():
    """int8 pools under the model axis: per-shard 128-lane scale rows keep
    each shard's local layout identical to single-chip, and per-head absmax
    quantization is head-independent — greedy decode is bit-identical to
    the single-chip kv_int8 run."""
    from midi_model_tpu.sampling.generate import generate
    from midi_model_tpu.sampling.sharded import generate_tp, tp_shard_params

    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=8,
                                        n_embd=256, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    ref = generate(params, config, batch_size=2, max_len=10, greedy=True,
                   kv_int8=True)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    sharded = tp_shard_params(params, mesh)
    out = generate_tp(sharded, config, mesh, batch_size=2, max_len=10,
                      greedy=True, kv_int8=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tp_local_config_validation():
    from midi_model_tpu.sampling.sharded import tp_local_config

    config = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=8,
                                        n_embd=256, n_inner=256)
    local = tp_local_config(config, 2)
    assert local.net.num_heads == 4 and local.net.intermediate_size == 128
    assert local.net.hidden_size == config.net.hidden_size
    with pytest.raises(ValueError, match="must divide"):
        tp_local_config(config, 3)
