"""Chunked-CE loss must equal the unchunked loss exactly (sum reassociation
only; fp32 tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.train.trainer import loss_fn


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = rng.integers(3, cfg.tokenizer.vocab_size, (2, 17, 8)).astype(np.int32)
    batch[:, -3:, :] = cfg.tokenizer.pad_id
    return cfg, params, jnp.asarray(batch)


@pytest.mark.parametrize("chunk", [8, 16, 31, 1000])
def test_chunked_matches_full(setup, chunk):
    cfg, params, batch = setup
    full, m_full = loss_fn(params, cfg, batch, compute_dtype=jnp.float32)
    chunked, m_chunk = loss_fn(params, cfg, batch, compute_dtype=jnp.float32,
                               token_chunk=chunk)
    assert abs(float(full) - float(chunked)) < 1e-5
    assert abs(float(m_full["acc"]) - float(m_chunk["acc"])) < 1e-6


def test_chunked_gradients_match(setup):
    cfg, params, batch = setup

    def f_full(p):
        return loss_fn(p, cfg, batch, compute_dtype=jnp.float32)[0]

    def f_chunk(p):
        return loss_fn(p, cfg, batch, compute_dtype=jnp.float32,
                       token_chunk=8)[0]

    g1 = jax.grad(f_full)(params)
    g2 = jax.grad(f_chunk)(params)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2)
    assert max(jax.tree.leaves(diffs)) < 2e-5
