"""Pallas top-p/top-k sampler kernel (interpret mode): kept-set containment
and distributional agreement with the XLA sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.ops.sampler import sample_top_p_k_tpu
from midi_model_tpu.sampling.topk_topp import sample_top_p_k

TOP_P, TOP_K = 0.9, 6


def _keep_set(p, top_p=TOP_P, top_k=TOP_K):
    """Reference keep rule (/root/reference/midi_model.py:155-159): stable
    descending sort, exclusive-cumsum <= top_p, first top_k."""
    order = np.argsort(-p, kind="stable")
    sp = p[order]
    cs = np.cumsum(sp)
    keep = ((cs - sp) <= top_p) & (np.arange(len(p)) < top_k)
    return set(order[keep])


@pytest.fixture(scope="module")
def probs():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 24)) * 2.0, jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def test_kernel_samples_only_kept_ids_with_right_frequencies(probs):
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    ids = np.asarray(jax.vmap(
        lambda k: sample_top_p_k_tpu(probs, TOP_P, TOP_K, k, k_cap=16,
                                     interpret=True))(keys))
    for b in range(probs.shape[0]):
        p = np.asarray(probs[b])
        keep = _keep_set(p)
        assert set(np.unique(ids[:, b])) <= keep
        freq = np.bincount(ids[:, b], minlength=len(p)) / n
        mask = np.zeros(len(p))
        mask[list(keep)] = 1.0
        expect = p * mask / (p * mask).sum()
        assert np.abs(freq - expect).max() < 0.04


def test_kernel_agrees_with_xla_sampler_distribution(probs):
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    kern = np.asarray(jax.vmap(
        lambda k: sample_top_p_k_tpu(probs, TOP_P, TOP_K, k, k_cap=16,
                                     interpret=True))(keys))
    xla = np.asarray(jax.vmap(
        lambda k: sample_top_p_k(probs, TOP_P, TOP_K, k, k_cap=16))(keys))
    for b in range(probs.shape[0]):
        fk = np.bincount(kern[:, b], minlength=24) / n
        fx = np.bincount(xla[:, b], minlength=24) / n
        assert np.abs(fk - fx).max() < 0.04


def test_kernel_onehot_and_topk1(probs):
    onehot = jnp.zeros((4, 24), jnp.float32).at[:, 3].set(1.0)
    out = sample_top_p_k_tpu(onehot, TOP_P, TOP_K, jax.random.PRNGKey(0),
                             k_cap=16, interpret=True)
    assert np.all(np.asarray(out) == 3)
    # top_k=1 must reduce to greedy for every key
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    g = np.asarray(jax.vmap(
        lambda k: sample_top_p_k_tpu(probs, 1.0, 1, k, k_cap=16,
                                     interpret=True))(keys))
    assert np.all(g == np.argmax(np.asarray(probs), -1)[None])


def test_kernel_unnormalized_input_matches_masked_semantics():
    """Grammar-masked probs (mass < 1) keep the reference cumsum semantics:
    top_p compares against the *unnormalized* masked mass."""
    rng = np.random.default_rng(3)
    p = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 24)), jnp.float32))
    mask = np.zeros((2, 24), np.float32)
    mask[:, 5:11] = 1.0
    masked = p * mask
    keys = jax.random.split(jax.random.PRNGKey(9), 1500)
    ids = np.asarray(jax.vmap(
        lambda k: sample_top_p_k_tpu(masked, 0.5, 16, k, k_cap=16,
                                     interpret=True))(keys))
    for b in range(2):
        keep = _keep_set(np.asarray(masked[b]), top_p=0.5, top_k=16)
        assert set(np.unique(ids[:, b])) <= keep
        assert set(np.unique(ids[:, b])) <= set(range(5, 11))
