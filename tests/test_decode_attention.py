"""Pallas decode-attention kernel: correctness vs reference einsum
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.ops.decode_attention import S_BLK, decode_attention


def reference_attn(q, ck, cv, li, valid_len):
    k = np.asarray(ck[li], np.float32)  # [B, S, H, D]
    v = np.asarray(cv[li], np.float32)
    qf = np.asarray(q, np.float32)  # [B, H, D]
    d = q.shape[-1]
    scores = np.einsum("bhd,bshd->bhs", qf, k) / np.sqrt(d)
    scores[:, :, valid_len:] = -np.inf
    scores = scores - scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhs,bshd->bhd", probs, v)


@pytest.mark.parametrize("valid_len", [1, 7, S_BLK, S_BLK + 3, 2 * S_BLK])
def test_matches_reference(valid_len):
    rng = np.random.default_rng(0)
    l_n, b, s, h, d = 2, 3, 2 * S_BLK, 4, 64
    ck = jnp.asarray(rng.standard_normal((l_n, b, s, h, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((l_n, b, s, h, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    for li in range(l_n):
        out = decode_attention(q, ck, cv, jnp.int32(li), jnp.int32(valid_len),
                               interpret=True)
        ref = reference_attn(q, ck, cv, li, valid_len)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_ragged_cache_length_rejected():
    """Cache length must be a multiple of the block size (allocator pads)."""
    ck = jnp.zeros((1, 2, S_BLK + 17, 2, 64), jnp.float32)
    q = jnp.zeros((2, 2, 64), jnp.float32)
    with pytest.raises(ValueError, match="multiple of S_BLK"):
        decode_attention(q, ck, ck, jnp.int32(0), jnp.int32(1), interpret=True)
