"""Paged KV pool ops: append-kernel and paged-attention reference parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.ops import paged


@pytest.fixture(scope="module")
def pool():
    rng = np.random.default_rng(0)
    hkv, n_pages, ps, d = 4, 24, 16, 64
    k = jnp.asarray(rng.normal(size=(hkv, n_pages, ps, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(hkv, n_pages, ps, d)), jnp.float32)
    return k, v


def test_kv_append_kernel_matches_xla(pool):
    """The Pallas append kernel (interpret mode on CPU) == the XLA scatter."""
    k, v = pool
    rng = np.random.default_rng(1)
    b, hkv, d = 3, k.shape[0], k.shape[3]
    new_k = jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.float32)
    new_v = jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.float32)
    pages = jnp.asarray([0, 9, 23], jnp.int32)
    offs = jnp.asarray([5, 0, 15], jnp.int32)

    k_ref, v_ref = paged._kv_append_xla(k, v, new_k, new_v, pages, offs)
    k_pl, v_pl = paged._kv_append_tpu(k, v, new_k, new_v, pages, offs,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(k_pl), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_pl), np.asarray(v_ref))


def test_paged_attention_xla_matches_dense(pool):
    """The XLA reference paged attention == dense masked attention."""
    k_pool, v_pool = pool
    rng = np.random.default_rng(2)
    b, h, d = 3, 8, 64  # GQA groups = 2
    hkv, _, ps, _ = k_pool.shape
    pps = 4
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32) * (d ** -0.5)
    page_indices = jnp.asarray(
        [[0, 1, 2, 3], [8, 9, 10, 11], [20, 21, 22, 23]], jnp.int32)
    lengths = jnp.asarray([37, 0, 64], jnp.int32)  # incl. a skipped row

    out = paged.paged_attention(q, k_pool, v_pool, lengths, page_indices)

    # dense reference
    for row in (0, 2):
        ks = np.concatenate([np.asarray(k_pool[:, p]) for p in
                             np.asarray(page_indices[row])], axis=1)  # [Hkv,T,D]
        vs = np.concatenate([np.asarray(v_pool[:, p]) for p in
                             np.asarray(page_indices[row])], axis=1)
        t = int(lengths[row])
        ks, vs = ks[:, :t], vs[:, :t]
        groups = h // hkv
        ks = np.repeat(ks, groups, axis=0)  # [H, T, D]
        vs = np.repeat(vs, groups, axis=0)
        scores = np.einsum("hd,htd->ht", np.asarray(q[row]), ks)
        p_ = np.exp(scores - scores.max(-1, keepdims=True))
        p_ /= p_.sum(-1, keepdims=True)
        expect = np.einsum("ht,htd->hd", p_, vs)
        np.testing.assert_allclose(np.asarray(out[row]), expect, atol=1e-5)


def test_decode_paged_matches_dense_forward():
    """llama.decode_paged == llama.forward with a dense per-row cache."""
    from midi_model_tpu.models import llama
    from midi_model_tpu.models.config import TransformerConfig

    cfg = TransformerConfig(vocab_size=64, hidden_size=64, num_layers=3,
                            num_heads=4, intermediate_size=128)
    key = jax.random.PRNGKey(0)
    params = llama.init_transformer_params(key, cfg, embed=False)
    b, ps, pps = 4, 8, 4
    cap = ps * pps
    rng = np.random.default_rng(3)

    # build histories of different lengths via the dense per-row path
    lengths = np.asarray([5, 1, 17, 31], np.int32)
    dense = llama.KVCache.zeros(cfg, b, cap, per_row=True)
    hkv, dh, l_n = cfg.kv_heads, cfg.head_dim, cfg.num_layers
    k_pool = jnp.zeros((hkv, l_n * b * pps, ps, dh), jnp.float32)
    v_pool = jnp.zeros_like(k_pool)

    x_hist = jnp.asarray(rng.normal(size=(b, int(lengths.max()), cfg.hidden_size)),
                         jnp.float32) * 0.1
    # feed token-by-token through BOTH paths (per-row dense vs paged)
    idx = jnp.zeros((b,), jnp.int32)
    active_steps = jnp.asarray(lengths)
    h_dense = h_paged = None
    for t in range(int(lengths.max())):
        active = jnp.asarray(t < lengths)
        xt = x_hist[:, t]
        # dense per-row path
        dense_in = llama.KVCache(dense.k, dense.v, idx)
        hd, dense_new = llama.forward(params, cfg, xt[:, None, :],
                                      cache=dense_in)
        dense = llama.KVCache(
            jnp.where(active[None, :, None, None, None], dense_new.k, dense.k),
            jnp.where(active[None, :, None, None, None], dense_new.v, dense.v),
            idx)
        hp, k_pool, v_pool = llama.decode_paged(
            params, cfg, xt, k_pool, v_pool, idx, active,
            page_size=ps, pages_per_slot=pps)
        h_dense = hd[:, 0] if h_dense is None else jnp.where(
            active[:, None], hd[:, 0], h_dense)
        h_paged = hp if h_paged is None else jnp.where(
            active[:, None], hp, h_paged)
        idx = jnp.where(active, idx + 1, idx)

    np.testing.assert_allclose(np.asarray(h_paged), np.asarray(h_dense),
                               atol=2e-5, rtol=1e-5)
