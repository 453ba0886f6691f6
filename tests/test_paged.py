"""All-heads paged KV pool ops: kernel parity (interpret mode) + decode_paged
vs the dense per-row forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.ops import paged_allheads as pa


@pytest.fixture(scope="module")
def pool():
    rng = np.random.default_rng(0)
    hkv, n_pages, ps, d = 4, 34, 16, 64
    k, v = pa.alloc_pools(hkv, n_pages, ps, d, jnp.float32)
    k = k.at[...].set(np.asarray(pa.pack_heads(
        jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32),
        hkv, d)))
    v = v.at[...].set(np.asarray(pa.pack_heads(
        jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32),
        hkv, d)))
    return k, v


def test_kv_append_kernel_matches_xla(pool):
    """The Pallas append kernel (interpret mode on CPU) == the XLA scatter."""
    k, v = pool
    rng = np.random.default_rng(1)
    b, w = 3, k.shape[-1]
    new_k = jnp.asarray(rng.normal(size=(b, w)), jnp.float32)
    new_v = jnp.asarray(rng.normal(size=(b, w)), jnp.float32)
    pages = jnp.asarray([0, 9, 33], jnp.int32)
    offs = jnp.asarray([5, 0, 15], jnp.int32)

    k_ref, v_ref = pa._kv_append_xla(k, v, new_k, new_v, pages, offs)
    k_pl, v_pl = pa._kv_append_tpu(k, v, new_k, new_v, pages, offs,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(k_pl), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_pl), np.asarray(v_ref))


def test_decode_kernel_matches_xla(pool):
    """The all-heads flash kernel (interpret mode) == dense masked attention,
    including GQA mapping, zero-length skip, and the (m, l) stats."""
    k, v = pool
    rng = np.random.default_rng(2)
    b, h, hkv, d, ps, pps = 5, 8, 4, 64, 16, 6
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32) * (d ** -0.5)
    lengths = jnp.asarray([37, 0, 96, 1, 64], jnp.int32)
    base = jnp.asarray([0, 6, 12, 18, 24], jnp.int32)

    o, m, l = pa.paged_attention_stats(
        q, k, v, lengths, base, page_size=ps, pages_per_slot=pps,
        kv_heads=hkv, head_dim=d, ppcb=2, interpret=True)
    o_r, m_r, l_r = pa._decode_xla(q, k, v, lengths, base, page_size=ps,
                                   pages_per_slot=pps, kv_heads=hkv,
                                   head_dim=d)
    live = np.asarray(lengths) > 0
    np.testing.assert_allclose(np.asarray(o)[live], np.asarray(o_r)[live],
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(m)[live], np.asarray(m_r)[live],
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(l)[live], np.asarray(l_r)[live],
                               rtol=2e-2)
    assert np.all(np.asarray(l)[~live] == 0)


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

    lengths = np.asarray([5, 1, 17, 31], np.int32)
    dense = llama.KVCache.zeros(cfg, b, cap, per_row=True)
    hkv, dh, l_n = cfg.kv_heads, cfg.head_dim, cfg.num_layers
    k_pool, v_pool = pa.alloc_pools(hkv, l_n * b * pps, ps, dh, jnp.float32)

    x_hist = jnp.asarray(rng.normal(size=(b, int(lengths.max()), cfg.hidden_size)),
                         jnp.float32) * 0.1
    idx = jnp.zeros((b,), jnp.int32)
    h_dense = h_paged = None
    for t in range(int(lengths.max())):
        active = jnp.asarray(t < lengths)
        xt = x_hist[:, t]
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
