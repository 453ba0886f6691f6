"""All-heads paged KV pool ops: kernel parity (interpret mode) + decode_paged
vs the dense per-row forward, in bf16/f32 and int8-quantized modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.ops import paged_allheads as pa


@pytest.fixture(scope="module")
def pool():
    rng = np.random.default_rng(0)
    hkv, n_pages, ps, d = 4, 34, 16, 64
    pools = pa.alloc_pools(hkv, n_pages, ps, d, jnp.float32)
    k = pools.k.at[...].set(np.asarray(pa.pack_heads(
        jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32),
        hkv, d)))
    v = pools.v.at[...].set(np.asarray(pa.pack_heads(
        jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32),
        hkv, d)))
    return pools._replace(k=k, v=v)


@pytest.fixture(scope="module")
def qpool():
    """int8 pools quantized from random per-page data."""
    rng = np.random.default_rng(4)
    hkv, n_pages, ps, d = 4, 34, 16, 64
    pools = pa.alloc_pools(hkv, n_pages, ps, d, jnp.float32, quantized=True)
    raw_k = jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32)
    raw_v = jnp.asarray(rng.normal(size=(n_pages, ps, hkv, d)), jnp.float32)
    kq, ks = pa.quantize_packed(raw_k, hkv, d)
    vq, vs = pa.quantize_packed(raw_v, hkv, d)
    return pools._replace(k=kq, v=vq, scales=pa.combine_scales(ks, vs, hkv))


def test_kv_append_kernel_matches_xla(pool):
    """The Pallas append kernel (interpret mode on CPU) == the XLA scatter."""
    rng = np.random.default_rng(1)
    b, w = 3, pool.k.shape[-1]
    new_k = jnp.asarray(rng.normal(size=(b, w)), jnp.float32)
    new_v = jnp.asarray(rng.normal(size=(b, w)), jnp.float32)
    pages = jnp.asarray([0, 9, 33], jnp.int32)
    offs = jnp.asarray([5, 0, 15], jnp.int32)

    ref = pa.kv_append(pool, new_k, new_v, pages, offs)  # XLA path on CPU
    k_pl, v_pl = pa._kv_append_tpu([pool.k, pool.v], [new_k, new_v],
                                   pages, offs, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_pl), np.asarray(ref.k))
    np.testing.assert_array_equal(np.asarray(v_pl), np.asarray(ref.v))


def test_kv_append_quantized(qpool):
    """Quantized append writes int8 rows + combined scale rows on both paths."""
    rng = np.random.default_rng(5)
    hkv, d = 4, 64
    b = 3
    raw = jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.float32)
    new_k, ks = pa.quantize_packed(raw, hkv, d)
    new_v, vs = pa.quantize_packed(raw * 2, hkv, d)
    scales = pa.combine_scales(ks, vs, hkv)
    pages = jnp.asarray([1, 8, 30], jnp.int32)
    offs = jnp.asarray([3, 0, 15], jnp.int32)

    ref = pa.kv_append(qpool, new_k, new_v, pages, offs, new_scales=scales)
    out = pa._kv_append_tpu(
        [qpool.k, qpool.v, qpool.scales],
        [new_k, new_v, scales], pages, offs, interpret=True)
    for a, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
    assert ref.k.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(ref.k[1, 3]), np.asarray(new_k[0]))
    np.testing.assert_array_equal(
        np.asarray(pa.split_scales(ref.scales[1, 3], hkv)[0]),
        np.asarray(ks[0]))


@pytest.mark.parametrize("which", ["fp", "int8"])
def test_decode_kernel_matches_xla(pool, qpool, which):
    """The all-heads flash kernel (interpret mode) == dense masked attention,
    including GQA mapping, zero-length skip, the (m, l) stats, and in-kernel
    int8 dequantization."""
    pools = pool if which == "fp" else qpool
    rng = np.random.default_rng(2)
    b, h, hkv, d, ps, pps = 5, 8, 4, 64, 16, 6
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32) * (d ** -0.5)
    lengths = jnp.asarray([37, 0, 96, 1, 64], jnp.int32)
    base = jnp.asarray([0, 6, 12, 18, 24], jnp.int32)

    o, m, l = pa.paged_attention_stats(
        q, pools, lengths, base, page_size=ps, pages_per_slot=pps,
        kv_heads=hkv, head_dim=d, ppcb=2, interpret=True)
    o_r, m_r, l_r = pa._decode_xla(q, pools, lengths, base, page_size=ps,
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


def _run_decode_paged_vs_dense(quantized: bool):
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
    pools = pa.alloc_pools(hkv, l_n * b * pps, ps, dh, jnp.float32,
                           quantized=quantized)

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
        hp, pools = llama.decode_paged(
            params, cfg, xt, pools, idx, active,
            page_size=ps, pages_per_slot=pps)
        h_dense = hd[:, 0] if h_dense is None else jnp.where(
            active[:, None], hd[:, 0], h_dense)
        h_paged = hp if h_paged is None else jnp.where(
            active[:, None], hp, h_paged)
        idx = jnp.where(active, idx + 1, idx)
    return np.asarray(h_paged), np.asarray(h_dense)


def test_decode_paged_matches_dense_forward():
    """llama.decode_paged == llama.forward with a dense per-row cache."""
    h_paged, h_dense = _run_decode_paged_vs_dense(quantized=False)
    np.testing.assert_allclose(h_paged, h_dense, atol=2e-5, rtol=1e-5)


def test_decode_paged_int8_close_to_dense_forward():
    """Quantized pools track the exact forward to int8 noise."""
    h_paged, h_dense = _run_decode_paged_vs_dense(quantized=True)
    rel = np.abs(h_paged - h_dense).max() / (np.abs(h_dense).max() + 1e-9)
    assert rel < 0.05, rel
