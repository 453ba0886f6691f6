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


@pytest.mark.parametrize("streaming", [True, False])
@pytest.mark.parametrize("which", ["fp", "int8"])
def test_fused_append_matches_xla(pool, qpool, which, streaming):
    """The in-kernel RMW append (interpret mode) == the XLA scatter, and the
    attention outputs are unchanged by the write (lengths stop before it).
    Covers offset 0, mid-page, and the very last row of a slot's last page."""
    pools = pool if which == "fp" else qpool
    rng = np.random.default_rng(1)
    b, h, hkv, d, ps, pps = 3, 8, 4, 64, 16, 6
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32) * (d ** -0.5)
    lengths = jnp.asarray([37, 0, 95], jnp.int32)
    base = jnp.asarray([0, 6, 12], jnp.int32)
    raw_k = jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.float32)
    raw_v = jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.float32)
    if which == "int8":
        new_k, ks = pa.quantize_packed(raw_k, hkv, d)
        new_v, vs = pa.quantize_packed(raw_v, hkv, d)
        scales = pa.combine_scales(ks, vs, hkv)
    else:
        new_k = pa.pack_heads(raw_k, hkv, d)
        new_v = pa.pack_heads(raw_v, hkv, d)
        scales = None
    wpages = base + lengths // ps
    woffs = lengths % ps

    ref = pa.kv_append(pools, new_k, new_v, wpages, woffs, new_scales=scales)
    o0, m0, l0 = pa.paged_attention_stats(
        q, pools, lengths, base, page_size=ps, pages_per_slot=pps,
        kv_heads=hkv, head_dim=d, ppcb=2, streaming=streaming,
        interpret=True)
    o, m, l, out = pa.paged_attention_stats(
        q, pools, lengths, base, (new_k, new_v, scales, wpages, woffs),
        page_size=ps, pages_per_slot=pps, kv_heads=hkv, head_dim=d,
        ppcb=2, streaming=streaming, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.k), np.asarray(ref.k))
    np.testing.assert_array_equal(np.asarray(out.v), np.asarray(ref.v))
    if which == "int8":
        assert out.k.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(out.scales),
                                      np.asarray(ref.scales))
        np.testing.assert_array_equal(
            np.asarray(pa.split_scales(out.scales[wpages[0], woffs[0]],
                                       hkv)[0]),
            np.asarray(ks[0]))
    np.testing.assert_allclose(np.asarray(o), np.asarray(o0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l0), rtol=1e-6)


@pytest.mark.parametrize("streaming", [True, False])
@pytest.mark.parametrize("which", ["fp", "int8"])
def test_decode_kernel_matches_xla(pool, qpool, which, streaming):
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
        kv_heads=hkv, head_dim=d, ppcb=2, streaming=streaming,
        interpret=True)
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
