"""Parity: the fused whole-step decode kernel vs the split decode_paged path.

Runs the Pallas kernel in interpret mode on a geometry the kernel supports
(MHA, head_stride == head_dim: 4 heads x 128 dims) and checks hidden states
and pool writes against models/llama.decode_paged (whose own parity vs the
dense XLA path is covered by tests/test_paged.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, llama, midinet
from midi_model_tpu.ops import fused_step
from midi_model_tpu.ops.paged_allheads import alloc_pools, pack_heads

PS = 16  # small pages so several blocks per slot get exercised


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=512, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    return cfg, params


def _filled_state(cfg, params, b, pps, lengths, quantized=False):
    """Pools pre-filled with real prefill KV up to each slot's length."""
    net = cfg.net
    max_len = max(lengths)
    prompt = np.asarray(
        np.random.default_rng(0).integers(
            3, 20, (b, max_len, cfg.tokenizer.max_token_seq)), np.int64)
    from midi_model_tpu.models.llama import KVCache

    t_round = -(-max_len // PS) * PS
    cache = KVCache.zeros(net, b, t_round, dtype=jnp.bfloat16)
    emb = midinet.embed_events(params, jnp.asarray(prompt))
    hidden, cache = llama.forward(params["net"], net, emb, cache=cache)

    pools = alloc_pools(net.kv_heads, net.num_layers * b * pps, PS,
                        net.head_dim, jnp.bfloat16, quantized=quantized)

    def pack(pool, flat):  # flat [L, B, T, w]
        l_n = net.num_layers
        w = pool.shape[-1]
        t = flat.shape[2]
        flat = flat.reshape(l_n * b, t // PS, PS, w)
        pool = pool.reshape(l_n * b, pps, PS, w)
        pool = jax.lax.dynamic_update_slice(
            pool, flat.astype(pool.dtype), (0, 0, 0, 0))
        return pool.reshape(-1, PS, w)

    if quantized:
        from midi_model_tpu.ops.paged_allheads import (combine_scales,
                                                       quantize_packed)

        kq, ks = quantize_packed(cache.k, net.kv_heads, net.head_dim)
        vq, vs = quantize_packed(cache.v, net.kv_heads, net.head_dim)
        pools = pools._replace(
            k=pack(pools.k, kq), v=pack(pools.v, vq),
            scales=pack(pools.scales, combine_scales(ks, vs, net.kv_heads)))
    else:
        hd = (net.kv_heads, net.head_dim)
        pools = pools._replace(k=pack(pools.k, pack_heads(cache.k, *hd)),
                               v=pack(pools.v, pack_heads(cache.v, *hd)))
    x = hidden[:, -1]  # any [B, D] works as the step input
    return pools, x


@pytest.mark.parametrize("lengths,active,uniform,exact_tail", [
    ([33, 33, 33, 33], None, False, True),       # aligned uniform
    ([33, 33, 33, 33], None, True, True),  # batched one-DMA RMW (aligned)
    ([40, 7, 17, 0], [True, True, True, False], False, True),  # ragged
    # whole-block tail copies (the >16-layer fallback, e.g. tv2o-large)
    ([40, 7, 17, 33], None, False, False),
])
def test_fused_step_matches_decode_paged(setup, lengths, active, uniform,
                                         exact_tail):
    cfg, params = setup
    net = cfg.net
    b = len(lengths)
    pps = 4  # capacity 64 rows, ppcb=4 -> 1 block of 4 pages... use ppcb=2
    pools, x = _filled_state(cfg, params, b, pps, lengths)
    index = jnp.asarray(lengths, jnp.int32)
    act = None if active is None else jnp.asarray(active)

    ref_h, ref_pools = llama.decode_paged(
        params["net"], net, x, pools, index, act,
        page_size=PS, pages_per_slot=pps, pages_per_compute_block=2)

    fused = fused_step.prepare_fused(params["net"])
    got_h, got_pools = fused_step.fused_decode_step(
        fused, net, x, pools, index, act,
        page_size=PS, pages_per_slot=pps, ppcb=2, uniform_append=uniform,
        exact_tail=exact_tail, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_h, np.float32), np.asarray(ref_h, np.float32),
        rtol=3e-2, atol=3e-2)
    # pool writes: every page that belongs to a valid region must match
    np.testing.assert_allclose(
        np.asarray(got_pools.k, np.float32),
        np.asarray(ref_pools.k, np.float32), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(got_pools.v, np.float32),
        np.asarray(ref_pools.v, np.float32), rtol=3e-2, atol=3e-2)


def test_fused_step_int8_matches_decode_paged(setup):
    """int8 pools: in-kernel dequant + wrapper-side quantized append."""
    cfg, params = setup
    net = cfg.net
    lengths = [33, 20, 7, 33]
    b = len(lengths)
    pps = 4
    pools, x = _filled_state(cfg, params, b, pps, lengths, quantized=True)
    index = jnp.asarray(lengths, jnp.int32)

    ref_h, ref_pools = llama.decode_paged(
        params["net"], net, x, pools, index,
        page_size=PS, pages_per_slot=pps, pages_per_compute_block=2)

    fused = fused_step.prepare_fused(params["net"])
    got_h, got_pools = fused_step.fused_decode_step(
        fused, net, x, pools, index,
        page_size=PS, pages_per_slot=pps, ppcb=2, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got_h, np.float32), np.asarray(ref_h, np.float32),
        rtol=3e-2, atol=3e-2)
    # appended int8 rows may differ by one quantization step where the two
    # paths' bf16 matmuls round differently; scales must agree closely
    np.testing.assert_allclose(
        np.asarray(got_pools.k, np.float32),
        np.asarray(ref_pools.k, np.float32), atol=1.5)
    np.testing.assert_allclose(
        np.asarray(got_pools.v, np.float32),
        np.asarray(ref_pools.v, np.float32), atol=1.5)
    np.testing.assert_allclose(
        np.asarray(got_pools.scales, np.float32),
        np.asarray(ref_pools.scales, np.float32), rtol=2e-2, atol=1e-5)


def test_prepare_fused_shapes(setup):
    cfg, params = setup
    fused = fused_step.prepare_fused(params["net"])
    l_n, d = cfg.net.num_layers, cfg.net.hidden_size
    w = cfg.net.num_heads * cfg.net.head_dim
    assert fused["wqkv"].shape == (l_n, d, 3 * w)
    assert fused["wgu"].shape == (l_n, d, 2 * cfg.net.intermediate_size)
    assert fused["ln"].shape == (l_n, 2, d)
