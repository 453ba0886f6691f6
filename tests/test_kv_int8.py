"""int8-quantized KV cache: numerics close to fp, pipeline runs end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.models.llama import KVCache, dequantize_kv, quantize_kv


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 64)) * 3, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 4)
    back = dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(back - x))
    scale = np.asarray(s)[..., None]
    assert (err <= scale * 0.51 + 1e-6).all()  # within half a quant step


def test_int8_decode_close_to_fp(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, cfg.tokenizer.vocab_size, (2, 10, 8)))

    fp_cache = KVCache.zeros(cfg.net, 2, 16)
    h_fp, fp_cache = midinet.forward(params, cfg, x, cache=fp_cache)

    q_cache = KVCache.zeros(cfg.net, 2, 16, quantized=True)
    h_q, q_cache = midinet.forward(params, cfg, x, cache=q_cache)
    assert q_cache.k.dtype == jnp.int8
    assert int(q_cache.index) == 10

    # hidden states agree to quantization noise
    rel = float(jnp.abs(h_q - h_fp).max() / (jnp.abs(h_fp).max() + 1e-9))
    assert rel < 0.05, rel

    # incremental continuation works on the quantized cache
    h2, q_cache = midinet.forward(params, cfg, x[:, :1], cache=q_cache)
    assert int(q_cache.index) == 11


def test_generate_with_int8_cache(setup):
    from midi_model_tpu.sampling import generate

    cfg, params = setup
    tok = cfg.tokenizer
    out = generate(params, cfg, batch_size=2, max_len=10, seed=5, kv_int8=True)
    for b in range(out.shape[0]):
        for row in out[b, 1:]:
            row = row.tolist()
            if row[0] in (tok.eos_id, tok.pad_id):
                continue
            assert tok.tokens2event(row), row
