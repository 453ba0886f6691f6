"""Numerical parity of the JAX model vs the torch/transformers reference.

Builds the same two-level architecture the reference uses (two
``transformers.LlamaModel`` stacks + a shared linear head,
/root/reference/midi_model.py:102-150) with random weights, converts the torch
state dict into our pytree, and compares hidden states / logits in fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig, LlamaModel  # noqa: E402

from midi_model_tpu.interop import params_from_state_dict  # noqa: E402
from midi_model_tpu.models import MIDIModelConfig, midinet  # noqa: E402
from midi_model_tpu.models.llama import KVCache  # noqa: E402


def tiny_config():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    return cfg


def hf_llama(tc):
    return LlamaModel(LlamaConfig(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        num_attention_heads=tc.num_heads, num_hidden_layers=tc.num_layers,
        intermediate_size=tc.intermediate_size, pad_token_id=0,
        max_position_embeddings=tc.max_position_embeddings, use_cache=False))


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    cfg = tiny_config()
    net = hf_llama(cfg.net).eval()
    net_token = hf_llama(cfg.net_token).eval()
    lm_head = torch.nn.Linear(cfg.n_embd, cfg.tokenizer.vocab_size, bias=False)
    sd = {}
    for prefix, mod in (("net", net), ("net_token", net_token)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()
    sd["lm_head.weight"] = lm_head.weight.detach().numpy()
    params = params_from_state_dict(sd, cfg)
    return cfg, net, net_token, lm_head, params


def test_event_net_parity(models):
    cfg, net, net_token, lm_head, params = models
    rng = np.random.default_rng(0)
    x = rng.integers(0, cfg.tokenizer.vocab_size, (2, 16, 8))

    with torch.no_grad():
        emb = net.embed_tokens(torch.from_numpy(x)).sum(dim=-2)
        ref = net(inputs_embeds=emb).last_hidden_state.numpy()

    ours, _ = midinet.forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-3)


def test_token_net_parity(models):
    cfg, net, net_token, lm_head, params = models
    rng = np.random.default_rng(1)
    hidden = rng.standard_normal((4, cfg.n_embd)).astype(np.float32)
    rows = rng.integers(0, cfg.tokenizer.vocab_size, (4, 7))

    with torch.no_grad():
        th = torch.from_numpy(hidden).unsqueeze(1)
        te = net_token.embed_tokens(torch.from_numpy(rows))
        seq = torch.cat([th, te], dim=1)
        ref = lm_head(net_token(inputs_embeds=seq).last_hidden_state).numpy()

    ours, _ = midinet.forward_token(params, cfg, jnp.asarray(hidden), jnp.asarray(rows))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-3)


def test_cached_decode_matches_uncached(models):
    """Incremental decoding with the ring KV cache == full forward."""
    cfg, _, _, _, params = models
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, cfg.tokenizer.vocab_size, (2, 12, 8)))

    full, _ = midinet.forward(params, cfg, x)

    cache = KVCache.zeros(cfg.net, batch=2, max_seq=16)
    # prefill on the first 8 events, then decode 4 events one at a time
    h_pre, cache = midinet.forward(params, cfg, x[:, :8], cache=cache)
    hs = [h_pre]
    for i in range(8, 12):
        h, cache = midinet.forward(params, cfg, x[:, i : i + 1], cache=cache)
        hs.append(h)
    incremental = jnp.concatenate(hs, axis=1)
    np.testing.assert_allclose(np.asarray(incremental), np.asarray(full),
                               atol=2e-4, rtol=2e-3)
    assert int(cache.index) == 12


def test_train_logits_shapes(models):
    cfg, _, _, _, params = models
    rng = np.random.default_rng(3)
    batch = jnp.asarray(rng.integers(0, cfg.tokenizer.vocab_size, (2, 6, 8)))
    out = midinet.train_logits(params, cfg, batch)
    assert out.logits.shape == (2 * 5, 8, cfg.tokenizer.vocab_size)
    assert out.targets.shape == (2 * 5, 8)


def test_state_dict_roundtrip(models):
    from midi_model_tpu.interop import state_dict_from_params

    cfg, net, _, _, params = models
    sd = state_dict_from_params(params, cfg)
    params2 = params_from_state_dict(sd, cfg)
    for a, b in zip(
        sorted([(str(i), np.asarray(x)) for i, x in enumerate(_leaves(params))]),
        sorted([(str(i), np.asarray(x)) for i, x in enumerate(_leaves(params2))]),
    ):
        np.testing.assert_array_equal(a[1], b[1])


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)
