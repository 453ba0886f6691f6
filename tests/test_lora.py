"""LoRA param-tree transform tests (apply/merge + peft interop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.models.lora import (
    DEFAULT_TARGETS,
    apply_lora,
    init_lora,
    lora_to_peft_state_dict,
    merge_lora,
    peft_state_dict_to_lora,
)


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_zero_init_is_identity(setup):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = apply_lora(params, lora)
    for t in DEFAULT_TARGETS:
        np.testing.assert_allclose(
            np.asarray(merged["net"]["layers"][t]),
            np.asarray(params["net"]["layers"][t]), atol=1e-6)


def test_apply_changes_weights(setup):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # poke B so the delta is nonzero
    lora["net"]["wq"]["b"] = jnp.ones_like(lora["net"]["wq"]["b"]) * 0.01
    merged = apply_lora(params, lora, alpha=8)
    w0 = np.asarray(params["net"]["layers"]["wq"])
    w1 = np.asarray(merged["net"]["layers"]["wq"])
    assert np.abs(w1 - w0).max() > 1e-5
    # delta matches (alpha/r)·AᵀBᵀ
    a = np.asarray(lora["net"]["wq"]["a"])  # [L, r, in]
    b = np.asarray(lora["net"]["wq"]["b"])  # [L, out, r]
    delta = np.einsum("lri,lor->lio", a, b) * (8 / 4)
    np.testing.assert_allclose(w1 - w0, delta, atol=1e-5)
    # untouched nets unchanged except targets
    np.testing.assert_array_equal(
        np.asarray(merged["net"]["embed"]), np.asarray(params["net"]["embed"]))


def test_peft_roundtrip(setup):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(2), params, rank=4)
    lora["net_token"]["w_down"]["b"] = jnp.full_like(
        lora["net_token"]["w_down"]["b"], 0.5)
    sd = lora_to_peft_state_dict(lora)
    assert any("lora_A" in k for k in sd)
    back = peft_state_dict_to_lora(sd, cfg)
    m1 = merge_lora(params, lora)
    m2 = merge_lora(params, back)
    diffs = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), m1, m2)
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_merged_model_still_runs(setup):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(3), params, rank=2)
    merged = merge_lora(params, lora)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.tokenizer.vocab_size, (1, 4, 8)))
    h, _ = midinet.forward(merged, cfg, x)
    assert h.shape == (1, 4, cfg.n_embd)


def test_peft_library_interop(setup, tmp_path):
    """Our exported adapter loads through the REAL peft library onto a torch
    replica of the reference model, and peft's merge_and_unload produces the
    same effective weights as our merge_lora (ref midi_model.py:109-114)."""
    peft = pytest.importorskip("peft")
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaModel

    from midi_model_tpu.train.checkpoint import CheckpointManager

    cfg, params = setup
    rank, alpha = 4, 8.0
    lora = init_lora(jax.random.PRNGKey(2), params, rank=rank)
    # make the delta nonzero everywhere
    lora = jax.tree.map(
        lambda x: x + 0.01 if x.ndim == 3 else x, lora)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg)
    adapter_dir = mgr.export_peft_adapter(lora, rank=rank, alpha=alpha)

    def hf(tc):
        return LlamaModel(LlamaConfig(
            vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
            num_hidden_layers=tc.num_layers, num_attention_heads=tc.num_heads,
            num_key_value_heads=tc.num_kv_heads or tc.num_heads,
            intermediate_size=tc.intermediate_size,
            max_position_embeddings=tc.max_position_embeddings,
            rms_norm_eps=tc.rms_norm_eps, rope_theta=tc.rope_theta,
            attention_bias=False))

    class Replica(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = hf(cfg.net)
            self.net_token = hf(cfg.net_token)
            self.lm_head = torch.nn.Linear(
                cfg.n_embd, cfg.tokenizer.vocab_size, bias=False)

    torch.manual_seed(0)
    replica = Replica()
    w_before = replica.net.layers[0].self_attn.q_proj.weight.detach().clone()
    wrapped = peft.PeftModel.from_pretrained(replica, adapter_dir)
    merged = wrapped.merge_and_unload()
    w_after = merged.net.layers[0].self_attn.q_proj.weight.detach()

    # peft's merged delta == ours: (alpha/r) * B @ A in torch [out, in] layout
    a = np.asarray(lora["net"]["wq"]["a"][0])  # [r, in]
    b = np.asarray(lora["net"]["wq"]["b"][0])  # [out, r]
    expect_delta = (b @ a) * (alpha / rank)
    got_delta = (w_after - w_before).numpy()
    np.testing.assert_allclose(got_delta, expect_delta, atol=1e-5)
