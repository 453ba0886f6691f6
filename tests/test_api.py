"""MIDIModel object-API tests (drop-in surface for reference users)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModel, MIDIModelConfig


@pytest.fixture(scope="module")
def model():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    return MIDIModel(cfg, dtype=jnp.float32)


def test_forward_and_generate(model):
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, model.tokenizer.vocab_size, (1, 4, 8)))
    hidden, _ = model.forward(x)
    assert hidden.shape == (1, 4, model.config.n_embd)
    logits, _ = model.forward_token(hidden[:, -1], x[:, 0, :4])
    assert logits.shape == (1, 5, model.tokenizer.vocab_size)
    out = model.generate(batch_size=2, max_len=6, seed=1)
    assert out.shape[0] == 2 and out.shape[2] == 8
    assert model.param_count() > 0


def test_save_load_roundtrip(model, tmp_path):
    out = tmp_path / "ckpt"
    model.save_pretrained(str(out))
    assert (out / "config.json").exists()
    loaded = MIDIModel.from_pretrained(str(out), dtype=jnp.float32)
    a = model.generate(batch_size=1, max_len=5, greedy=True)
    b = loaded.generate(batch_size=1, max_len=5, greedy=True)
    np.testing.assert_array_equal(a, b)


def test_lora_merge(model, tmp_path):
    from safetensors.numpy import save_file

    from midi_model_tpu.models.lora import init_lora, lora_to_peft_state_dict

    lora = init_lora(jax.random.PRNGKey(5), model.params, rank=2)
    lora["net"]["wq"]["b"] = jnp.ones_like(lora["net"]["wq"]["b"]) * 0.01
    sd = {k: np.asarray(v) for k, v in lora_to_peft_state_dict(lora).items()}
    path = tmp_path / "adapter_model.safetensors"
    save_file(sd, str(path))

    before = np.asarray(model.params["net"]["layers"]["wq"]).copy()
    model.load_merge_lora(str(path))
    after = np.asarray(model.params["net"]["layers"]["wq"])
    assert np.abs(after - before).max() > 1e-5
