"""StableHLO export artifact tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.interop.export import export_artifacts, load_artifact
from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.models.llama import KVCache


@pytest.fixture(scope="module")
def setup():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_export_and_reload(setup, tmp_path):
    cfg, params = setup
    out = str(tmp_path / "artifacts")
    manifest = export_artifacts(params, cfg, out, batch_size=1, max_seq=32,
                                dtype=jnp.float32)
    for name in ("event_forward", "token_first", "token_next"):
        assert (tmp_path / "artifacts" / f"{name}.stablehlo").exists()
    assert (tmp_path / "artifacts" / "model.safetensors").exists()
    with open(tmp_path / "artifacts" / "manifest.json") as f:
        m = json.load(f)
    assert m["functions"]["event_forward"]["cache_seq"] == 32

    # the deserialized artifact computes the same hidden as the live model
    fn = load_artifact(str(tmp_path / "artifacts" / "event_forward.stablehlo"))
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.tokenizer.vocab_size, (1, 1, 8)), jnp.int32)
    cache = KVCache.zeros(cfg.net, 1, 32, jnp.float32)
    hidden, ck, cv, idx = fn.call(params, tokens, cache.k, cache.v, cache.index)

    ref_hidden, ref_cache = midinet.forward(params, cfg, tokens, cache=cache)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref_hidden),
                               atol=1e-5)
    assert int(idx) == 1


def test_artifact_generation_matches_jitted_greedy(setup, tmp_path):
    """Config-5 export parity: the host-driven artifact loop reproduces the
    fused jitted loop token-for-token under greedy decoding."""
    from midi_model_tpu.sampling import generate
    from midi_model_tpu.serve.artifact_runner import ArtifactGenerator

    cfg, params = setup
    out = str(tmp_path / "artifacts")
    export_artifacts(params, cfg, out, batch_size=1, max_seq=32,
                     dtype=jnp.float32)
    gen = ArtifactGenerator(out)
    max_len = 10
    art = gen.generate(max_len=max_len, greedy=True)
    ref = generate(params, cfg, batch_size=1, max_len=max_len, greedy=True)
    n = min(art.shape[1], ref.shape[1])
    np.testing.assert_array_equal(art[0, :n], ref[0, :n])
