"""Cache growth preserves decode state (bucketed decoding)."""

import numpy as np

import jax

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.sampling import (build_mask_table, decode_events,
                                     grow_cache, prefill)
from midi_model_tpu.sampling.generate import _mask_arrays, normalize_prompt


def test_grown_cache_continues_identically():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    tok = cfg.tokenizer
    prompt = normalize_prompt(tok, None, 2)
    masks = _mask_arrays(build_mask_table(tok))
    key = jax.random.PRNGKey(1)

    # reference: whole run in a big cache
    import jax.numpy as jnp

    s_big = prefill(params, cfg, jnp.asarray(prompt), 16)
    s_big, rows_a, _ = decode_events(params, cfg, s_big, masks, 6, 1.0, 0.98,
                                     20, key, greedy=True)
    s_big, rows_b, _ = decode_events(params, cfg, s_big, masks, 6, 1.0, 0.98,
                                     20, key, greedy=True)

    # bucketed: small cache, grow mid-stream
    s = prefill(params, cfg, jnp.asarray(prompt), 8)
    s, rows_a2, _ = decode_events(params, cfg, s, masks, 6, 1.0, 0.98, 20, key,
                                  greedy=True)
    s = grow_cache(s, 16)
    s, rows_b2, _ = decode_events(params, cfg, s, masks, 6, 1.0, 0.98, 20, key,
                                  greedy=True)

    np.testing.assert_array_equal(np.asarray(rows_a), np.asarray(rows_a2))
    np.testing.assert_array_equal(np.asarray(rows_b), np.asarray(rows_b2))
