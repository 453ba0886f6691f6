"""Microbenchmark the decode-step components on the real TPU.

Note: on the axon tunnel backend ``block_until_ready`` does NOT wait, so every
measurement chains iterations through a data dependency and syncs by fetching
a scalar to host.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet, llama
from midi_model_tpu.models.llama import KVCache
from midi_model_tpu.sampling import build_mask_table, decode_events, prefill
from midi_model_tpu.sampling.generate import _mask_arrays, normalize_prompt
from midi_model_tpu.sampling.topk_topp import sample_top_p_k

B, S = 32, 1024
N = 30


def main():
    config = MIDIModelConfig.from_name("tv2o-medium")
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)

    cache = KVCache.zeros(config.net, B, S, jnp.bfloat16)
    cache = cache._replace(index=jnp.asarray(0, jnp.int32))
    row = jnp.zeros((B, 1, tok.max_token_seq), jnp.int32)

    @functools.partial(jax.jit, static_argnames=('n',))
    def event_step_chain(params, row, cache, n):
        def body(c, _):
            emb = midinet.embed_events(params, row)
            h, c = llama.forward(params["net"], config.net, emb, cache=c)
            c = c._replace(index=jnp.minimum(c.index, S - 2))
            return c, h[0, 0, 0]
        c, hs = jax.lax.scan(body, cache, None, length=n)
        return hs.sum()

    # warm + measure via host fetch (same n: scan length is baked into the
    # compiled program, so warmup must compile the exact timed program)
    float(event_step_chain(params, row, cache, N))
    t0 = time.time()
    float(event_step_chain(params, row, cache, N))
    t_event = (time.time() - t0) / N * 1000
    print(f"event-net cached step (cache {S}): {t_event:.3f} ms")

    cache2 = KVCache.zeros(config.net_token, B, tok.max_token_seq, jnp.bfloat16)
    hid = jnp.zeros((B, 1, config.n_embd), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=('n',))
    def token_step_chain(params, hid, cache2, n):
        def body(c, _):
            h, c = llama.forward(params["net_token"], config.net_token, hid, cache=c)
            c = c._replace(index=jnp.zeros((), jnp.int32))
            logits = midinet.lm_head(params, h[:, 0])
            return c, logits[0, 0]
        c, ls = jax.lax.scan(body, cache2, None, length=n)
        return ls.sum()

    float(token_step_chain(params, hid, cache2, N))
    t0 = time.time()
    float(token_step_chain(params, hid, cache2, N))
    t_token = (time.time() - t0) / N * 1000
    print(f"token-net step + lm_head: {t_token:.3f} ms  (x8 = {8*t_token:.3f})")

    logits = jnp.zeros((B, tok.vocab_size), jnp.float32)
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=('n',))
    def sample_chain(logits, key, n):
        def body(k, _):
            k, sub = jax.random.split(k)
            probs = jax.nn.softmax(logits)
            t = sample_top_p_k(probs, 0.98, 20, sub)
            return k, t[0]
        k, ts = jax.lax.scan(body, key, None, length=n)
        return ts.sum()

    float(sample_chain(logits, key, N))
    t0 = time.time()
    float(sample_chain(logits, key, N))
    t_sample = (time.time() - t0) / N * 1000
    print(f"softmax+top-k sample: {t_sample:.3f} ms  (x8 = {8*t_sample:.3f})")

    # full fused decode
    prompt = jnp.asarray(normalize_prompt(tok, None, B))
    masks = _mask_arrays(build_mask_table(tok, disable_eos=True))
    state = prefill(params, config, prompt, 1 + 1024)
    st, rows, n = decode_events(params, config, state, masks, 8, 1.0, 0.98, 20, key)
    int(n)
    t0 = time.time()
    st, rows, n = decode_events(params, config, st, masks, 256, 1.0, 0.98, 20, key)
    n = int(n)
    dt = (time.time() - t0) / n * 1000
    print(f"full decode per event: {dt:.3f} ms -> {B/(dt/1000):.0f} events/sec")
    print(f"sum of parts: {t_event + 8*(t_token + t_sample):.3f} ms")


if __name__ == "__main__":
    main()
