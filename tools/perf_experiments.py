"""Micro-experiments for decode-step costs on the real TPU.

Isolates: softmax, top_k, RNG (threefry vs rbg), categorical; and the
token-net step with scanned vs unrolled layers.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet, llama
from midi_model_tpu.models.llama import KVCache
from midi_model_tpu.sampling.topk_topp import sample_top_p_k

B, V, N = 32, 3406, 100


def timed(fn, *args, n=N):
    float(fn(n, *args))  # compile + warm with the same program
    t0 = time.time()
    float(fn(n, *args))
    return (time.time() - t0) / n * 1000


def fresh(i, x):
    """Defeat loop-invariant code motion: a traced-condition select makes the
    operand formally depend on the loop index while always returning x."""
    def sel(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jax.lax.select(i < jnp.int32(0), jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(sel, x)


def chain(body):
    """Build fn(n, x0, extras...) that runs body(i, x0', extras) n times."""

    @functools.partial(jax.jit, static_argnums=(0,))
    def fn(n, *xs):
        def step(acc, i):
            out = body(fresh(i, xs[0]), *xs[1:])
            return acc + out.astype(jnp.float32), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
        return acc

    return fn


def main():
    logits = jnp.zeros((B, V), jnp.float32)
    key_tf = jax.random.PRNGKey(0)
    key_rbg = jax.random.key(0, impl="rbg")

    t = timed(chain(lambda l: jax.nn.softmax(l)[0, 0]), logits)
    print(f"softmax [32,3406]: {t:.3f} ms")

    t = timed(chain(lambda l: jax.lax.top_k(jax.nn.softmax(l), 128)[0][0, 0]), logits)
    print(f"softmax+top_k128: {t:.3f} ms")

    def full_sample(l, k):
        probs = jax.nn.softmax(l)
        return sample_top_p_k(probs, 0.98, 20, k)[0].astype(jnp.float32)

    t = timed(chain(full_sample), logits, key_tf)
    print(f"full sample (threefry key): {t:.3f} ms")
    t = timed(chain(full_sample), logits, key_rbg)
    print(f"full sample (rbg key): {t:.3f} ms")

    def split_sample(l, k):
        k2, sub = jax.random.split(k)
        return full_sample(l, sub)

    t = timed(chain(split_sample), logits, key_tf)
    print(f"split+sample (threefry): {t:.3f} ms")
    t = timed(chain(split_sample), logits, key_rbg)
    print(f"split+sample (rbg): {t:.3f} ms")

    # token net step: scanned vs unrolled layers
    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    hid = jnp.zeros((B, 1, config.n_embd), jnp.bfloat16)
    cache2 = KVCache.zeros(config.net_token, B, 8, jnp.bfloat16)

    def token_step(hid, params, c):
        h, c2 = llama.forward(params["net_token"], config.net_token, hid, cache=c)
        return midinet.lm_head(params, h[:, 0])[0, 0]

    t = timed(chain(token_step), hid, params, cache2)
    print(f"token-net step scanned: {t:.3f} ms")

    # unrolled variant: python loop over layers
    tok_cfg = config.net_token

    def token_step_unrolled(hid, params, c):
        p = params["net_token"]
        positions = c.index + jnp.arange(1)
        t_len = c.k.shape[2]
        bias = jnp.where(jnp.arange(t_len)[None, :] <= positions[:, None],
                         0.0, -jnp.inf)[None, None].astype(jnp.float32)
        cos, sin = llama.rope_cos_sin(positions, tok_cfg.head_dim, tok_cfg.rope_theta)
        x = hid
        for li in range(tok_cfg.num_layers):
            lp = jax.tree.map(lambda a: a[li], p["layers"])
            x, _ = llama._layer(x, lp, tok_cfg, cos, sin, bias,
                                (c.k, c.v, jnp.asarray(li)), c.index)
        x = llama.rms_norm(x, p["final_norm"], tok_cfg.rms_norm_eps)
        return midinet.lm_head(params, x[:, 0])[0, 0]

    t = timed(chain(token_step_unrolled), hid, params, cache2)
    print(f"token-net step unrolled: {t:.3f} ms")

    # event step with XLA attention at two cache lengths
    emb0 = jnp.zeros((B, 1, config.n_embd), jnp.bfloat16)
    for s in (256, 1024):
        cache = KVCache.zeros(config.net, B, s, jnp.bfloat16)

        def event_step(emb, params, c):
            h, _ = llama.forward(params["net"], config.net, emb, cache=c)
            return h[0, 0, 0]

        t = timed(chain(event_step), emb0, params, cache, n=50)
        print(f"event step, cache {s}: {t:.3f} ms")

    # (the round-1 Pallas decode kernel was benchmarked here; it lost to
    # XLA at every cache length 1024/2048/4096 and was cut in round 2 —
    # the Pallas decode path now lives in ops/paged.py.)


if __name__ == "__main__":
    main()
