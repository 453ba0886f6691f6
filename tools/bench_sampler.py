"""Micro-bench of top-p/top-k sampler variants on TPU (inside-one-dispatch
chained iterations, like profile_decode_fused)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = 32
V = 3406
N = 512
W = 2048  # max grammar window width


def timeit(fn, *args, label=""):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / N * 1e6:.1f} us/iter")


def chained(sample_fn):
    @jax.jit
    def run(logits):
        def body(i, lg):
            probs = jax.nn.softmax(lg, axis=-1)
            t = sample_fn(probs, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return lg + t[:, None].astype(lg.dtype) * 1e-9
        return jax.lax.fori_loop(0, N, body, logits).sum()
    return run


def topk_variant(k_cap):
    def f(probs, key):
        sp, si = jax.lax.top_k(probs, k_cap)
        cs = jnp.cumsum(sp, axis=-1)
        keep = (cs - sp) <= 0.98
        keep &= jnp.arange(k_cap) < 20
        filt = jnp.where(keep, sp, 0.0)
        filt = filt / filt.sum(-1, keepdims=True)
        ch = jax.random.categorical(key, jnp.log(filt))
        return jnp.take_along_axis(si, ch[..., None], -1)[..., 0]
    return f


def approx_variant(k_cap):
    def f(probs, key):
        sp, si = jax.lax.approx_max_k(probs, k_cap, recall_target=0.99)
        cs = jnp.cumsum(sp, axis=-1)
        keep = (cs - sp) <= 0.98
        keep &= jnp.arange(k_cap) < 20
        filt = jnp.where(keep, sp, 0.0)
        filt = filt / filt.sum(-1, keepdims=True)
        ch = jax.random.categorical(key, jnp.log(filt))
        return jnp.take_along_axis(si, ch[..., None], -1)[..., 0]
    return f


def windowed_variant(k_cap, w=W):
    starts = jnp.asarray(np.random.default_rng(0).integers(0, V - w, (B,)),
                         jnp.int32)

    def f(probs, key):
        win = jax.vmap(lambda p, s: jax.lax.dynamic_slice(p, (s,), (w,)))(
            probs, starts)
        sp, si = jax.lax.top_k(win, k_cap)
        cs = jnp.cumsum(sp, axis=-1)
        keep = (cs - sp) <= 0.98
        keep &= jnp.arange(k_cap) < 20
        filt = jnp.where(keep, sp, 0.0)
        filt = filt / filt.sum(-1, keepdims=True)
        ch = jax.random.categorical(key, jnp.log(filt))
        local = jnp.take_along_axis(si, ch[..., None], -1)[..., 0]
        return local + starts
    return f


def iterative_variant(k_cap):
    def f(probs, key):
        def body(i, carry):
            p, vals, idxs = carry
            j = jnp.argmax(p, axis=-1)  # [B]
            v = jnp.take_along_axis(p, j[:, None], -1)[:, 0]
            vals = vals.at[:, i].set(v)
            idxs = idxs.at[:, i].set(j)
            p = p * (jnp.arange(V)[None] != j[:, None])
            return p, vals, idxs
        vals0 = jnp.zeros((B, k_cap), probs.dtype)
        idxs0 = jnp.zeros((B, k_cap), jnp.int32)
        _, sp, si = jax.lax.fori_loop(0, k_cap, body, (probs, vals0, idxs0))
        cs = jnp.cumsum(sp, axis=-1)
        keep = (cs - sp) <= 0.98
        keep &= jnp.arange(k_cap) < 20
        filt = jnp.where(keep, sp, 0.0)
        filt = filt / filt.sum(-1, keepdims=True)
        ch = jax.random.categorical(key, jnp.log(filt))
        return jnp.take_along_axis(si, ch[..., None], -1)[..., 0]
    return f


def main():
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, V)), jnp.float32)
    timeit(chained(topk_variant(128)), logits, label="top_k cap=128 (current)")
    timeit(chained(topk_variant(32)), logits, label="top_k cap=32")
    timeit(chained(approx_variant(128)), logits, label="approx_max_k cap=128")
    timeit(chained(approx_variant(32)), logits, label="approx_max_k cap=32")
    timeit(chained(windowed_variant(128)), logits,
           label="window2048 + top_k cap=128")
    timeit(chained(windowed_variant(32, w=512)), logits,
           label="window512 + top_k cap=32")
    timeit(chained(iterative_variant(32)), logits, label="iterative cap=32")


if __name__ == "__main__":
    main()
