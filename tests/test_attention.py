"""Splash-attention backend parity vs the XLA reference path.

The training default on TPU is the splash Pallas kernel
(ops/attention.py:_splash_kernel — pinned block sizes from the round-4
probe sweep).  These tests run it in Pallas INTERPRET mode on CPU and
assert forward and gradient parity against the portable XLA einsum path,
including the odd-length padding path (seq 2047 is the real training
length: 2048 events minus the shifted target row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

attn_mod = importlib.import_module("midi_model_tpu.ops.attention")


@pytest.fixture(autouse=True)
def _interpret_splash(monkeypatch):
    monkeypatch.setattr(attn_mod, "_INTERPRET", True)


def _mask_bias(s):
    causal = jnp.arange(s)[None, :] <= jnp.arange(s)[:, None]
    return jnp.where(causal, 0.0, -jnp.inf)[None, None].astype(jnp.float32)


def _rand_qkv(key, b, s, h, dh, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, dh), dtype)
    k = jax.random.normal(kk, (b, s, h, dh), dtype)
    v = jax.random.normal(kv, (b, s, h, dh), dtype)
    return q, k, v


@pytest.mark.parametrize("s", [512, 513])
def test_splash_forward_matches_xla(s):
    b, h, dh = 1, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, s, h, dh)
    ref = attn_mod.xla_attention(q, k, v, _mask_bias(s))
    out = attn_mod.splash_causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_splash_grads_match_xla():
    # odd length exercises the pad tail: its k/v rows must receive ZERO
    # gradient (only pad q rows see them, and those outputs are sliced off)
    b, s, h, dh = 1, 513, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b, s, h, dh)
    w = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, dh))

    def loss(fn, q, k, v):
        return (fn(q, k, v).astype(jnp.float32) * w).sum()

    ref_fn = lambda q, k, v: attn_mod.xla_attention(q, k, v, _mask_bias(s))
    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(
        lambda *a: loss(attn_mod.splash_causal_attention, *a),
        argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name} mismatch")


def test_splash_kernel_cache_survives_across_programs():
    """Regression: the lru-cached kernel is usually BUILT inside a jit trace;
    without ensure_compile_time_eval its block-mask info leaked that trace's
    tracers into every later program (UnexpectedTracerError on the 2nd jit —
    this killed every bench_train job after the first)."""
    attn_mod._splash_kernel.cache_clear()
    q = jnp.ones((1, 512, 2, 64))

    @jax.jit
    def f1(q):
        return attn_mod.splash_causal_attention(q, q, q).sum()

    @jax.jit
    def f2(q):
        return attn_mod.splash_causal_attention(q, q, q).sum() * 2

    a = float(f1(q))
    b = float(f2(q))
    np.testing.assert_allclose(b, 2 * a, rtol=1e-6)


def test_dispatch_uses_splash_backend(monkeypatch):
    """`auto`→splash selection: backend 'splash' must route causal_full
    training attention through the splash kernel even off-TPU."""
    calls = []
    orig = attn_mod.splash_causal_attention

    def spy(q, k, v):
        calls.append(q.shape)
        return orig(q, k, v)

    monkeypatch.setattr(attn_mod, "splash_causal_attention", spy)
    monkeypatch.setattr(attn_mod, "_BACKEND", "splash")
    b, s, h, dh = 1, 512, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b, s, h, dh)
    out = attn_mod.attention(q, k, v, _mask_bias(s), causal_full=True,
                             cached=False)
    assert calls == [(b, s, h, dh)]
    ref = attn_mod.xla_attention(q, k, v, _mask_bias(s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
