"""Kernel-level probe: flash-attention fwd+bwd time at the TRAINING shape.

The train step's backward runs at 3.2x forward where the fwd+bwd=3xfwd
convention predicts 2x (BASELINE.md config 4 attribution), and the JAX
flash kernel's backward (default 128-blocks, untuned) is the prime suspect.
This times the attention op ALONE — fwd and grad — at [B, H, S, Dh] =
(2|8, 16, 2048, 64) across BlockSizes candidates, plus the newer splash
kernel, so block tuning happens at kernel granularity instead of via
full-train-step recompiles (~2 min each on the axon tunnel).

MEASUREMENT RULE (learned here): on the axon tunnel,
``block_until_ready`` can return BEFORE the device work completes — for
some programs (the JAX flash kernel chains) EVERY call returns early and
the timings read as 0 ms.  The only reliable sync is a device->host
readback, so each timed call ends with ``jnp.asarray(out).ravel()[0]``
materialized via ``float()``.  The harness: compiles, runs one throwaway
timed call, then reports the MEAN of 3 further calls — each with a
unique input tensor.  The tunnel adds a ~31 ms FIXED overhead per
dispatch, so per-iter time is computed by N-DIFFERENCING: the chain is
compiled at N=8 and N=40 and per-iter = (T40 - T8) / 32, which cancels
the fixed overhead exactly.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N_LO, N_HI = 8, 40


def _sync(out):
    # device->host readback: the only wait the axon tunnel honors.
    return float(jnp.asarray(out).ravel()[0].astype(jnp.float32))


def _time_calls(fn, variants):
    _sync(fn(*variants[0]))  # compile
    _sync(fn(*variants[1]))  # throwaway (phantom-fast)
    times = []
    for args in variants[2:]:
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return sum(times) / len(times)


def timeit(make_fn, label, flops_per_iter=None):
    try:
        fns, variants = make_fn()
        t_lo = _time_calls(fns[0], variants)
        t_hi = _time_calls(fns[1], variants)
        ms = (t_hi - t_lo) / (N_HI - N_LO) * 1000
        note = ""
        if flops_per_iter:
            note = f"  [{flops_per_iter / (ms / 1e3) / 1e12:.1f} TF/s]"
        print(f"{label}: {ms:.2f} ms/iter{note}")
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}")
        return float("inf")


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h, s, dh = 16, 2048, 64
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    k = jax.random.normal(keys[0], (b, h, s, dh), jnp.bfloat16)
    v = jax.random.normal(keys[1], (b, h, s, dh), jnp.bfloat16)
    qs = [jax.random.normal(kk, (b, h, s, dh), jnp.bfloat16)
          for kk in jax.random.split(keys[2], 6)]

    fwd_flops = b * h * 2 * (s * s / 2) * dh * 2
    print(f"shape [{b},{h},{s},{dh}]; causal fwd {fwd_flops/1e9:.1f} GFLOP "
          f"-> {fwd_flops/197e12*1e3:.3f} ms at v5e peak")

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    def chain_fwd(attn):
        def make(n):
            def f(q, k, v):
                def body(i, acc):
                    return attn(acc, k, v).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, n, body, q)
            return jax.jit(f)
        return make(N_LO), make(N_HI)

    def chain_grad(attn):
        def loss(q, k, v):
            o = attn(q, k, v)
            return (o.astype(jnp.float32) ** 2).sum() * 1e-6

        g = jax.grad(loss, argnums=(0, 1, 2))

        def make(n):
            def f(q, k, v):
                def body(i, qq):
                    dq, dk, dv = g(qq, k, v)
                    return (qq + dq * 1e-9 + dk * 1e-9 + dv * 1e-9
                            ).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, n, body, q)
            return jax.jit(f)
        return make(N_LO), make(N_HI)

    def variants(fn):
        return lambda: (fn, [(q, k, v) for q in qs])

    def BS(qb, kb, bq_dkv=None, bk_dkv=None, bq_dq=None, bk_dq=None):
        return fa.BlockSizes(
            block_q=qb, block_k_major=kb, block_k=kb, block_b=1,
            block_q_major_dkv=bq_dkv or qb, block_k_major_dkv=bk_dkv or kb,
            block_k_dkv=bk_dkv or kb, block_q_dkv=bq_dkv or qb,
            block_k_major_dq=bk_dq or kb, block_k_dq=bk_dq or kb,
            block_q_dq=bq_dq or qb)

    cands = {
        "default(128s)": None,
        "q256k256": BS(256, 256),
        "q512k512": BS(512, 512),
        "q512k1024": BS(512, 1024),
        "q1024k1024": BS(1024, 1024),
        "q2048k2048": BS(2048, 2048),
    }
    for name, bs in cands.items():
        def attn(q, k, v, bs=bs):
            return fa.flash_attention(q, k, v, causal=True,
                                      sm_scale=dh**-0.5, block_sizes=bs)
        f = timeit(variants(chain_fwd(attn)), f"flash fwd  {name}",
                   fwd_flops)
        g = timeit(variants(chain_grad(attn)), f"flash grad {name}",
                   3 * fwd_flops)
        print(f"  -> bwd-only ~{g - f:.2f} ms = {(g-f)/max(f,1e-9):.1f}x fwd")

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    def splash_attn(bs_kwargs):
        mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)])
        bs = sk.BlockSizes(**bs_kwargs) if bs_kwargs else None
        kernel = sk.make_splash_mha(mask, block_sizes=bs, head_shards=1,
                                    q_seq_shards=1)
        vk = jax.vmap(kernel)

        def attn(q, k, v):
            return vk(q * dh**-0.5, k, v)
        return attn

    for label, kw in {
        "default": None,
        "q512kv512": dict(block_q=512, block_kv=512, block_kv_compute=512,
                          block_q_dkv=512, block_kv_dkv=512,
                          block_kv_dkv_compute=512, block_q_dq=512,
                          block_kv_dq=512),
        "q1024fused": dict(block_q=1024, block_kv=1024,
                           block_kv_compute=1024, block_q_dkv=1024,
                           block_kv_dkv=1024, block_kv_dkv_compute=1024,
                           use_fused_bwd_kernel=True),
        "q2048fused": dict(block_q=2048, block_kv=2048,
                           block_kv_compute=2048, block_q_dkv=2048,
                           block_kv_dkv=2048, block_kv_dkv_compute=2048,
                           use_fused_bwd_kernel=True),
    }.items():
        try:
            attn = splash_attn(kw)
        except Exception as e:
            print(f"splash {label}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        f = timeit(variants(chain_fwd(attn)), f"splash fwd  {label}",
                   fwd_flops)
        g = timeit(variants(chain_grad(attn)), f"splash grad {label}",
                   3 * fwd_flops)
        print(f"  -> bwd-only ~{g - f:.2f} ms = {(g-f)/max(f,1e-9):.1f}x fwd")

    # XLA dense reference (known to fail at 2047; try 2048)
    def xla_attn(q, k, v):
        bias = jnp.where(jnp.arange(s)[None, :] <= jnp.arange(s)[:, None],
                         0.0, -jnp.inf).astype(jnp.float32)
        sc = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * dh**-0.5
        p = jax.nn.softmax(sc + bias, axis=-1).astype(q.dtype)
        return jnp.einsum("bhst,bhtd->bhsd", p, v,
                          preferred_element_type=jnp.float32)

    f = timeit(variants(chain_fwd(xla_attn)), "xla fwd ", fwd_flops)
    g = timeit(variants(chain_grad(xla_attn)), "xla grad", 3 * fwd_flops)
    print(f"  -> bwd-only ~{g - f:.2f} ms = {(g-f)/max(f,1e-9):.1f}x fwd")


if __name__ == "__main__":
    main()
