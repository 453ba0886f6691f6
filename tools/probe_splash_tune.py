"""Focused splash-attention block tune at the training shape.

probe_attn_bwd.py found splash q1024+fused-bwd at 1.19 ms/iter fwd+grad
(vs 8.00 for the shipped JAX flash defaults) and splash fwd alone fastest
at 512 blocks (0.19 ms, 90 TF/s).  This sweeps mixed fwd/bwd block sizes
around those winners to pick the production config.  Same N-differencing
harness (see probe_attn_bwd.py's measurement rule).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N_LO, N_HI = 8, 40


def _sync(out):
    return float(jnp.asarray(out).ravel()[0].astype(jnp.float32))


def _time_calls(fn, variants):
    _sync(fn(*variants[0]))
    _sync(fn(*variants[1]))
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
        print(f"{label}: {ms:.2f} ms/iter{note}", flush=True)
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
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
    print(f"shape [{b},{h},{s},{dh}]")

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    def splash_attn(kw):
        mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)])
        bs = sk.BlockSizes(**kw) if kw else None
        kernel = sk.make_splash_mha(mask, block_sizes=bs, head_shards=1,
                                    q_seq_shards=1)
        vk = jax.vmap(kernel)

        def attn(q, k, v):
            return vk(q * dh**-0.5, k, v)
        return attn

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

    def F(bq, bkv, bkvc, bq_dkv, bkv_dkv, bkv_dkvc):
        return dict(block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
                    block_q_dkv=bq_dkv, block_kv_dkv=bkv_dkv,
                    block_kv_dkv_compute=bkv_dkvc, use_fused_bwd_kernel=True)

    cands = {
        "f512/512 d1024/2048c1024": F(512, 512, 512, 1024, 2048, 1024),
        "f512/1024 d1024/2048c1024": F(512, 1024, 512, 1024, 2048, 1024),
        "f512/1024c1024 d1024/2048c1024": F(512, 1024, 1024, 1024, 2048, 1024),
        "f512/2048c512 d1024/2048c1024": F(512, 2048, 512, 1024, 2048, 1024),
        "f512/512 d1024/2048c512": F(512, 512, 512, 1024, 2048, 512),
        "f512/512 d1024/2048c2048": F(512, 512, 512, 1024, 2048, 2048),
        "f512/512 d512/2048c1024": F(512, 512, 512, 512, 2048, 1024),
        "f256/512 d1024/2048c1024": F(256, 512, 512, 1024, 2048, 1024),
    }
    for name, kw in cands.items():
        try:
            attn = splash_attn(kw)
        except Exception as e:
            print(f"splash {name}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        timeit(variants(chain_grad(attn)), f"splash grad {name}", 3 * fwd_flops)


if __name__ == "__main__":
    main()
