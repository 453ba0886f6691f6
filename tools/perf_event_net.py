"""Event-net decode-step decomposition on the real TPU.

Answers: of the ~2-2.6 ms/step the event net costs at bs=32 (cache 513),
how much is the matmul weight stream, how much the paged attention kernel,
and what does fusing qkv / gate+up into single matmuls buy?

All probes chain N iterations inside one dispatch (fori_loop with data
dependencies) so the axon tunnel's ~35 ms dispatch floor cancels.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, llama, midinet
from midi_model_tpu.ops.paged_allheads import alloc_pools

B = 32
N = 64
CACHE = 513


def timeit(fn, *args, label="", n=N):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best / n * 1000:.3f} ms/iter ({best*1e3:.0f} ms / {n})")
    return best / n


def main():
    config = MIDIModelConfig.from_name("tv2o-medium")
    net = config.net
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    lp = params["net"]["layers"]
    d, h, hkv, dh, f = (net.hidden_size, net.num_heads, net.kv_heads,
                        net.head_dim, net.intermediate_size)
    ln = net.num_layers
    x0 = jnp.zeros((B, d), jnp.bfloat16)

    # --- 1. matmuls only (7 per layer, layer scan, no attention) ---------
    @jax.jit
    def matmuls_only(x0, lp):
        def body(i, x):
            def layer(xx, w):
                q = xx @ w["wq"]
                k = xx @ w["wk"]
                v = xx @ w["wv"]
                attn = q + jnp.concatenate([k, v], -1)[:, : q.shape[-1]]
                xx = xx + attn @ w["wo"]
                gated = jax.nn.silu(xx @ w["w_gate"]) * (xx @ w["w_up"])
                return xx + gated @ w["w_down"], None
            x, _ = jax.lax.scan(layer, x, lp)
            return x * 1e-6
        return jax.lax.fori_loop(0, N, body, x0).astype(jnp.float32).sum()

    timeit(matmuls_only, x0, lp, label="matmuls only (7/layer, scan x12)")

    # --- 2. matmuls fused: qkv one [d, 3d], gate+up one [d, 2f] ----------
    wqkv = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=-1)
    wgu = jnp.concatenate([lp["w_gate"], lp["w_up"]], axis=-1)
    fused = {"wqkv": wqkv, "wgu": wgu, "wo": lp["wo"], "w_down": lp["w_down"]}

    @jax.jit
    def matmuls_fused(x0, fused):
        def body(i, x):
            def layer(xx, w):
                qkv = xx @ w["wqkv"]
                attn = (qkv[:, :d] + qkv[:, d:d + hkv * dh]
                        + qkv[:, d + hkv * dh:][:, :d])
                xx = xx + attn @ w["wo"]
                gu = xx @ w["wgu"]
                gated = jax.nn.silu(gu[:, :f]) * gu[:, f:]
                return xx + gated @ w["w_down"], None
            x, _ = jax.lax.scan(layer, x, fused)
            return x * 1e-6
        return jax.lax.fori_loop(0, N, body, x0).astype(jnp.float32).sum()

    timeit(matmuls_fused, x0, fused, label="matmuls fused (4/layer, scan x12)")

    # --- 3. paged attention kernel only (12 layers, cache 513) -----------
    ps, pps = 64, 12  # capacity 768
    pools = alloc_pools(hkv, ln * B * pps, ps, dh, jnp.bfloat16)
    index = jnp.full((B,), CACHE, jnp.int32)
    slot_ids = jnp.arange(B, dtype=jnp.int32)

    from midi_model_tpu.ops import paged_allheads as pa

    @jax.jit
    def attn_only(q0, pools):
        lengths = index
        def body(i, carry):
            q, pools = carry
            def layer(carry2, _):
                q, pools, li = carry2
                base = (li * B + slot_ids) * pps
                kq = q.reshape(B, hkv, dh)
                write = (pa.pack_heads(kq, hkv, dh),
                         pa.pack_heads(kq, hkv, dh), None)
                o, m, l, pools = pa.paged_attention_stats(
                    q, pools, lengths, base,
                    write + (base + CACHE // ps, CACHE % ps),
                    page_size=ps, pages_per_slot=pps, kv_heads=hkv,
                    head_dim=dh, ppcb=4, streaming=False)
                q = q + o.reshape(B, h * dh).astype(q.dtype) * 1e-6
                return (q, pools, li + 1), None
            (q, pools, _), _ = jax.lax.scan(
                layer, (q, pools, jnp.zeros((), jnp.int32)),
                None, length=ln)
            return (q, pools)
        q, pools = jax.lax.fori_loop(0, N, body, (q0, pools))
        return q.astype(jnp.float32).sum()

    q0 = jnp.zeros((B, h, dh), jnp.float32)
    timeit(attn_only, q0, pools, label="paged attn kernel only (x12, cache 513)")

    # --- 4. full decode_paged step (the live path) -----------------------
    pools2 = alloc_pools(hkv, ln * B * pps, ps, dh, jnp.bfloat16)

    @jax.jit
    def full_step(x0, pools):
        def body(i, carry):
            x, pools = carry
            hh, pools = llama.decode_paged(
                params["net"], net, x, pools, index,
                page_size=ps, pages_per_slot=pps, streaming=False)
            return (x + hh * 1e-6, pools)
        x, _ = jax.lax.fori_loop(0, N, body, (x0, pools))
        return x.astype(jnp.float32).sum()

    timeit(full_step, x0, pools2, label="full decode_paged step (cache 513)")

    # --- 5. full step with the STREAMING kernel --------------------------
    pools3 = alloc_pools(hkv, ln * B * pps, ps, dh, jnp.bfloat16)

    @jax.jit
    def full_step_streaming(x0, pools):
        def body(i, carry):
            x, pools = carry
            hh, pools = llama.decode_paged(
                params["net"], net, x, pools, index,
                page_size=ps, pages_per_slot=pps, streaming=True)
            return (x + hh * 1e-6, pools)
        x, _ = jax.lax.fori_loop(0, N, body, (x0, pools))
        return x.astype(jnp.float32).sum()

    timeit(full_step_streaming, x0, pools3,
           label="full decode_paged step STREAMING (cache 513)")


if __name__ == "__main__":
    main()
