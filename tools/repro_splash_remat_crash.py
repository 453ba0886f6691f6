"""Minimal repro: splash-attention backward under WHOLE-LAYER remat crashes
the remote TPU compiler (tpu_compile_helper subprocess exit 1 -> HTTP 500).

Context (BASELINE.md config 4 "Known limit"): training with bs>=8 needs
whole-layer activation checkpointing (``remat=True``) on the 16 GB chip, but
grad(checkpoint(layer-with-splash)) fails to COMPILE at those batch sizes —
the supported policies are ``remat='dots'`` (matmul outputs saved; splash
residuals q/k/v are dot outputs, so the kernel backward consumes SAVED
inputs) and bs<=4.  This script isolates the trigger to its minimal shape:

    python tools/repro_splash_remat_crash.py            # the crashing case
    python tools/repro_splash_remat_crash.py --dots     # control: compiles
    python tools/repro_splash_remat_crash.py --bs=2     # control: small bs

The essential pattern is ONE transformer layer (matching models/llama._layer
at tv2o-medium geometry: 16 heads x 64 head_dim, seq 2048) wrapped in
``jax.checkpoint`` with no policy, differentiated.  Under remat the backward
re-runs the splash FORWARD to rebuild the custom-vjp residuals and then runs
the fused dq/dkv backward kernel in the same computation; at bs>=8 that
co-scheduled pair is what the remote compiler rejects.

Observed on the live v5e (2026-08-19, JAX 0.8.x):
  bs=8 remat=full -> jax.errors.JaxRuntimeError: INTERNAL:
    http://127.0.0.1:8103/remote_compile: HTTP 500: tpu_compile_helper
    subprocess exit code 1
  (the helper process dies with no diagnostic — a compiler crash, not a
  resource rejection; contrast the scoped-vmem failures, which report the
  overflowing allocation.  Run this script to refresh the verbatim text.)
  bs=8 remat=dots -> compiles and runs.
  bs=2 remat=full -> compiles and runs.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.ops import attention

HEADS, HEAD_DIM, SEQ = 16, 64, 2048
D = HEADS * HEAD_DIM


def layer(x, w):
    """One attention block at trainer geometry (llama.py _layer, minus MLP —
    the MLP is not needed to trigger the crash)."""
    q = (x @ w["q"]).reshape(*x.shape[:2], HEADS, HEAD_DIM)
    k = (x @ w["k"]).reshape(*x.shape[:2], HEADS, HEAD_DIM)
    v = (x @ w["v"]).reshape(*x.shape[:2], HEADS, HEAD_DIM)
    s = x.shape[1]
    bias = jnp.where(jnp.arange(s)[None, :] <= jnp.arange(s)[:, None],
                     0.0, -jnp.inf).astype(jnp.float32)[None, None]
    attn = attention._attention(q, k, v, bias, cached=False)
    return x + attn.reshape(*x.shape[:2], D) @ w["o"]


def main():
    args = sys.argv[1:]
    bs = next((int(a.split("=")[1]) for a in args if a.startswith("--bs=")), 8)
    policy = None
    if "--dots" in args:
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, SEQ, D), jnp.bfloat16)
    w = {n: jax.random.normal(jax.random.fold_in(key, i), (D, D),
                              jnp.bfloat16) * 0.02
         for i, n in enumerate("qkvo")}

    body = jax.checkpoint(layer, policy=policy) if policy else \
        jax.checkpoint(layer)

    def loss(w, x):
        return jnp.sum(body(x, w).astype(jnp.float32) ** 2)

    print(f"bs={bs} seq={SEQ} remat={'dots' if policy else 'full'} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    g = jax.jit(jax.grad(loss))(w, x)
    got = float(jnp.sum(g["q"].astype(jnp.float32)))  # axon: fetch to sync
    print(f"compiled + ran in {time.time() - t0:.1f}s (grad sum {got:.3e}) "
          f"— NO CRASH", flush=True)


if __name__ == "__main__":
    main()
