"""Attention backends: XLA einsum (portable) and Pallas flash (TPU training).

The hot FLOPs of training live in the event net's causal self-attention over
up to 2047 event positions.  The XLA path materializes the [B, H, S, S] score
tensor in HBM (and saves it for backward); the flash backends tile
Q/K/V blocks through VMEM with a running softmax, cutting HBM traffic per
layer from O(S²) to O(S·D) — the standard flash-attention recipe, here via
the Pallas TPU kernels shipped with JAX (custom-VJP fwd+bwd).

Two Pallas kernels are available; "splash" is the training default.  A
kernel-level sweep at the training shape [2, 16, 2048, 64]
(tools/probe_attn_bwd.py / probe_splash_tune.py, real v5e chip,
N-differenced so the tunnel's fixed dispatch overhead cancels) measured
fwd+grad per call:

    jax flash, default 128 blocks (the old default): 8.00 ms
    jax flash, tuned 512 blocks:                     2.13 ms
    splash, 512 fwd blocks + 1024 fused-bwd blocks:  ~1.1 ms

i.e. the shipped flash defaults left ~7x on the table — at 12 layers that
was ~82 ms of a 234 ms train step.  The splash kernel's fused dkv/dq
backward (one pass instead of two) is the main win; block sizes are pinned
below, not left to defaults.

Backend selection: ``set_backend("auto"|"xla"|"flash"|"splash")``.  "auto"
uses splash on TPU for long-enough cacheless (training) attention and falls
back to XLA everywhere else (CPU tests, short sequences, cached decode —
decode has its own fused path in models/llama.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"
_FLASH_MIN_SEQ = 512  # flash block size; shorter sequences gain nothing
_INTERPRET = False  # tests: run the splash kernel in Pallas interpret mode


def set_backend(name: str):
    """Set the global attention backend: auto | xla | flash | splash."""
    global _BACKEND
    if name not in ("auto", "xla", "flash", "splash"):
        raise ValueError(f"unknown attention backend {name}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _use_flash(s: int, cached: bool) -> bool:
    if _BACKEND == "xla" or cached:
        return False
    if s < _FLASH_MIN_SEQ:
        # shorter sequences (e.g. the 8-token row decoder) gain nothing and
        # would pay block padding up to the flash block size
        return False
    if _BACKEND in ("flash", "splash"):
        return True
    return _on_tpu()


# Aligned decode attention stays on XLA: it measures ~70% of the HBM
# roofline on v5e, and a hand-written flash-decode kernel lost to it at
# every cache length tried (1024/2048/4096; up to ~12x at 4096 — cut in
# round 2). Pallas decode kernels live where they actually win: the paged
# per-slot path (ops/paged.py).


def xla_attention(q, k, v, mask_bias):
    """q: [B,S,H,Dh]; k,v: [B,T,Hkv,Dh]; mask_bias additive [.,1,S,T]."""
    b, s, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    scale = dh**-0.5
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pad_to(x, multiple: int, axis: int):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad), size


@functools.lru_cache(maxsize=8)
def _splash_kernel(heads: int, seq: int, interpret: bool):
    """Build (and cache) the splash-attention kernel for a padded shape.

    Block sizes are pinned from the probe sweep at the training shape
    (see module docstring): 512-blocks for the forward (90 TF/s measured
    on the fwd alone), 1024-blocks for the FUSED dkv backward — the fused
    kernel computes dq and dkv in one pass, which measured 2.2x fwd where
    the two-pass backward sat at 4-8x.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    def fit(want: int) -> int:
        # largest candidate block that divides the (512-padded) sequence
        return want if seq % want == 0 else min(512, seq)

    block_sizes = sk.BlockSizes(
        block_q=min(512, seq), block_kv=min(512, seq),
        block_kv_compute=min(512, seq),
        block_q_dkv=fit(1024), block_kv_dkv=fit(2048),
        block_kv_dkv_compute=min(fit(1024), fit(2048)),
        use_fused_bwd_kernel=True)
    mask = sm.MultiHeadMask([sm.CausalMask((seq, seq)) for _ in range(heads)])
    # The first call usually happens INSIDE a jit trace (the train step), and
    # make_splash_mha materializes its block-mask info with jnp.array — traced,
    # those become tracers of that first program, and this cache would leak
    # them into every later program (UnexpectedTracerError on the 2nd jit).
    # ensure_compile_time_eval() forces the mask info concrete at build time.
    with jax.ensure_compile_time_eval():
        kernel = sk.make_splash_mha(mask, block_sizes=block_sizes,
                                    head_shards=1, q_seq_shards=1,
                                    interpret=interpret)
    return jax.vmap(kernel)


def splash_causal_attention(q, k, v):
    """Causal attention via the splash Pallas kernel (training default).

    q,k,v: [B, S, H, Dh] (same S).  Sequences are padded up to the 512
    forward block; causality keeps the pad tail inert for real positions
    (pad k rows are only visible to pad q rows, whose outputs are sliced
    off — and therefore carry zero cotangent in the backward).
    """
    b, s, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qt, orig = _pad_to(qt, _FLASH_MIN_SEQ, axis=2)
    kt, _ = _pad_to(kt, _FLASH_MIN_SEQ, axis=2)
    vt, _ = _pad_to(vt, _FLASH_MIN_SEQ, axis=2)
    kernel = _splash_kernel(h, qt.shape[2], _INTERPRET)
    out = kernel(qt * (dh**-0.5), kt, vt)
    return out[:, :, :orig].transpose(0, 2, 1, 3).astype(q.dtype)


def flash_causal_attention(q, k, v):
    """Causal flash attention via the Pallas TPU kernel.

    q,k,v: [B, S, H, Dh] (same S).  Sequences are padded up to the flash
    block size; causality makes the pad tail inert for the real positions.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, s, h, dh = q.shape
    hkv = k.shape[2]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)
    # kernel layout is [B, H, S, Dh]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qt, orig = _pad_to(qt, _FLASH_MIN_SEQ, axis=2)
    kt, _ = _pad_to(kt, _FLASH_MIN_SEQ, axis=2)
    vt, _ = _pad_to(vt, _FLASH_MIN_SEQ, axis=2)
    out = fa.flash_attention(qt, kt, vt, causal=True, sm_scale=dh**-0.5)
    return out[:, :, :orig].transpose(0, 2, 1, 3).astype(q.dtype)


def attention(q, k, v, mask_bias, *, causal_full: bool = False,
              cached: bool = True):
    """Dispatch to the best backend.

    ``causal_full=True`` promises that ``mask_bias`` is exactly the standard
    causal mask with q and k aligned (the training path) so the flash kernel's
    built-in causal masking is equivalent.
    """
    s = q.shape[1]
    if causal_full and _use_flash(s, cached):
        if _BACKEND == "flash":
            return flash_causal_attention(q, k, v)
        return splash_causal_attention(q, k, v)
    return xla_attention(q, k, v, mask_bias)
