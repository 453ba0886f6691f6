"""Attention backends: XLA einsum (portable) and Pallas flash (TPU training).

The hot FLOPs of training live in the event net's causal self-attention over
up to 2047 event positions.  The XLA path materializes the [B, H, S, S] score
tensor in HBM (and saves it for backward); the flash backend tiles
Q/K/V blocks through VMEM with a running softmax, cutting HBM traffic per
layer from O(S²) to O(S·D) — the standard flash-attention recipe, here via
the Pallas TPU kernels shipped with JAX (custom-VJP fwd+bwd).

Backend selection: ``set_backend("auto"|"xla"|"flash")``.  "auto" uses flash
on TPU for long-enough cacheless (training) attention and falls back to XLA
everywhere else (CPU tests, short sequences, cached decode — decode has its
own fused path in models/llama.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"
_FLASH_MIN_SEQ = 512  # flash block size; shorter sequences gain nothing


def set_backend(name: str):
    """Set the global attention backend: auto | xla | flash."""
    global _BACKEND
    if name not in ("auto", "xla", "flash"):
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
    if _BACKEND == "flash":
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
        return flash_causal_attention(q, k, v)
    return xla_attention(q, k, v, mask_bias)
