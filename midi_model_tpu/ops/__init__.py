"""Pallas TPU kernels and low-level fused ops."""

from .attention import (
    attention,
    flash_causal_attention,
    get_backend,
    get_decode_backend,
    set_backend,
    set_decode_backend,
    xla_attention,
)
from .decode_attention import decode_attention

__all__ = [
    "attention",
    "decode_attention",
    "flash_causal_attention",
    "get_backend",
    "get_decode_backend",
    "set_backend",
    "set_decode_backend",
    "xla_attention",
]
