"""Pallas TPU kernels and low-level fused ops."""

from .attention import (
    attention,
    flash_causal_attention,
    get_backend,
    set_backend,
    xla_attention,
)

__all__ = [
    "attention",
    "flash_causal_attention",
    "get_backend",
    "set_backend",
    "xla_attention",
]
