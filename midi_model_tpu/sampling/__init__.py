"""Jitted grammar-constrained generation."""

from .generate import (
    GenState,
    decode_events,
    generate,
    normalize_prompt,
    prefill,
)
from .masks import MaskTable, build_mask_table
from .sharded import decode_events_dp, generate_dp, prefill_dp
from .topk_topp import sample_greedy, sample_top_p_k

__all__ = [
    "GenState",
    "MaskTable",
    "build_mask_table",
    "decode_events",
    "decode_events_dp",
    "generate",
    "generate_dp",
    "prefill_dp",
    "normalize_prompt",
    "prefill",
    "sample_greedy",
    "sample_top_p_k",
]
