"""Checkpoint and artifact interop (torch/HF <-> JAX pytrees)."""

from .torch_ckpt import (
    load_state_dict,
    params_from_state_dict,
    save_safetensors,
    state_dict_from_params,
    synthesize_state_dict,
)

__all__ = [
    "load_state_dict",
    "params_from_state_dict",
    "save_safetensors",
    "state_dict_from_params",
    "synthesize_state_dict",
]
