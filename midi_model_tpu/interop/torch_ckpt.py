"""PyTorch/HF checkpoint ⇄ JAX pytree conversion.

The reference ships checkpoints as Lightning ``.ckpt``, HF ``.bin`` or
``.safetensors`` with keys like ``net.layers.0.self_attn.q_proj.weight``
(/root/reference/app.py:311-316, push_to_hub.py:47-52).  This module maps that
flat state dict onto our pytree layout: per-layer matrices are transposed to
``[in, out]`` and stacked on a leading layer axis (see models/llama.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.config import MIDIModelConfig, TransformerConfig


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into numpy arrays (no torch needed for
    safetensors; torch CPU used for pickle formats)."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning .ckpt files carry non-tensor pickle state that
        # weights_only rejects. Full unpickling executes arbitrary code, so
        # only fall back for checkpoints the user explicitly pointed us at,
        # and say so.
        import warnings

        warnings.warn(
            f"{path}: weights-only load failed; falling back to full pickle "
            "unpickling. Only do this for checkpoints you trust.",
            stacklevel=2)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _stack_transformer(sd: Dict[str, np.ndarray], prefix: str,
                       cfg: TransformerConfig, dtype) -> dict:
    def get(name):
        return np.asarray(sd[f"{prefix}.{name}"])

    def stacked(fmt, transpose=True):
        mats = [get(fmt.format(i)) for i in range(cfg.num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats).astype(dtype)

    params = {
        "embed": get("embed_tokens.weight").astype(dtype),
        "final_norm": get("norm.weight").astype(dtype),
        "layers": {
            "wq": stacked("layers.{}.self_attn.q_proj.weight"),
            "wk": stacked("layers.{}.self_attn.k_proj.weight"),
            "wv": stacked("layers.{}.self_attn.v_proj.weight"),
            "wo": stacked("layers.{}.self_attn.o_proj.weight"),
            "w_gate": stacked("layers.{}.mlp.gate_proj.weight"),
            "w_up": stacked("layers.{}.mlp.up_proj.weight"),
            "w_down": stacked("layers.{}.mlp.down_proj.weight"),
            "ln_attn": stacked("layers.{}.input_layernorm.weight", transpose=False),
            "ln_mlp": stacked("layers.{}.post_attention_layernorm.weight", transpose=False),
        },
    }
    return params


def params_from_state_dict(sd: Dict[str, np.ndarray], config: MIDIModelConfig,
                           dtype=np.float32) -> dict:
    """Torch-layout state dict -> our parameter pytree (numpy leaves)."""
    return {
        "net": _stack_transformer(sd, "net", config.net, dtype),
        "net_token": _stack_transformer(sd, "net_token", config.net_token, dtype),
        "lm_head": np.asarray(sd["lm_head.weight"]).T.astype(dtype),
    }


def _unstack_transformer(params: dict, prefix: str, cfg: TransformerConfig,
                         out: Dict[str, np.ndarray]):
    lp = params["layers"]
    name_map = {
        "wq": "self_attn.q_proj.weight", "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight", "wo": "self_attn.o_proj.weight",
        "w_gate": "mlp.gate_proj.weight", "w_up": "mlp.up_proj.weight",
        "w_down": "mlp.down_proj.weight",
    }
    for i in range(cfg.num_layers):
        for ours, theirs in name_map.items():
            out[f"{prefix}.layers.{i}.{theirs}"] = np.asarray(lp[ours][i]).T
        out[f"{prefix}.layers.{i}.input_layernorm.weight"] = np.asarray(lp["ln_attn"][i])
        out[f"{prefix}.layers.{i}.post_attention_layernorm.weight"] = np.asarray(lp["ln_mlp"][i])
    out[f"{prefix}.embed_tokens.weight"] = np.asarray(params["embed"])
    out[f"{prefix}.norm.weight"] = np.asarray(params["final_norm"])


def state_dict_from_params(params: dict, config: MIDIModelConfig
                           ) -> Dict[str, np.ndarray]:
    """Our parameter pytree -> torch-layout state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    _unstack_transformer(params["net"], "net", config.net, out)
    _unstack_transformer(params["net_token"], "net_token", config.net_token, out)
    out["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return out


def synthesize_state_dict(layout, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministically synthesize a torch-layout state dict from a layout.

    ``layout`` is a sequence of ``(name, shape)`` pairs (a model's state-dict
    entries, in a fixed order).  One seeded ``np.random.default_rng`` fills
    the entries in that order: norm weights get ``1 + 0.05*N(0,1)``, all
    other weights ``0.02*N(0,1)`` (HF ``initializer_range``-scale), fp32.

    Used by the genuine-reference parity oracle (tools/make_goldens.py
    ``--reference-oracle``): the golden stores only the layout + seed + the
    reference model's outputs, and the test reconstructs the identical
    weights here — no multi-hundred-MB weight fixture, no torch dependency
    at test time.
    """
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, shape in layout:
        x = rng.standard_normal(tuple(shape)).astype(np.float32)
        if "layernorm" in name or name.endswith("norm.weight"):
            sd[name] = 1.0 + 0.05 * x
        else:
            sd[name] = 0.02 * x
    return sd


def save_safetensors(params: dict, config: MIDIModelConfig, path: str,
                     dtype=np.float32):
    """Write a reference-compatible .safetensors checkpoint."""
    from safetensors.numpy import save_file

    sd = {k: np.ascontiguousarray(v.astype(dtype))
          for k, v in state_dict_from_params(params, config).items()}
    save_file(sd, path)
