"""LoRA as a pure parameter-tree transform.

The reference fine-tunes with peft (r=64, α=128, q/k/v/o/gate/up/down targets,
/root/reference/train.py:439-449) and merges adapters with
``merge_and_unload`` (/root/reference/midi_model.py:109-114).  In JAX a LoRA
adapter is just a second pytree of (A, B) factors per target matrix:

- ``apply``:  W_eff = W + (α/r)·ΔW with ΔW = Aᵀ·Bᵀ in our [in, out] layout
  (peft stores A:[r,in], B:[out,r], ΔW_torch = B@A with torch's [out,in]);
- ``merge``:  fold ΔW into W once, returning plain params;
- peft ``adapter_model.safetensors`` files load directly for parity with
  reference-trained adapters.

Stacked-layer layout means one (A, B) pair per target carries all layers:
A: [L, r, in], B: [L, out, r].
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import MIDIModelConfig

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# our stacked name -> peft module name
_PEFT_NAMES = {
    "wq": "self_attn.q_proj", "wk": "self_attn.k_proj", "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj", "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}


def init_lora(key: jax.Array, params: dict, rank: int = 64,
              targets: Sequence[str] = DEFAULT_TARGETS, dtype=jnp.float32) -> dict:
    """A ~ normal/r (kaiming-ish), B = 0 (peft convention: ΔW starts at 0)."""
    lora = {}
    for net in ("net", "net_token"):
        layers = params[net]["layers"]
        net_lora = {}
        for t in targets:
            w = layers[t]  # [L, in, out]
            l_n, d_in, d_out = w.shape
            key, sub = jax.random.split(key)
            a = (jax.random.normal(sub, (l_n, rank, d_in), jnp.float32)
                 / np.sqrt(d_in)).astype(dtype)
            b = jnp.zeros((l_n, d_out, rank), dtype)
            net_lora[t] = {"a": a, "b": b}
        lora[net] = net_lora
    return lora


def apply_lora(params: dict, lora: dict, alpha: float = 128.0,
               rank: Optional[int] = None) -> dict:
    """Return effective params W + (α/r)·Aᵀ·Bᵀ (no mutation)."""
    out = jax.tree.map(lambda x: x, params)  # shallow-ish structural copy
    for net, net_lora in lora.items():
        new_layers = dict(out[net]["layers"])
        for t, ab in net_lora.items():
            a, b = ab["a"], ab["b"]  # [L, r, in], [L, out, r]
            r = rank or a.shape[1]
            scale = alpha / r
            delta = jnp.einsum("lri,lor->lio", a.astype(jnp.float32),
                               b.astype(jnp.float32)) * scale
            new_layers[t] = (new_layers[t].astype(jnp.float32) + delta
                             ).astype(new_layers[t].dtype)
        out[net] = dict(out[net])
        out[net]["layers"] = new_layers
    return out


def merge_lora(params: dict, lora: dict, alpha: float = 128.0) -> dict:
    """Alias of apply_lora — merging IS the application for inference."""
    return apply_lora(params, lora, alpha)


def trainable_partition(params: dict, lora: dict):
    """optax-style partition labels: 'lora' for adapter leaves, 'frozen' else."""
    frozen = jax.tree.map(lambda _: "frozen", params)
    trainable = jax.tree.map(lambda _: "lora", lora)
    return frozen, trainable


def load_peft_adapter(path: str, config: MIDIModelConfig,
                      num_layers: Optional[Dict[str, int]] = None) -> dict:
    """Load a peft ``adapter_model.safetensors`` into our stacked layout."""
    from safetensors.numpy import load_file

    sd = load_file(path)
    return peft_state_dict_to_lora(sd, config)


def peft_state_dict_to_lora(sd: Dict[str, np.ndarray],
                            config: MIDIModelConfig) -> dict:
    """Convert peft's flat keys to stacked {net: {target: {a, b}}}."""
    pat = re.compile(
        r"(?:base_model\.model\.)?(net|net_token)\.layers\.(\d+)\."
        r"(.+?)\.lora_(A|B)\.(?:default\.)?weight")
    per = {}
    for key, val in sd.items():
        m = pat.match(key)
        if not m:
            continue
        net, layer, module, ab = m.group(1), int(m.group(2)), m.group(3), m.group(4)
        ours = next((o for o, p in _PEFT_NAMES.items() if p == module), None)
        if ours is None:
            continue
        per.setdefault((net, ours, ab.lower()), {})[layer] = val

    lora: dict = {}
    for (net, target, ab), by_layer in per.items():
        n_layers = (config.net if net == "net" else config.net_token).num_layers
        stacked = np.stack([by_layer[i] for i in range(n_layers)])
        lora.setdefault(net, {}).setdefault(target, {})[ab] = jnp.asarray(stacked)
    return lora


def lora_to_peft_state_dict(lora: dict) -> Dict[str, np.ndarray]:
    """Inverse of peft_state_dict_to_lora (for publishing adapters)."""
    out: Dict[str, np.ndarray] = {}
    for net, targets in lora.items():
        for ours, ab in targets.items():
            peft_name = _PEFT_NAMES[ours]
            for i in range(ab["a"].shape[0]):
                out[f"base_model.model.{net}.layers.{i}.{peft_name}.lora_A.weight"] = \
                    np.asarray(ab["a"][i])
                out[f"base_model.model.{net}.layers.{i}.{peft_name}.lora_B.weight"] = \
                    np.asarray(ab["b"][i])
    return out
