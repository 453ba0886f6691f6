"""Drop-in object API: the reference's ``MIDIModel`` surface on JAX.

Reference users write ``MIDIModel(config)``, ``model.generate(...)``,
``model.forward(...)`` (/root/reference/midi_model.py:99-250).  The
functional core (models/midinet.py, sampling/generate.py) stays the real
API; this class is the familiar facade bundling params + config + tokenizer,
with checkpoint loading and LoRA merging attached.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import midinet
from .config import MIDIModelConfig


class MIDIModel:
    """Hierarchical MIDI transformer: params + config + tokenizer in one box."""

    def __init__(self, config: Optional[MIDIModelConfig] = None, params=None,
                 dtype=None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        self.config = config or MIDIModelConfig.from_name("tv2o-medium")
        self.tokenizer = self.config.tokenizer
        dtype = dtype or jnp.bfloat16
        if params is None:
            params = midinet.init_params(jax.random.PRNGKey(seed), self.config,
                                         dtype=dtype)
        self.params = params

    # ---- constructors ----------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str, config=None, dtype=None) -> "MIDIModel":
        """Load a checkpoint (.safetensors/.bin/.ckpt or orbax dir); the
        config comes from an adjacent config.json unless given."""
        import os

        import jax
        import jax.numpy as jnp

        from ..interop import load_state_dict, params_from_state_dict

        if config is None:
            base = path if os.path.isdir(path) else os.path.dirname(path)
            config = MIDIModelConfig.from_json_file(os.path.join(base, "config.json"))
        elif isinstance(config, str):
            from .config import CONFIG_NAMES

            config = (MIDIModelConfig.from_name(config)
                      if config in CONFIG_NAMES
                      else MIDIModelConfig.from_json_file(config))
        if os.path.isdir(path):
            path = os.path.join(path, "model.safetensors")
        params = params_from_state_dict(load_state_dict(path), config)
        dtype = dtype or jnp.bfloat16
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        return cls(config, params)

    def save_pretrained(self, out_dir: str):
        """Write config.json + model.safetensors (torch-reference loadable)."""
        import os

        import jax

        from ..interop import save_safetensors

        os.makedirs(out_dir, exist_ok=True)
        self.config.save_pretrained(out_dir)
        host = jax.tree.map(np.asarray, self.params)
        save_safetensors(host, self.config, os.path.join(out_dir, "model.safetensors"))

    def load_merge_lora(self, adapter_path: str, alpha: float = 128.0) -> "MIDIModel":
        """Merge a peft adapter (ref load_merge_lora, midi_model.py:109-114)."""
        import os

        from .lora import load_peft_adapter, merge_lora

        if os.path.isdir(adapter_path):
            adapter_path = os.path.join(adapter_path, "adapter_model.safetensors")
        lora = load_peft_adapter(adapter_path, self.config)
        self.params = merge_lora(self.params, lora, alpha=alpha)
        return self

    # ---- compute ---------------------------------------------------------

    def forward(self, x, cache=None):
        """x [B, L, T] -> event hidden [B, L, D] (ref forward, :137-150)."""
        return midinet.forward(self.params, self.config, x, cache=cache)

    def forward_token(self, hidden_state=None, x=None, cache=None):
        """(ref forward_token, :116-135)."""
        return midinet.forward_token(self.params, self.config, hidden_state, x,
                                     cache=cache)

    def generate(self, prompt=None, batch_size: int = 1, max_len: int = 512,
                 temp: float = 1.0, top_p: float = 0.98, top_k: int = 20,
                 seed: int = 0, **kwargs) -> np.ndarray:
        """Batched grammar-constrained sampling (ref generate, :167-250)."""
        from ..sampling import generate as gen

        return gen(self.params, self.config, prompt=prompt, batch_size=batch_size,
                   max_len=max_len, temp=temp, top_p=top_p, top_k=top_k,
                   seed=seed, **kwargs)

    def param_count(self) -> int:
        return midinet.param_count(self.params)
