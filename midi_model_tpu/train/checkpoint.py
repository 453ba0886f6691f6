"""Orbax checkpointing: save/restore train state + HF-compatible config.

Replaces Lightning's .ckpt machinery (/root/reference/train.py:451-458,
:475-479): top-k-by-val-loss retention, a ``last`` pointer for preemption
resume (standard practice on TPU where preemption is routine), and a
reference-compatible ``.safetensors`` export alongside each save so torch
users can load our checkpoints directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

from ..models.config import MIDIModelConfig


class CheckpointManager:
    def __init__(self, directory: str, config: MIDIModelConfig,
                 max_to_keep: int = 1):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.config = config
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep + 1,  # keep `last` plus best
                create=True,
            ),
        )
        config.save_pretrained(self.directory)
        self._scores_path = os.path.join(self.directory, "scores.json")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if metrics:
            scores = {}
            if os.path.exists(self._scores_path):
                with open(self._scores_path) as f:
                    scores = json.load(f)
            scores[str(step)] = {k: float(v) for k, v in metrics.items()}
            with open(self._scores_path, "w") as f:
                json.dump(scores, f)

    def wait(self):
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state_template))

        # Re-place leaves on the template's shardings: orbax may restore to
        # the default device, which breaks jit when the template is
        # mesh-sharded (mixed committed devices).
        def replace(t, r):
            if hasattr(t, "sharding") and hasattr(r, "shape"):
                return jax.device_put(r, t.sharding)
            return r

        return jax.tree.map(replace, state_template, restored)

    def export_safetensors(self, params: Any, path: Optional[str] = None,
                           dtype=np.float32) -> str:
        """Write a reference-compatible torch checkpoint next to the orbax one."""
        from ..interop import save_safetensors

        path = path or os.path.join(self.directory, "model.safetensors")
        host_params = jax.tree.map(np.asarray, params)
        save_safetensors(host_params, self.config, path, dtype=dtype)
        return path

    def export_peft_adapter(self, lora: Any, rank: int = 64,
                            alpha: float = 128.0,
                            directory: Optional[str] = None) -> str:
        """Write the adapter in peft layout (``adapter_model.safetensors`` +
        ``adapter_config.json``), interoperable with the reference's LoRA
        checkpoints (/root/reference/train.py:234-244, midi_model.py:109-114).
        """
        from safetensors.numpy import save_file

        from ..models.lora import _PEFT_NAMES, lora_to_peft_state_dict

        directory = directory or os.path.join(self.directory, "adapter")
        os.makedirs(directory, exist_ok=True)
        sd = {k: np.asarray(v, np.float32)
              for k, v in lora_to_peft_state_dict(
                  jax.tree.map(np.asarray, lora)).items()}
        save_file(sd, os.path.join(directory, "adapter_model.safetensors"))
        adapter_config = {
            "peft_type": "LORA",
            "task_type": None,
            "r": rank,
            "lora_alpha": alpha,
            "lora_dropout": 0.0,
            "bias": "none",
            "fan_in_fan_out": False,
            # peft matches on module-name suffixes (ref train.py:443:
            # ["q_proj", ..., "down_proj"])
            "target_modules": sorted({v.split(".")[-1]
                                      for v in _PEFT_NAMES.values()}),
        }
        with open(os.path.join(directory, "adapter_config.json"), "w") as f:
            json.dump(adapter_config, f, indent=2)
        return directory
