"""Checkpoint publisher — the push_to_hub.py equivalent.

Loads any supported checkpoint format (orbax dir / .safetensors / torch
pickle), casts, and writes an HF-layout model directory (config.json +
model.safetensors) that the torch reference can load directly; optionally
pushes to the Hugging Face Hub when the hub client is available
(parity: /root/reference/push_to_hub.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..models.config import CONFIG_NAMES, MIDIModelConfig

_DTYPES = {"fp32": np.float32, "fp16": np.float16, "bf16": "bfloat16"}


def load_any_checkpoint(path: str, config: MIDIModelConfig):
    """Return a params pytree from an orbax run dir or a flat checkpoint file."""
    from .torch_ckpt import load_state_dict, params_from_state_dict

    if os.path.isdir(path):
        import jax

        from ..train.checkpoint import CheckpointManager
        from ..train.trainer import init_train_state, make_optimizer
        from ..models import midinet

        opt = make_optimizer()
        template = init_train_state(
            midinet.init_params(jax.random.PRNGKey(0), config), opt)
        template = jax.tree.map(np.asarray, template)
        mgr = CheckpointManager(path, config)
        return mgr.restore(template).params
    return params_from_state_dict(load_state_dict(path), config)


def publish(ckpt: str, config_name: str, out_dir: str, dtype: str = "bf16",
            repo_id: str = "", private: bool = True) -> str:
    config = (MIDIModelConfig.from_name(config_name)
              if config_name in CONFIG_NAMES
              else MIDIModelConfig.from_json_file(config_name))
    params = load_any_checkpoint(ckpt, config)

    os.makedirs(out_dir, exist_ok=True)
    from .torch_ckpt import state_dict_from_params

    sd = state_dict_from_params(params, config)
    if dtype == "bf16":
        import torch
        from safetensors.torch import save_file

        tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).to(torch.bfloat16)
                   for k, v in sd.items()}
        save_file(tensors, os.path.join(out_dir, "model.safetensors"),
                  metadata={"format": "pt"})
    else:
        from safetensors.numpy import save_file

        np_dtype = _DTYPES[dtype]
        save_file({k: np.ascontiguousarray(v.astype(np_dtype)) for k, v in sd.items()},
                  os.path.join(out_dir, "model.safetensors"))
    config.save_pretrained(out_dir)

    if repo_id:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_folder(folder_path=out_dir, repo_id=repo_id)
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser(description="publish a checkpoint in HF layout")
    ap.add_argument("--ckpt", required=True, help="orbax dir or checkpoint file")
    ap.add_argument("--config", default="tv2o-medium")
    ap.add_argument("--out", default="published")
    ap.add_argument("--dtype", default="bf16", choices=list(_DTYPES))
    ap.add_argument("--repo-id", default="", help="push to this HF repo if set")
    ap.add_argument("--public", action="store_true")
    args = ap.parse_args(argv)
    out = publish(args.ckpt, args.config, args.out, args.dtype, args.repo_id,
                  private=not args.public)
    print(f"published to {out}")


if __name__ == "__main__":
    main()
