"""Portable inference artifacts (the ONNX-export equivalent).

The reference exports the two model halves to ONNX for onnxruntime serving
(/root/reference/export.py).  The XLA-native equivalent is ``jax.export``:
each jitted function is serialized to a StableHLO artifact with its shardings
and calling convention, next to a ``.safetensors`` weight file and the HF
``config.json``.  Artifacts are loadable in any JAX runtime (or any StableHLO
consumer) without this package's python code.

Exported functions mirror export.py's split:
- ``event_forward``: tokens [B, S, T] + event KV cache -> hidden + new cache
  (ref MIDIModelBase, export.py:11-23);
- ``token_forward``: hidden [B, D] + partial row + token cache -> logits
  (ref MIDIModelToken, export.py:26-40).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, midinet
from ..models.config import MIDIModelConfig
from ..models.llama import KVCache


def _event_forward(config):
    def fn(params, tokens, cache_k, cache_v, cache_index):
        cache = KVCache(cache_k, cache_v, cache_index)
        hidden, new_cache = midinet.forward(params, config, tokens, cache=cache)
        return hidden, new_cache.k, new_cache.v, new_cache.index

    return fn


def _token_first(config):
    """Step 0 of a row: the event hidden state is the whole input sequence."""

    def fn(params, hidden, cache_k, cache_v, cache_index):
        cache = KVCache(cache_k, cache_v, cache_index)
        logits, new_cache = midinet.forward_token(
            params, config, hidden, None, cache=cache)
        return logits, new_cache.k, new_cache.v, new_cache.index

    return fn


def _token_next(config):
    """Steps 1..T-1: one sampled token id, continuing from the cache."""

    def fn(params, token, cache_k, cache_v, cache_index):
        cache = KVCache(cache_k, cache_v, cache_index)
        logits, new_cache = midinet.forward_token(
            params, config, None, token, cache=cache)
        return logits, new_cache.k, new_cache.v, new_cache.index

    return fn


def export_artifacts(params, config: MIDIModelConfig, out_dir: str,
                     batch_size: int = 1, max_seq: int = 4096,
                     dtype=jnp.bfloat16) -> dict:
    """Serialize StableHLO inference artifacts + weights + config.

    Returns a manifest dict (also written as manifest.json).
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    t_max = config.tokenizer.max_token_seq
    cparams = jax.tree.map(lambda p: jnp.asarray(p, dtype), params)

    def shapes_of(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

    manifest = {"config": config.to_dict(), "functions": {},
                "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype)}

    # event net step
    ev_cache = KVCache.zeros(config.net, batch_size, max_seq, dtype)
    ev_args = (
        shapes_of(cparams),
        jax.ShapeDtypeStruct((batch_size, 1, t_max), jnp.int32),
        shapes_of(ev_cache.k), shapes_of(ev_cache.v),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    exported = jexport.export(jax.jit(_event_forward(config)))(*ev_args)
    with open(os.path.join(out_dir, "event_forward.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    manifest["functions"]["event_forward"] = {
        "tokens": [batch_size, 1, t_max], "cache_seq": max_seq}

    # token net steps (first = hidden-conditioned, next = token-conditioned)
    tok_cache = KVCache.zeros(config.net_token, batch_size, t_max, dtype)
    first_args = (
        shapes_of(cparams),
        jax.ShapeDtypeStruct((batch_size, config.n_embd), dtype),
        shapes_of(tok_cache.k), shapes_of(tok_cache.v),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    exported = jexport.export(jax.jit(_token_first(config)))(*first_args)
    with open(os.path.join(out_dir, "token_first.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    next_args = (
        shapes_of(cparams),
        jax.ShapeDtypeStruct((batch_size, 1), jnp.int32),
        shapes_of(tok_cache.k), shapes_of(tok_cache.v),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    exported = jexport.export(jax.jit(_token_next(config)))(*next_args)
    with open(os.path.join(out_dir, "token_next.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    manifest["functions"]["token_first"] = {"cache_seq": t_max}
    manifest["functions"]["token_next"] = {"cache_seq": t_max}

    # weights + config
    from .torch_ckpt import save_safetensors

    host = jax.tree.map(np.asarray, params)
    save_safetensors(host, config, os.path.join(out_dir, "model.safetensors"))
    config.save_pretrained(out_dir)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_artifact(path: str):
    """Deserialize one .stablehlo artifact back into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main(argv=None):
    import argparse

    from .torch_ckpt import load_state_dict, params_from_state_dict

    ap = argparse.ArgumentParser(description="export StableHLO inference artifacts")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", default="tv2o-medium")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-seq", type=int, default=4096)
    args = ap.parse_args(argv)

    config = MIDIModelConfig.from_name(args.config)
    params = params_from_state_dict(load_state_dict(args.ckpt), config)
    manifest = export_artifacts(params, config, args.out,
                                batch_size=args.batch, max_seq=args.max_seq)
    print(json.dumps(manifest["functions"], indent=2))


if __name__ == "__main__":
    main()
