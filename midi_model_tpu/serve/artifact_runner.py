"""Generation from exported StableHLO artifacts — the app_onnx analogue.

The reference ships a second serving app that runs the ONNX export through
onnxruntime with host-side numpy sampling (/root/reference/app_onnx.py:87-212).
The XLA-native equivalent: load the StableHLO artifacts written by
``interop.export`` (event step + token_first/token_next with explicit KV
caches in the calling convention) and drive the same generation loop from the
host.  This is the portability/parity check for the export path — the fast
path remains the fused jitted loop in ``sampling.generate``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..interop.export import load_artifact
from ..interop.torch_ckpt import load_state_dict, params_from_state_dict
from ..models.config import MIDIModelConfig
from ..sampling.masks import build_mask_table


def numpy_softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def numpy_sample_top_p_k(probs: np.ndarray, top_p: float, top_k: int,
                         rng: np.random.RandomState) -> np.ndarray:
    """Reference-exact mask semantics, numpy edition (app_onnx.py:33-50)."""
    order = np.argsort(probs, axis=-1)[..., ::-1]
    sorted_probs = np.take_along_axis(probs, order, axis=-1)
    cumsum = np.cumsum(sorted_probs, axis=-1)
    keep = (cumsum - sorted_probs) <= top_p
    keep &= np.arange(probs.shape[-1]) < top_k
    filtered = np.where(keep, sorted_probs, 0.0)
    filtered = filtered / filtered.sum(axis=-1, keepdims=True)
    flat_f = filtered.reshape(-1, filtered.shape[-1])
    flat_o = order.reshape(-1, order.shape[-1])
    out = np.empty(flat_f.shape[0], dtype=np.int64)
    for i in range(flat_f.shape[0]):
        choice = rng.choice(flat_f.shape[-1], p=flat_f[i])
        out[i] = flat_o[i, choice]
    return out.reshape(probs.shape[:-1])


class ArtifactGenerator:
    """Drives generation using only exported artifacts + weights."""

    def __init__(self, artifact_dir: str):
        import jax
        import jax.numpy as jnp

        self.config = MIDIModelConfig.from_json_file(
            os.path.join(artifact_dir, "config.json"))
        self.event_fn = load_artifact(
            os.path.join(artifact_dir, "event_forward.stablehlo"))
        self.token_first = load_artifact(
            os.path.join(artifact_dir, "token_first.stablehlo"))
        self.token_next = load_artifact(
            os.path.join(artifact_dir, "token_next.stablehlo"))
        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self.manifest.get("dtype", "bfloat16")]
        params = params_from_state_dict(
            load_state_dict(os.path.join(artifact_dir, "model.safetensors")),
            self.config)
        self.params = jax.tree.map(lambda x: jnp.asarray(x, self.dtype), params)

    def generate(self, prompt: Optional[np.ndarray] = None, max_len: int = 64,
                 temp: float = 1.0, top_p: float = 0.98, top_k: int = 20,
                 seed: int = 0, greedy: bool = False) -> np.ndarray:
        """Host-driven loop over the exported step functions (batch 1)."""
        import jax.numpy as jnp

        from ..models.llama import KVCache

        cfg = self.config
        tok = cfg.tokenizer
        t_max = tok.max_token_seq
        table = build_mask_table(tok)
        rng = np.random.RandomState(seed)
        max_seq = self.manifest["functions"]["event_forward"]["cache_seq"]

        if prompt is None:
            prompt = np.full((1, 1, t_max), tok.pad_id, np.int32)
            prompt[0, 0, 0] = tok.bos_id
        rows = [np.asarray(r, np.int32) for r in prompt[0]]

        ev_cache = KVCache.zeros(cfg.net, 1, max_seq, self.dtype)
        ck, cv, idx = ev_cache.k, ev_cache.v, ev_cache.index
        hidden = None
        for r in rows:  # prefill one row at a time (artifact step is S=1)
            hidden, ck, cv, idx = self.event_fn.call(
                self.params, r.reshape(1, 1, t_max), ck, cv, idx)

        while len(rows) < max_len:
            tk_cache = KVCache.zeros(cfg.net_token, 1, t_max, self.dtype)
            tck, tcv, tidx = tk_cache.k, tk_cache.v, tk_cache.index
            row = []
            ended = False
            e_off = 0
            for i in range(t_max):
                if i == 0:
                    h = jnp.asarray(hidden[:, -1], self.dtype)
                    logits, tck, tcv, tidx = self.token_first.call(
                        self.params, h, tck, tcv, tidx)
                else:
                    prev = np.asarray([[row[-1]]], np.int32)
                    logits, tck, tcv, tidx = self.token_next.call(
                        self.params, prev, tck, tcv, tidx)
                probs = numpy_softmax(np.asarray(logits, np.float32)[:, -1] / temp)
                if ended:
                    mask = table.pad_only
                elif i == 0:
                    mask = table.first
                else:
                    mask = table.steps[e_off, i]
                probs = probs * mask
                if greedy:
                    t = int(np.argmax(probs[0]))
                else:
                    t = int(numpy_sample_top_p_k(probs, top_p, top_k, rng)[0])
                row.append(t)
                if i == 0:
                    if t == tok.eos_id:
                        ended = True
                    else:
                        e_off = t - (tok.eos_id + 1)
            rows.append(np.asarray(row, np.int32))
            hidden, ck, cv, idx = self.event_fn.call(
                self.params, rows[-1].reshape(1, 1, t_max), ck, cv, idx)
            if ended:
                break
        return np.stack(rows)[None]
