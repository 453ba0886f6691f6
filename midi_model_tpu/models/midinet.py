"""Hierarchical MIDI model: event-level net + token-level net + shared head.

Architecture parity with the reference MIDIModel
(/root/reference/midi_model.py:99-150):

- an **event** is a row of ``max_token_seq`` token ids; its embedding is the
  SUM of the row's token embeddings through the event net's table (ref :144-146);
- the event net (12/24-layer Llama) contextualizes event embeddings;
- the token net (3-layer Llama) autoregressively decodes the next row's tokens
  conditioned on the event hidden state prepended at position 0 (ref :116-135);
- one shared ``lm_head`` projects both nets' hidden states to the vocab.

All functions are pure; parameters are a pytree
``{"net": ..., "net_token": ..., "lm_head": [D, V]}``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import llama
from .config import MIDIModelConfig
from .llama import KVCache


def init_params(key: jax.Array, config: MIDIModelConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    d = config.n_embd
    vocab = config.tokenizer.vocab_size
    std = config.net.initializer_range
    return {
        "net": llama.init_transformer_params(k1, config.net, dtype),
        "net_token": llama.init_transformer_params(k2, config.net_token, dtype),
        "lm_head": (jax.random.normal(k3, (d, vocab), jnp.float32) * std).astype(dtype),
    }


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def embed_events(params: dict, tokens: jax.Array) -> jax.Array:
    """[..., T] token-id rows -> [..., D] summed event embeddings.

    Gathered rows are cast to the compute dtype (lm_head's) after lookup, so
    mixed pytrees (fp32 embedding tables + bf16 matrices) work — converting
    whole tables before the gather blows XLA's scoped-VMEM fusion budget."""
    emb = jnp.take(params["net"]["embed"], tokens, axis=0)
    return emb.astype(params["lm_head"].dtype).sum(axis=-2)


def forward(params: dict, config: MIDIModelConfig, x: jax.Array,
            cache: Optional[KVCache] = None, remat: bool = False,
            tp_axis: Optional[str] = None, prefill: bool = False,
            ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Event net: ``x [B, L, T]`` -> hidden ``[B, L, D]`` (ref forward :137-150).
    ``tp_axis``: Megatron shard pass — see llama.forward; ``prefill``:
    cache starts at index 0 and x covers the whole prefix (flash-eligible
    full-causal attention — see llama._layer)."""
    emb = embed_events(params, x)
    return llama.forward(params["net"], config.net, emb, cache=cache,
                         remat=remat, tp_axis=tp_axis, prefill=prefill)


def forward_token(params: dict, config: MIDIModelConfig,
                  hidden_state: Optional[jax.Array], x: Optional[jax.Array],
                  cache: Optional[KVCache] = None, remat: bool = False,
                  ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Token net + lm_head (ref forward_token :116-135).

    :param hidden_state: [B, D] event summary (becomes sequence position 0),
        or None when continuing from a cache.
    :param x: [B, T] token ids already emitted for this row (teacher forcing or
        incremental decode), or None.
    :return: (logits [B, S, vocab], updated cache) where S = (hidden?1:0) + T.
    """
    dtype = params["lm_head"].dtype
    parts = []
    if hidden_state is not None:
        parts.append(hidden_state[:, None, :].astype(dtype))
    if x is not None:
        parts.append(jnp.take(params["net_token"]["embed"], x, axis=0).astype(dtype))
    seq = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    h, new_cache = llama.forward(params["net_token"], config.net_token, seq,
                                 cache=cache, remat=remat)
    return lm_head(params, h), new_cache


def lm_head(params: dict, hidden: jax.Array) -> jax.Array:
    return (hidden @ params["lm_head"]).astype(jnp.float32)


class TrainOutput(NamedTuple):
    logits: jax.Array  # [B*(L-1), T, vocab] float32
    targets: jax.Array  # [B*(L-1), T]


def train_logits(params: dict, config: MIDIModelConfig, batch: jax.Array
                 ) -> TrainOutput:
    """The training forward (parity: /root/reference/train.py:168-185).

    ``batch [B, L, T]`` -> next-event prediction factorized per token:
    event net summarizes rows 0..i; the token net, teacher-forced on row i+1's
    tokens with the event hidden prepended, predicts each token of row i+1.
    """
    x = batch[:, :-1]  # [B, L-1, T]
    y = batch[:, 1:]  # [B, L-1, T]
    hidden, _ = forward(params, config, x)
    b, lm1, d = hidden.shape
    t = y.shape[-1]
    hidden = hidden.reshape(b * lm1, d)
    y = y.reshape(b * lm1, t)
    logits, _ = forward_token(params, config, hidden, y[:, :-1])
    return TrainOutput(logits=logits, targets=y)
