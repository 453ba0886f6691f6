"""On-device top-p / top-k categorical sampling.

Mask semantics match the reference sampler exactly
(/root/reference/midi_model.py:152-165):

- sort probabilities descending;
- zero entries whose *exclusive* cumulative mass exceeds ``p``
  (``cumsum - p_i > p``);
- keep only the first ``k`` entries of the sorted axis;
- renormalize and draw categorically, mapping back to original ids.

``top_k`` and ``top_p`` are traced scalars (no recompile when the UI slider
moves).  Greedy decoding (used for checkpoint-parity testing) is the argmax of
the same masked distribution.

On TPU, 2-D batches dispatch to the Pallas kernel in ops/sampler.py:
``jax.lax.top_k`` lowers to a full-vocab sort (~61 us for [32, 3406]
regardless of k) while the kernel's iterative extraction with a top-p early
stop measures ~8 us at the default top_k=20 — same kept-set semantics, same
categorical distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


K_CAP = 128  # ≥ the largest top_k the UI offers (reference slider max, app.py:469)


def sample_top_p_k(probs: jax.Array, top_p, top_k, key: jax.Array,
                   k_cap: int = K_CAP, use_kernel: bool = None) -> jax.Array:
    """probs: [..., V] (need not be normalized). Returns sampled ids [...].

    Only the top ``k_cap`` entries are materialized (a partial top-k, far
    cheaper than a full vocab sort on TPU); since the reference keeps at most
    ``top_k ≤ k_cap`` sorted entries anyway, results are identical to the
    full-sort formulation for any ``top_k ≤ k_cap``.

    ``top_p`` / ``top_k`` may be scalars or per-row vectors matching
    ``probs.shape[:-1]`` (continuous batching serves requests with
    different sampling knobs in one batch).

    ``use_kernel`` selects the Pallas Gumbel-argmax kernel (default: on for
    2-D inputs on TPU).  The kernel samples the SAME distribution as the XLA
    path but realizes a different draw for a given PRNG key (Gumbel-argmax
    vs inverse-CDF) — pass ``use_kernel=False`` to force the XLA sampler
    when cross-backend draw reproducibility matters (parity/debug runs).

    ``key`` may be one raw PRNG key ([2] uint32, shared draw stream) or a
    per-row batch of keys ([B, 2], 2-D probs only): each row then draws from
    ITS OWN stream — the continuous batcher's per-request seed
    reproducibility (a slot's draws depend only on its request's seed and
    position, not on which other requests share the batch).
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if probs.ndim == 2 and use_kernel and jax.default_backend() == "tpu":
        from ..ops.sampler import sample_top_p_k_tpu

        return sample_top_p_k_tpu(probs, top_p, top_k, key, k_cap=k_cap)
    top_p = jnp.asarray(top_p)[..., None]  # scalar -> [1]; [B] -> [B, 1]
    top_k = jnp.asarray(top_k)[..., None]
    sorted_probs, sorted_idx = jax.lax.top_k(probs, k_cap)  # descending
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cumsum - sorted_probs) <= top_p
    keep &= jnp.arange(k_cap) < top_k
    filtered = jnp.where(keep, sorted_probs, 0.0)
    filtered = filtered / filtered.sum(axis=-1, keepdims=True)
    if key.ndim == 2:  # per-row keys [B, 2]
        if probs.ndim != 2:
            raise ValueError("per-row keys require 2-D probs")
        choice = jax.vmap(jax.random.categorical)(key, jnp.log(filtered))
    else:
        choice = jax.random.categorical(key, jnp.log(filtered))
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0]


def sample_greedy(probs: jax.Array) -> jax.Array:
    return jnp.argmax(probs, axis=-1)
