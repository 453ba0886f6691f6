"""Llama-style decoder stack as pure-functional JAX over parameter pytrees.

HF-Llama-exact numerics (required for torch-checkpoint parity, see
/root/reference/midi_model.py:105-106 which builds ``transformers.LlamaModel``):

- RMSNorm in float32, weight applied after the cast back (eps 1e-6 default);
- rotary embeddings in the "rotate_half" (non-interleaved) layout, angles
  computed in float32 from ``rope_theta``;
- attention scores scaled by ``head_dim**-0.5`` with float32 softmax;
- SwiGLU MLP ``down(silu(gate(x)) * up(x))``; no biases anywhere.

Weights are stored as ``[in, out]`` matrices (transposed from torch's Linear)
and **stacked across layers** on a leading axis so the layer loop is a single
``lax.scan`` — one compiled layer body regardless of depth, which keeps
compile times flat and lets XLA pipeline HBM prefetch across layers.

The same forward serves training (no cache) and decode (ring KV cache with a
write index); decode keeps every tensor statically shaped so the generation
loop can live entirely inside one jitted ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import TransformerConfig


class KVCache(NamedTuple):
    """Per-stack KV cache: keys/values stacked over layers, plus write index.

    Shapes: ``k, v: [num_layers, batch, max_seq, kv_heads, head_dim]``;
    ``index``: number of tokens already cached — an int32 scalar when every
    batch row is aligned (training-style decode), or a ``[batch]`` vector for
    continuous batching where each slot has its own length (single-token
    decode only).

    int8 KV lives in the PAGED pools instead (ops/paged_allheads.PagedPools
    with ``quantized=True``): decode attention is HBM-bound on cache reads,
    and the paged kernel folds dequantization into the flash math where the
    dense XLA path could not (the round-1 dense int8 cache measured a mere
    +5% and was deleted).
    """

    k: jax.Array
    v: jax.Array
    index: jax.Array  # int32 scalar or [batch] vector

    @staticmethod
    def zeros(cfg: TransformerConfig, batch: int, max_seq: int, dtype=jnp.float32,
              per_row: bool = False):
        shape = (cfg.num_layers, batch, max_seq, cfg.kv_heads, cfg.head_dim)
        index = (jnp.zeros((batch,), jnp.int32) if per_row
                 else jnp.zeros((), jnp.int32))
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       index=index)


def init_transformer_params(key: jax.Array, cfg: TransformerConfig,
                            dtype=jnp.float32, embed: bool = True) -> dict:
    """Random init (normal(initializer_range), like HF)."""
    n_k = 8
    keys = jax.random.split(key, n_k)
    d, dh = cfg.hidden_size, cfg.head_dim
    h, hkv, f, l_n = cfg.num_heads, cfg.kv_heads, cfg.intermediate_size, cfg.num_layers
    std = cfg.initializer_range

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    params = {
        "layers": {
            "wq": w(keys[0], l_n, d, h * dh),
            "wk": w(keys[1], l_n, d, hkv * dh),
            "wv": w(keys[2], l_n, d, hkv * dh),
            "wo": w(keys[3], l_n, h * dh, d),
            "w_gate": w(keys[4], l_n, d, f),
            "w_up": w(keys[5], l_n, d, f),
            "w_down": w(keys[6], l_n, f, d),
            "ln_attn": jnp.ones((l_n, d), dtype),
            "ln_mlp": jnp.ones((l_n, d), dtype),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if embed:
        params["embed"] = w(keys[7], cfg.vocab_size, d)
    return params


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return weight * xf.astype(dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions; float32, shape [..., head_dim]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, Dh]; cos/sin: [S, Dh] or [B, S, Dh] (float32)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]  # broadcast over heads
    sin = sin[:, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin
    return out.astype(x.dtype)


def _attention(q, k, v, mask_bias, cached: bool):
    """q: [B,S,H,Dh]; k,v: [B,T,Hkv,Dh]; mask_bias: [B or 1, 1, S, T] additive.

    Dispatches through ops.attention: XLA einsum with fp32 softmax (HF
    parity), or the Pallas flash kernel for long cacheless (training)
    sequences on TPU.
    """
    from ..ops.attention import attention as attn_dispatch

    return attn_dispatch(q, k, v, mask_bias, causal_full=not cached,
                         cached=cached)


def _layer(x, lp, cfg: TransformerConfig, cos, sin, mask_bias,
           cache_kv: Optional[Tuple[jax.Array, jax.Array]], cache_index,
           tp_axis: Optional[str] = None, prefill: bool = False):
    """One decoder layer. Returns (x, (new_k_cache, new_v_cache) or None).
    ``tp_axis``: Megatron shard step (see :func:`decode_paged`) — the two
    row-parallel matmuls psum over the named axis.

    ``prefill``: the caller promises ``cache_index == 0`` and the query
    block is the whole written prefix — attention is then plain causal
    self-attention over the FRESH k/v (identical math: cache rows past the
    block are masked to -inf either way), so the flash kernel applies and
    the dense [B, H, S, T] f32 score tensor never materializes (at bs=32 x
    4096-event prompts that tensor alone is 34 GB — an OOM the reference
    never hits only because torch SDPA flashes it, app.py:46)."""
    b, s, d = x.shape
    h, hkv, dh = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    hctx = rms_norm(x, lp["ln_attn"], eps)
    q = (hctx @ lp["wq"]).reshape(b, s, h, dh)
    k = (hctx @ lp["wk"]).reshape(b, s, hkv, dh)
    v = (hctx @ lp["wv"]).reshape(b, s, hkv, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        # cache_kv = (k cache, v cache, layer index); the caller carries the
        # [L, B, T, Hkv, Dh] buffers so only the new tokens are written in
        # place — restacking the whole cache as loop outputs would double the
        # HBM traffic of every decode step.
        ck_all, cv_all, li = cache_kv
        if getattr(cache_index, "ndim", 0) == 1:
            # per-row write offsets (continuous batching, s == 1).  TPU
            # scatters with computed indices serialize (measured ~50x slower
            # than the decode step itself), so write via a one-hot blend of
            # the layer slice instead — bandwidth-bound, fused by XLA.
            t_len = ck_all.shape[2]
            onehot = (jnp.arange(t_len)[None, :] == cache_index[:, None])
            sel = onehot[..., None, None]  # [B, T, 1, 1]

            def blend(all_buf, new_row):
                old = jax.lax.dynamic_index_in_dim(all_buf, li, 0, keepdims=False)
                upd = jnp.where(sel, new_row.astype(all_buf.dtype), old)
                return jax.lax.dynamic_update_slice(
                    all_buf, upd[None], (li, 0, 0, 0, 0))

            ck_all = blend(ck_all, k)  # k [B,1,H,D] broadcasts
            cv_all = blend(cv_all, v)
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k[None], (li, 0, cache_index, 0, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v[None], (li, 0, cache_index, 0, 0))
        new_cache = (ck_all, cv_all)
        if prefill:
            # full-prefix self-attention over the fresh k/v (flash-eligible);
            # the bias is sliced to the block for the XLA fallback
            attn = _attention(q, k, v, mask_bias[..., :s],
                              cached=False).reshape(b, s, h * dh)
            attn_out = attn @ lp["wo"]
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            x = x + attn_out
            hmlp = rms_norm(x, lp["ln_mlp"], eps)
            gated = jax.nn.silu(hmlp @ lp["w_gate"]) * (hmlp @ lp["w_up"])
            down = gated @ lp["w_down"]
            if tp_axis is not None:
                down = jax.lax.psum(down, tp_axis)
            return x + down, new_cache
        k = jax.lax.dynamic_index_in_dim(ck_all, li, axis=0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(cv_all, li, axis=0, keepdims=False)

    attn = _attention(q, k, v, mask_bias,
                      cached=cache_kv is not None).reshape(b, s, h * dh)
    attn_out = attn @ lp["wo"]
    if tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, tp_axis)
    x = x + attn_out

    hmlp = rms_norm(x, lp["ln_mlp"], eps)
    gated = jax.nn.silu(hmlp @ lp["w_gate"]) * (hmlp @ lp["w_up"])
    down = gated @ lp["w_down"]
    if tp_axis is not None:
        down = jax.lax.psum(down, tp_axis)
    x = x + down
    return x, new_cache


def forward(params: dict, cfg: TransformerConfig, inputs_embeds: jax.Array,
            cache: Optional[KVCache] = None, remat: bool = False,
            tp_axis: Optional[str] = None, prefill: bool = False,
            ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the stack on pre-computed input embeddings.

    - without cache: full causal self-attention over ``inputs_embeds [B,S,D]``;
      ``remat=True`` checkpoints each layer whole (recompute in backward),
      trading ~30% more FLOPs for O(layers) less activation memory;
      ``remat="dots"`` uses the selective ``dots_with_no_batch_dims_saveable``
      policy instead — matmul outputs are SAVED (no recompute of the MXU
      work), only the cheap elementwise/norm/softmax chains rematerialize.
      Much closer to no-remat speed at a fraction of full-remat's memory
      savings — the right default for tv2o-large on a 16 GB chip.
    - with cache: positions start at ``cache.index``; new KV are written into
      the cache (static max length) and attention spans all valid positions.

    Returns (hidden_states [B,S,D], updated cache or None).
    """
    b, s, _ = inputs_embeds.shape

    if cache is None:
        positions = jnp.arange(s)
        q_pos = positions[:, None]
        k_pos = positions[None, :]
        bias = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias[None, None]  # [1, 1, S, S]
    elif getattr(cache.index, "ndim", 0) == 1:
        # continuous batching: per-row cache lengths (single-token decode)
        positions = cache.index[:, None] + jnp.arange(s)  # [B, S]
        t = cache.k.shape[2]
        k_pos = jnp.arange(t)[None, None, :]
        bias = jnp.where(k_pos <= positions[:, :, None], 0.0, -jnp.inf)
        bias = bias[:, None].astype(jnp.float32)  # [B, 1, S, T]
    else:
        positions = cache.index + jnp.arange(s)
        t = cache.k.shape[2]
        k_pos = jnp.arange(t)[None, :]
        bias = jnp.where(k_pos <= positions[:, None], 0.0, -jnp.inf)
        bias = bias[None, None].astype(jnp.float32)  # [1, 1, S, T]

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    x = inputs_embeds
    lp = params["layers"]
    if cache is None:
        def body(carry, layer_params):
            out, _ = _layer(carry, layer_params, cfg, cos, sin, bias, None,
                            None, tp_axis)
            return out, None

        if remat == "dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif remat == "dots_all":
            # saves EVERY matmul output (attention scores/context included):
            # least recompute of the selective policies, most memory
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_saveable)
        elif remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, lp)
        new_cache = None
    else:
        # Layer scan with the cache carried whole and indexed per layer.
        # (Measured on v5e: this beats a python-unrolled layer loop in the
        # full decode loop — the unrolled variant's per-layer weight slices
        # don't fuse and cost ~20% end-to-end.)
        def body(carry, layer_params):
            out, ck, cv, li = carry
            out, (ck, cv) = _layer(out, layer_params, cfg, cos, sin,
                                   bias, (ck, cv, li), cache.index, tp_axis,
                                   prefill=prefill)
            return (out, ck, cv, li + 1), None

        (x, nk, nv, _), _ = jax.lax.scan(
            body, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)), lp)
        new_cache = KVCache(k=nk, v=nv, index=cache.index + s)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, new_cache


def embed_tokens(params: dict, tokens: jax.Array) -> jax.Array:
    """Token-id lookup into this stack's embedding table."""
    return jnp.take(params["embed"], tokens, axis=0)


def prefill_paged(params: dict, cfg: TransformerConfig, emb: jax.Array,
                  pools, *, page_size: int, pages_per_slot: int,
                  tp_axis: Optional[str] = None) -> Tuple[jax.Array, "object"]:
    """Run the stack over a whole prompt, writing KV DIRECTLY into paged
    pools (ops.paged_allheads layout, layer axis folded into pages).

    The scratch-cache route (dense ``KVCache`` + a pack/relayout step) holds
    the [L, B, S, H, D] scratch AND the pools live at once — prefill peak
    memory was 2x the cache itself, which capped batch x prompt length well
    below what the pools alone fit (bs=32 x 4096-event prompts: 3.2 GB
    scratch + 6.4 GB pools + transients OOMs a 16 GB chip).  Here each
    layer's packed pages are written straight into the pool slice inside
    the layer scan; attention is full-causal over the fresh k/v (flash on
    TPU — see ``_layer`` prefill notes).

    emb: [B, S, D] input embeddings; pools at full capacity
    (``pages_per_slot`` pages per layer-row).  Rows past S in the written
    pages are zero — every reader masks by true length.  Returns
    (hidden [B, S, D] after the final norm, pools).
    """
    from ..ops.paged_allheads import (combine_scales, pack_heads,
                                      quantize_packed)

    b, s, d = emb.shape
    h, hkv, dh = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    l_n = cfg.num_layers
    ps = page_size
    n_pre = -(-s // ps)
    pool_shape = pools.k.shape
    assert pool_shape[0] == l_n * b * pages_per_slot, pool_shape

    positions = jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    bias = jnp.where(positions[None, :] <= positions[:, None], 0.0,
                     -jnp.inf).astype(jnp.float32)[None, None]  # [1,1,S,S]

    def pool4(buf):
        return buf.reshape(l_n * b, pages_per_slot, ps, buf.shape[-1])

    def write(buf4, flat, li):  # flat [B, S, w] -> this layer's pages
        pad = n_pre * ps - s
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad), (0, 0)))
        flat = flat.reshape(b, n_pre, ps, -1).astype(buf4.dtype)
        return jax.lax.dynamic_update_slice(buf4, flat, (li * b, 0, 0, 0))

    def body(carry, lp):
        x, k4, v4, s4, li = carry
        hctx = rms_norm(x, lp["ln_attn"], eps)
        q = (hctx @ lp["wq"]).reshape(b, s, h, dh)
        k = (hctx @ lp["wk"]).reshape(b, s, hkv, dh)
        v = (hctx @ lp["wv"]).reshape(b, s, hkv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attention(q, k, v, bias, cached=False).reshape(b, s, h * dh)
        attn_out = attn @ lp["wo"]
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        x = x + attn_out
        hmlp = rms_norm(x, lp["ln_mlp"], eps)
        gated = jax.nn.silu(hmlp @ lp["w_gate"]) * (hmlp @ lp["w_up"])
        down = gated @ lp["w_down"]
        if tp_axis is not None:
            down = jax.lax.psum(down, tp_axis)
        x = x + down

        if s4 is not None:
            kq, kscale = quantize_packed(k, hkv, dh)
            vq, vscale = quantize_packed(v, hkv, dh)
            k4 = write(k4, kq, li)
            v4 = write(v4, vq, li)
            s4 = write(s4, combine_scales(kscale, vscale, hkv), li)
        else:
            k4 = write(k4, pack_heads(k, hkv, dh), li)
            v4 = write(v4, pack_heads(v, hkv, dh), li)
        return (x, k4, v4, s4, li + 1), None

    s4 = pool4(pools.scales) if pools.quantized else None
    (x, k4, v4, s4, _), _ = jax.lax.scan(
        body, (emb, pool4(pools.k), pool4(pools.v), s4,
               jnp.zeros((), jnp.int32)), params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    pools = pools._replace(
        k=k4.reshape(pool_shape), v=v4.reshape(pool_shape),
        scales=s4.reshape(pools.scales.shape) if s4 is not None else None)
    return x, pools


def decode_paged(params: dict, cfg: TransformerConfig, x: jax.Array,
                 pools, index: jax.Array,
                 active: Optional[jax.Array] = None, *, page_size: int,
                 pages_per_slot: int, pages_per_compute_block: int = 4,
                 streaming: bool = True, tp_axis: Optional[str] = None,
                 ) -> Tuple[jax.Array, "object"]:
    """One-token decode step over paged KV pools (continuous batching).

    ``tp_axis``: a mesh axis name makes this a tensor-parallel shard step
    (Megatron decode): the caller passes a LOCAL cfg (this shard's heads /
    intermediate slice), per-shard weight slices (qkv/gate/up column-,
    o/down row-parallel) and lane-sharded pools; the two row-parallel
    matmuls psum over the axis so ``x`` stays replicated.  Serves
    tv2o-large bf16 pools across chips (each holds its heads' pages).

    x: [B, D] input embeddings; index: int32 [B] per-slot lengths BEFORE this
    token; active: bool [B] — inactive slots' attention is skipped entirely
    by the paged kernel (their lengths are forced to 0) and their compute is
    garbage the caller must mask. ``pools`` is an ops.paged_allheads
    PagedPools in the all-heads flat layout ``[n_pages, page_size,
    Hkv*LANE]`` with the layer axis folded into the page axis, so it flows
    through the layer ``lax.scan`` without per-layer slicing. Quantized
    (int8) pools halve the cache-read traffic; the fresh row is quantized
    per-token-per-head on write and the kernel dequantizes in the flash math.

    Returns (hidden [B, D], pools). Writes for rows at capacity are clamped
    to the last position (callers must retire such slots).

    The fresh token is NOT attended from the pool: the kernel attends the
    cached history (lengths = index) and returns flash stats (m, l), and the
    token's self-attention term merges analytically (exact, unquantized).
    The fresh row is appended IN the attention kernel (a small read-modify-
    write tile fused into the cells that are already streaming the cache) —
    no separate write dispatch at all.
    """
    from ..ops import paged_allheads as pa

    b, d = x.shape
    h, hkv, dh = cfg.num_heads, cfg.kv_heads, cfg.head_dim
    groups = h // hkv
    eps = cfg.rms_norm_eps
    pps = pages_per_slot
    capacity = pps * page_size
    n_layers = cfg.num_layers
    quantized = pools.quantized

    if active is None:
        active = jnp.ones((b,), bool)
    write_pos = jnp.clip(index, 0, capacity - 1)
    lengths = jnp.where(active, jnp.minimum(index, capacity), 0)
    cos, sin = rope_cos_sin(index[:, None].astype(jnp.int32), dh,
                            cfg.rope_theta)  # [B, 1, Dh]
    scale = dh ** -0.5
    slot_ids = jnp.arange(b, dtype=jnp.int32)

    def body(carry, lp):
        xx, li, pools = carry
        hc = rms_norm(xx[:, None, :], lp["ln_attn"], eps)
        q = (hc @ lp["wq"]).reshape(b, 1, h, dh)
        k = (hc @ lp["wk"]).reshape(b, 1, hkv, dh)
        v = (hc @ lp["wv"]).reshape(b, 1, hkv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k, v = k[:, 0], v[:, 0]  # [B, Hkv, Dh]

        if quantized:
            kq, kscale = pa.quantize_packed(k, hkv, dh)
            vq, vscale = pa.quantize_packed(v, hkv, dh)
            write = (kq, vq, pa.combine_scales(kscale, vscale, hkv))
        else:
            write = (pa.pack_heads(k, hkv, dh), pa.pack_heads(v, hkv, dh),
                     None)
        base_pages = (li * b + slot_ids) * pps
        # q pre-scaled in fp32 (the kernel has no internal scaling; fp32
        # matches the dense path's fp32-score scaling for HF parity)
        qs = q[:, 0].astype(jnp.float32) * scale
        o, m, l, pools = pa.paged_attention_stats(
            qs, pools, lengths, base_pages,
            write + (base_pages + write_pos // page_size,
                     write_pos % page_size),
            page_size=page_size, pages_per_slot=pps, kv_heads=hkv,
            head_dim=dh, ppcb=pages_per_compute_block, streaming=streaming)

        # flash merge of the fresh token's self term; for length-0 rows
        # (m=-inf, l=0) this reduces to exactly the self attention
        k_rep = jnp.repeat(k.astype(jnp.float32), groups, axis=1)  # [B, H, Dh]
        v_rep = jnp.repeat(v.astype(jnp.float32), groups, axis=1)
        s_self = jnp.sum(qs * k_rep, axis=-1)  # [B, H]
        m2 = jnp.maximum(m, s_self)
        w_cache = l * jnp.exp(m - m2)
        w_self = jnp.exp(s_self - m2)
        attn = ((w_cache[..., None] * o.astype(jnp.float32)
                 + w_self[..., None] * v_rep)
                / (w_cache + w_self)[..., None])

        attn_out = attn.reshape(b, h * dh).astype(xx.dtype) @ lp["wo"]
        if tp_axis is not None:  # row-parallel wo: sum shard partials
            attn_out = jax.lax.psum(attn_out, tp_axis)
        xx = xx + attn_out
        hm = rms_norm(xx, lp["ln_mlp"], eps)
        gated = jax.nn.silu(hm @ lp["w_gate"]) * (hm @ lp["w_up"])
        down = gated @ lp["w_down"]
        if tp_axis is not None:  # row-parallel w_down
            down = jax.lax.psum(down, tp_axis)
        xx = xx + down
        return (xx, li + 1, pools), None

    (x, _, pools), _ = jax.lax.scan(
        body, (x, jnp.zeros((), jnp.int32), pools), params["layers"])

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, pools
