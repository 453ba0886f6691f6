"""Paged KV-cache ops for continuous-batch decoding.

The continuous batcher gives every slot its own cache length. Round 1 stored
slot caches densely ``[L, B, S, H, D]`` and wrote new tokens with a one-hot
blend over the whole sequence axis (TPU scatters with computed indices
serialize), which cost a full cache-slice rewrite per layer per token, and
attention always read the full static ``S`` for every slot.

Here the cache is a page pool (the vLLM/TPU serving layout):

    k_pool, v_pool: [Hkv, n_pages_total, page_size, head_dim]

with the LAYER axis folded into the page axis — pages ``(l*B + b)*pps ..``
belong to (layer l, slot b). The fold matters on TPU: the pool is passed
whole through the layer ``lax.scan`` and into the Pallas kernels (its
``BlockSpec`` keeps it in HBM), so no per-layer slice of a multi-GB buffer is
ever materialized; selecting a layer costs one iota-add on the page table.

- Reads: the jax-shipped Pallas ``paged_attention`` kernel DMAs only the
  pages below each slot's length (and skips length-0 rows entirely), so
  attention traffic scales with the sum of ACTUAL slot lengths instead of
  ``B * S``.
- Writes: ``kv_append`` is a tiny Pallas kernel that rewrites exactly one
  page per (slot, k/v) — ~page_size·head_dim bytes per head — instead of the
  one-hot blend's full-slice rewrite.

Reference capability being beaten: the ONNX app's cache trim
(/root/reference/app_onnx.py:52-85), which restarts the whole cache to
manage length on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# TPU lane width. Pool pages with head_dim < 128 cannot be DMA'd by the
# paged kernel (Mosaic: "Slice shape along dimension 3 must be aligned to
# tiling (128)"), and the tiled HBM layout lane-pads them anyway — so pools
# are allocated at a 128 floor and q/k/v are zero-padded at the boundary
# (zero columns change neither scores nor outputs; outputs are sliced back).
LANE = 128


def pool_head_dim(head_dim: int) -> int:
    return max(head_dim, LANE)


def alloc_pools(kv_heads: int, n_pages: int, page_size: int, head_dim: int,
                dtype):
    """Allocate zeroed (k_pool, v_pool) with the lane-padded head dim."""
    shape = (kv_heads, n_pages, page_size, pool_head_dim(head_dim))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _pad_lane(x, d_pool: int):
    d = x.shape[-1]
    if d == d_pool:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, d_pool - d)]
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# kv_append: write one new token's K and V into each slot's current page
# ---------------------------------------------------------------------------


def _append_kernel(pages_ref, offs_ref, kpool_ref, vpool_ref, newk_ref,
                   newv_ref, kout_ref, vout_ref):
    """Grid (B,): rewrite slot b's current page with its new row inserted.

    Blocks are [Hkv, page_size, D] views of the pool page selected by the
    prefetched page id; in/out are aliased so only this page's bytes move.
    The row insert is a per-head [page_size, D] vector select (iota == off):
    Mosaic rejects both in-kernel unit-dim reshapes ("unsupported shape
    cast") and unaligned dynamic sublane stores ("index in dimension 2 is a
    multiple of 8"), so the page is rewritten whole from registers — the
    page is VMEM-resident either way, HBM traffic is unchanged. The head
    loop is a static python unroll (Hkv is small).
    """
    del pages_ref  # consumed by the index maps
    b = pl.program_id(0)
    off = offs_ref[b]
    ps, d = kout_ref.shape[1], kout_ref.shape[2]
    sel = jax.lax.broadcasted_iota(jnp.int32, (ps, d), 0) == off
    for h in range(kout_ref.shape[0]):
        new_k = jnp.broadcast_to(newk_ref[pl.ds(h, 1), :], (ps, d))
        new_v = jnp.broadcast_to(newv_ref[pl.ds(h, 1), :], (ps, d))
        kout_ref[h, :, :] = jnp.where(sel, new_k, kpool_ref[h, :, :])
        vout_ref[h, :, :] = jnp.where(sel, new_v, vpool_ref[h, :, :])


def _kv_append_tpu(k_pool, v_pool, new_k, new_v, pages, offsets,
                   interpret: bool = False):
    hkv, n_pages, ps, d = k_pool.shape
    b = new_k.shape[0]

    pool_spec = pl.BlockSpec(
        (hkv, None, ps, d), lambda b, pages, offs: (0, pages[b], 0, 0))
    new_spec = pl.BlockSpec((None, hkv, d), lambda b, pages, offs: (b, 0, 0))
    new_k = new_k.astype(k_pool.dtype)
    new_v = new_v.astype(v_pool.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pages, offsets
        grid=(b,),
        in_specs=[pool_spec, pool_spec, new_spec, new_spec],
        out_specs=[pool_spec, pool_spec],
    )
    return pl.pallas_call(
        _append_kernel,
        out_shape=[jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                   jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype)],
        grid_spec=grid_spec,
        # operand indices count the prefetch scalars: 0=pages, 1=offsets,
        # 2=k_pool, 3=v_pool
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pages, offsets, k_pool, v_pool, new_k, new_v)


def _kv_append_xla(k_pool, v_pool, new_k, new_v, pages, offsets):
    """Reference path (CPU tests): scatter via advanced indexing."""
    nk = jnp.transpose(new_k, (1, 0, 2)).astype(k_pool.dtype)  # [Hkv, B, D]
    nv = jnp.transpose(new_v, (1, 0, 2)).astype(v_pool.dtype)
    k_pool = k_pool.at[:, pages, offsets, :].set(nk)
    v_pool = v_pool.at[:, pages, offsets, :].set(nv)
    return k_pool, v_pool


def kv_append(k_pool, v_pool, new_k, new_v, pages, offsets):
    """Write each slot's new token (k, v) into its current page.

    k_pool/v_pool: [Hkv, n_pages, page_size, D_pool];
    new_k/new_v: [B, Hkv, D] (lane-padded here if D < D_pool);
    pages/offsets: int32 [B] (absolute page id — including any layer fold —
    and row within the page).
    """
    d_pool = k_pool.shape[-1]
    new_k = _pad_lane(new_k, d_pool)
    new_v = _pad_lane(new_v, d_pool)
    if _on_tpu():
        return _kv_append_tpu(k_pool, v_pool, new_k, new_v,
                              pages.astype(jnp.int32), offsets.astype(jnp.int32))
    return _kv_append_xla(k_pool, v_pool, new_k, new_v, pages, offsets)


# ---------------------------------------------------------------------------
# paged attention (read side)
# ---------------------------------------------------------------------------


def _paged_attention_xla(q, k_pool, v_pool, lengths, page_indices):
    """Reference path (CPU tests): gather pages densely, masked softmax.

    Numerics mirror ops.attention's cached decode path (fp32 softmax,
    pre-scaled q like the Pallas kernel's contract). Returns (o, m, l) like
    the Pallas kernel: the running max and normalizer let callers fold in
    extra tokens with a flash-style merge.
    """
    b, h, d = q.shape
    hkv, _, ps, _ = k_pool.shape
    pps = page_indices.shape[1]
    k = k_pool[:, page_indices]  # [Hkv, B, pps, ps, D]
    v = v_pool[:, page_indices]
    k = jnp.transpose(k, (1, 0, 2, 3, 4)).reshape(b, hkv, pps * ps, d)
    v = jnp.transpose(v, (1, 0, 2, 3, 4)).reshape(b, hkv, pps * ps, d)
    groups = h // hkv
    k = jnp.repeat(k, groups, axis=1)
    v = jnp.repeat(v, groups, axis=1)
    scores = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    valid = jnp.arange(pps * ps)[None, None, :] < lengths[:, None, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)  # -inf for length-0 rows
    exp = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    l = exp.sum(axis=-1)  # 0 for length-0 rows
    probs = exp / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.einsum("bht,bhtd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype), m, l


def _paged_attention_pallas(q, k_pool, v_pool, lengths, page_indices,
                            pages_per_compute_block: int):
    """Launch the jax-shipped paged flash-decode kernel.

    This is a lean re-wrap of
    jax.experimental.pallas.ops.tpu.paged_attention.paged_attention
    (non-quantized, no-megacore, inline-seq-dim config only) because the
    shipped wrapper's ``num_groups % 8 != 0`` path reuses the q BlockSpec
    (last dim = head_dim) for the ``m``/``l`` outputs whose last dim is 1 —
    an invalid block mapping that fails to lower for MHA/low-group models
    like this one. Here m/l get their own (..., 1)-shaped spec.
    """
    import functools as _ft

    from jax.experimental.pallas.ops.tpu.paged_attention.paged_attention_kernel import (  # noqa: E501
        paged_flash_attention_kernel_inline_seq_dim)

    batch_size, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, _ = k_pool.shape
    pages_per_sequence = page_indices.shape[1]
    num_groups = num_q_heads // num_kv_heads

    # <8 groups: give q a unit minor-adjacent dim so Mosaic picks a <1x128>
    # layout (same trick as the shipped wrapper)
    q_kernel = q.reshape(batch_size, num_q_heads, 1, head_dim).astype(
        jnp.float32)
    q_spec = pl.BlockSpec((None, num_groups, None, head_dim),
                          lambda core, b, h, *_: (b, h, 0, 0))
    ml_spec = pl.BlockSpec((None, num_groups, None, 1),
                           lambda core, b, h, *_: (b, h, 0, 0))

    grid = (1, batch_size, num_kv_heads)
    out, m, l = pl.pallas_call(
        _ft.partial(
            paged_flash_attention_kernel_inline_seq_dim,
            pages_per_sequence=pages_per_sequence,
            batch_size=batch_size,
            pages_per_compute_block=pages_per_compute_block,
            mask_value=-0.7 * float(np.finfo(np.float32).max),
            attn_logits_soft_cap=None,
            megacore_mode=None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # lengths, page_indices, buffer_index, init_flag
            num_scalar_prefetch=4,
            in_specs=[
                q_spec,
                pl.BlockSpec(memory_space=pl.ANY),
                None,  # k scales
                pl.BlockSpec(memory_space=pl.ANY),
                None,  # v scales
            ],
            out_specs=[q_spec, ml_spec, ml_spec],
            grid=grid,
            scratch_shapes=(
                pltpu.VMEM((2, pages_per_compute_block, page_size, head_dim),
                           k_pool.dtype),
                None,
                pltpu.VMEM((2, pages_per_compute_block, page_size, head_dim),
                           v_pool.dtype),
                None,
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        out_shape=[
            jax.ShapeDtypeStruct(q_kernel.shape, jnp.float32),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], 1), jnp.float32),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], 1), jnp.float32),
        ],
    )(
        lengths,
        page_indices.reshape(-1),
        jnp.zeros((1,), jnp.int32),  # buffer index
        jnp.ones((1,), jnp.int32),  # init flag
        q_kernel,
        k_pool,
        None,
        v_pool,
        None,
    )
    b, h, _ = q.shape
    return (out.reshape(q.shape).astype(q.dtype),
            m.reshape(b, h), l.reshape(b, h))


def paged_attention_stats(q, k_pool, v_pool, lengths, page_indices,
                          pages_per_compute_block: int = 4):
    """Like :func:`paged_attention` but also returns the flash softmax stats
    (m, l) [B, H] so callers can fold in extra tokens analytically — the
    decode step uses this to attend the fresh token WITHOUT writing it to the
    pool first, which lets all layers' pool writes batch into one kernel
    call per event. Zero-length rows return (o=0, m=-inf, l=0): a flash
    merge with a self term then reduces to exactly the self attention.
    """
    d = q.shape[-1]
    q = _pad_lane(q, k_pool.shape[-1])
    if _on_tpu():
        pps = page_indices.shape[1]
        ppcb = int(np.gcd(pages_per_compute_block, pps))
        out, m, l = _paged_attention_pallas(
            q, k_pool, v_pool, lengths.astype(jnp.int32),
            page_indices.astype(jnp.int32), ppcb)
    else:
        out, m, l = _paged_attention_xla(q, k_pool, v_pool, lengths,
                                         page_indices)
    return out[..., :d], m, l


def paged_attention(q, k_pool, v_pool, lengths, page_indices,
                    pages_per_compute_block: int = 4):
    """Flash decode attention over paged KV (q pre-scaled by caller).

    q: [B, H, D] (lane-padded here if D < the pool's D); pools:
    [Hkv, n_pages, page_size, D_pool]; lengths: int32 [B] (0 skips the row
    entirely); page_indices: int32 [B, pages_per_sequence].
    """
    return paged_attention_stats(q, k_pool, v_pool, lengths, page_indices,
                                 pages_per_compute_block)[0]
