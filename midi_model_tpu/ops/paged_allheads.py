"""All-heads-per-cell paged flash-decode kernel (continuous batching v2).

The jax-shipped ``paged_attention`` kernel runs one grid cell per
(slot, kv_head): at 32 slots x 16 heads x 12 layers that is 6144 sequential
cells per decoded event on the single v5e core, and each cell's page DMAs
move only head_dim-wide rows. Measured, that cell overhead (~0.25 ms/layer)
dominated the batcher's short-length steps.

This kernel restructures the problem for the hardware:

- pool layout ``[n_pages, page_size, Hkv * LANE]`` — one page holds ALL
  heads contiguously, so one compute block is ONE contiguous DMA of
  ``ppcb * page_size * Hkv*LANE`` bytes (hundreds of KB, HBM-friendly)
  instead of ``Hkv`` separate thin copies;
- grid ``(B,)`` — 16x fewer cells; each cell computes every head;
- per-head q·k via ONE MXU matmul per page with a block-diagonal Q matrix
  ``[Hkv*LANE, H]`` built (cheaply, in XLA) outside the kernel:
  ``k_page [ps, Hkv*LANE] @ q_diag -> scores [ps, H]``;
- context via ``p^T [H, ps] @ v_page [ps, Hkv*LANE]``, taking each head's
  diagonal 128-lane block of the accumulator;
- flash accumulation vectorized across all heads at once; per-slot lengths
  bound the block loop (idle/empty slots do nothing); (m, l) stats are
  returned so the caller can merge the fresh token's self term analytically
  (see models/llama.py decode_paged).

Slot pages are CONTIGUOUS (fixed per-slot ranges with the layer axis folded
into the page axis, as in ops/paged.py), so the kernel needs only a base
page per slot — no page-table indirection in the inner loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def head_stride(head_dim: int, kv_heads: int = 1) -> int:
    """Smallest per-head stride that lane-aligns the packed page row
    (Hkv * stride % 128 == 0). No padding when Hkv*head_dim already aligns —
    padding multiplies the kernel's HBM traffic, which is the whole cost of
    decode attention (the real model: 16 heads x 64 dims = 1024, unpadded).
    """
    stride = head_dim
    while (kv_heads * stride) % LANE:
        stride += 1
    return stride


def alloc_pools(kv_heads: int, n_pages: int, page_size: int, head_dim: int,
                dtype):
    """Zeroed (k_pool, v_pool): [n_pages, page_size, kv_heads * head_dim]."""
    shape = (n_pages, page_size, kv_heads * head_stride(head_dim, kv_heads))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def pack_heads(x, kv_heads: int, head_dim: int):
    """[..., Hkv, D] -> [..., Hkv*stride] (flat packed row)."""
    hs = head_stride(head_dim, kv_heads)
    if head_dim < hs:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, hs - head_dim)]
        x = jnp.pad(x, pad)
    return x.reshape(*x.shape[:-2], kv_heads * hs)


# ---------------------------------------------------------------------------
# kv append (one flat row per slot)
# ---------------------------------------------------------------------------


def _append_kernel(pages_ref, offs_ref, kpool_ref, vpool_ref, newk_ref,
                   newv_ref, kout_ref, vout_ref):
    """Grid (B,): rewrite slot b's current page with its new row blended in
    (iota-select; dynamic sublane stores need 8-alignment on TPU)."""
    del pages_ref
    b = pl.program_id(0)
    off = offs_ref[b]
    ps, w = kout_ref.shape
    sel = jax.lax.broadcasted_iota(jnp.int32, (ps, w), 0) == off
    kout_ref[...] = jnp.where(sel, jnp.broadcast_to(newk_ref[...], (ps, w)),
                              kpool_ref[...])
    vout_ref[...] = jnp.where(sel, jnp.broadcast_to(newv_ref[...], (ps, w)),
                              vpool_ref[...])


def _kv_append_tpu(k_pool, v_pool, new_k, new_v, pages, offsets,
                   interpret: bool = False):
    n_pages, ps, w = k_pool.shape
    b = new_k.shape[0]
    # rows get a unit sublane dim: a squeezed second-minor block dim is not
    # lowerable, and the [1, w] value broadcasts cleanly to the page
    new_k = new_k[:, None, :]
    new_v = new_v[:, None, :]
    pool_spec = pl.BlockSpec((None, ps, w), lambda b, pages, offs: (pages[b], 0, 0))
    new_spec = pl.BlockSpec((None, 1, w), lambda b, pages, offs: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pool_spec, pool_spec, new_spec, new_spec],
        out_specs=[pool_spec, pool_spec],
    )
    return pl.pallas_call(
        _append_kernel,
        out_shape=[jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
                   jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype)],
        grid_spec=grid_spec,
        input_output_aliases={2: 0, 3: 1},  # indices count prefetch scalars
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pages, offsets, k_pool, v_pool, new_k, new_v)


def _kv_append_xla(k_pool, v_pool, new_k, new_v, pages, offsets):
    k_pool = k_pool.at[pages, offsets, :].set(new_k.astype(k_pool.dtype))
    v_pool = v_pool.at[pages, offsets, :].set(new_v.astype(v_pool.dtype))
    return k_pool, v_pool


def kv_append(k_pool, v_pool, new_k, new_v, pages, offsets):
    """Write each slot's packed new row. new_k/new_v: [B, Hkv*LANE];
    pages/offsets: int32 [B] (absolute page id, row within page)."""
    if jax.default_backend() == "tpu":
        return _kv_append_tpu(k_pool, v_pool,
                              new_k.astype(k_pool.dtype),
                              new_v.astype(v_pool.dtype),
                              pages.astype(jnp.int32),
                              offsets.astype(jnp.int32))
    return _kv_append_xla(k_pool, v_pool, new_k, new_v, pages, offsets)


# ---------------------------------------------------------------------------
# all-heads paged flash decode attention
# ---------------------------------------------------------------------------


def _decode_kernel(lengths_ref, base_pages_ref, qd_ref, kpool_hbm, vpool_hbm,
                   o_ref, m_ref, l_ref, kbuf, vbuf, sems, *,
                   page_size: int, ppcb: int, pages_per_slot: int,
                   num_heads: int, kv_heads: int):
    """Grid (B,): flash attention over slot b's contiguous pages, all heads.

    qd_ref: [W, H] block-diagonal Q (pre-scaled, f32->bf16 by caller),
    W = Hkv * head_stride. kbuf/vbuf: VMEM [2, ppcb, page_size, W] double
    buffers. o_ref: [H, W] NORMALIZED accumulator — each head's context is
    its diagonal head-block, extracted by the caller in XLA (an unaligned
    in-kernel lane slice would force padding, doubling HBM traffic);
    m_ref/l_ref: [H, 1] f32 flash stats.
    """
    b = pl.program_id(0)
    length = lengths_ref[b]
    base = base_pages_ref[b]
    w = kbuf.shape[-1]
    bk = ppcb * page_size
    n_blocks = pl.cdiv(length, bk)
    groups = num_heads // kv_heads

    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    o_ref[...] = jnp.zeros_like(o_ref)

    def copy_block(i, slot):
        start = base + i * ppcb
        k_copy = pltpu.make_async_copy(
            kpool_hbm.at[pl.ds(start, ppcb)], kbuf.at[slot], sems.at[slot, 0])
        v_copy = pltpu.make_async_copy(
            vpool_hbm.at[pl.ds(start, ppcb)], vbuf.at[slot], sems.at[slot, 1])
        k_copy.start()
        v_copy.start()

    def wait_block(slot):
        pltpu.make_async_copy(kpool_hbm.at[pl.ds(0, ppcb)], kbuf.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(vpool_hbm.at[pl.ds(0, ppcb)], vbuf.at[slot],
                              sems.at[slot, 1]).wait()

    @pl.when(n_blocks > 0)
    def _():
        copy_block(0, 0)

        def body(i, carry):
            acc, m, l = carry  # [H, W] f32, [H, 1], [H, 1]
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                copy_block(i + 1, 1 - slot)

            wait_block(slot)
            qd = qd_ref[...]  # [W, H]
            block_m = jnp.full((num_heads, 1), -jnp.inf, jnp.float32)
            block_scores = []
            for p in range(ppcb):
                k_page = kbuf[slot, p]  # [ps, W]
                s = jax.lax.dot(
                    k_page, qd,
                    preferred_element_type=jnp.float32)  # [ps, H]
                row = (i * ppcb + p) * page_size + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0)
                s = jnp.where(row < length, s, -jnp.inf)
                block_scores.append(s)
                block_m = jnp.maximum(block_m, jnp.max(s, axis=0)[:, None])

            m_new = jnp.maximum(m, block_m)  # [H, 1]
            alpha = jnp.exp(m - m_new)  # [H, 1]
            acc = acc * alpha
            l = l * alpha
            for p in range(ppcb):
                pexp = jnp.exp(block_scores[p] - m_new.T)  # [ps, H]
                l = l + jnp.sum(pexp, axis=0)[:, None]
                v_page = vbuf[slot, p]  # [ps, W]
                acc = acc + jax.lax.dot(
                    pexp.T.astype(v_page.dtype), v_page,
                    preferred_element_type=jnp.float32)  # [H, W]
            return acc, m_new, l

        acc0 = jnp.zeros((num_heads, w), jnp.float32)
        m0 = jnp.full((num_heads, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((num_heads, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
        o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        m_ref[...] = m
        l_ref[...] = l


def _decode_tpu(q_diag, k_pool, v_pool, lengths, base_pages, *,
                page_size: int, ppcb: int, pages_per_slot: int,
                num_heads: int, kv_heads: int, interpret: bool = False):
    b = lengths.shape[0]
    w = k_pool.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths, base_pages
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, w, num_heads), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((None, num_heads, w), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((None, num_heads, 1), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((None, num_heads, 1), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppcb, page_size, w), k_pool.dtype),
            pltpu.VMEM((2, ppcb, page_size, w), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, page_size=page_size, ppcb=ppcb,
        pages_per_slot=pages_per_slot, num_heads=num_heads,
        kv_heads=kv_heads)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, num_heads, w), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, base_pages, q_diag, k_pool, v_pool)


def _decode_xla(q, k_pool, v_pool, lengths, base_pages, *, page_size: int,
                pages_per_slot: int, kv_heads: int, head_dim: int):
    """Dense reference (CPU tests): gather each slot's pages, masked flash."""
    b, h, d = q.shape
    hs = head_stride(head_dim, kv_heads)
    cap = pages_per_slot * page_size
    page_ids = base_pages[:, None] + jnp.arange(pages_per_slot)[None, :]
    k = k_pool[page_ids]  # [B, pps, ps, Hkv*hs]
    v = v_pool[page_ids]
    k = k.reshape(b, cap, kv_heads, hs)[..., :d]
    v = v.reshape(b, cap, kv_heads, hs)[..., :d]
    groups = h // kv_heads
    k = jnp.repeat(k, groups, axis=2).astype(jnp.float32)
    v = jnp.repeat(v, groups, axis=2).astype(jnp.float32)
    scores = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), k)
    valid = jnp.arange(cap)[None, None, :] < lengths[:, None, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)
    exp = jnp.where(valid, jnp.exp(scores - m[..., None]), 0.0)
    l = exp.sum(axis=-1)
    probs = exp / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.einsum("bht,bthd->bhd", probs, v)
    return out, m, l


def build_q_diag(q, kv_heads: int, head_dim: int):
    """[B, H, D] pre-scaled q -> block-diagonal [B, Hkv*LANE, H] (bf16).

    Row ``hkv*stride + d`` has ``q[b, h, d]`` in column ``h`` iff head h
    maps to kv head hkv (GQA mapping h // groups == hkv), else 0 — so
    ``k_page @ q_diag`` computes every head's scores in one matmul.
    """
    b, h, d = q.shape
    hs = head_stride(head_dim, kv_heads)
    groups = h // kv_heads
    mapping = (jnp.arange(h) // groups)[:, None] == jnp.arange(kv_heads)[None]
    # [B, H, D] x [H, Hkv] -> [B, Hkv, D, H]
    qd = jnp.einsum("bhd,hg->bgdh", q.astype(jnp.float32),
                    mapping.astype(jnp.float32))
    if d < hs:
        qd = jnp.pad(qd, [(0, 0), (0, 0), (0, hs - d), (0, 0)])
    return qd.reshape(b, kv_heads * hs, h).astype(jnp.bfloat16)


def paged_attention_stats(q, k_pool, v_pool, lengths, base_pages, *,
                          page_size: int, pages_per_slot: int, kv_heads: int,
                          head_dim: int, ppcb: int = 4,
                          interpret: bool = False):
    """All-heads paged flash decode. q: [B, H, D] PRE-SCALED; pools:
    [n_pages, page_size, Hkv*LANE]; lengths/base_pages: int32 [B].
    Returns (o [B, H, D], m [B, H], l [B, H])."""
    b, h, d = q.shape
    lengths = lengths.astype(jnp.int32)
    base_pages = base_pages.astype(jnp.int32)
    if jax.default_backend() == "tpu" or interpret:
        ppcb = int(np.gcd(ppcb, pages_per_slot))
        qd = build_q_diag(q, kv_heads, d)
        acc, m, l = _decode_tpu(
            qd, k_pool, v_pool, lengths, base_pages, page_size=page_size,
            ppcb=ppcb, pages_per_slot=pages_per_slot, num_heads=h,
            kv_heads=kv_heads, interpret=interpret)
        # each head's context is its kv head's diagonal block of the
        # normalized accumulator (extracted here — cheap in XLA, expensive
        # as an unaligned lane slice in the kernel)
        hs = head_stride(d, kv_heads)
        groups = h // kv_heads
        mapping = ((jnp.arange(h) // groups)[:, None]
                   == jnp.arange(kv_heads)[None]).astype(acc.dtype)
        o = jnp.einsum("bhgd,hg->bhd",
                       acc.reshape(b, h, kv_heads, hs), mapping)
        return o[..., :d], m[..., 0], l[..., 0]
    o, m, l = _decode_xla(q, k_pool, v_pool, lengths, base_pages,
                          page_size=page_size, pages_per_slot=pages_per_slot,
                          kv_heads=kv_heads, head_dim=d)
    return o, m, l
