"""All-heads paged flash-decode kernels (continuous batching v2/v3).

The jax-shipped ``paged_attention`` kernel runs one grid cell per
(slot, kv_head): at 32 slots x 16 heads x 12 layers that is 6144 sequential
cells per decoded event on the single v5e core, and each cell's page DMAs
move only head_dim-wide rows. Measured, that cell overhead (~0.25 ms/layer)
dominated the batcher's short-length steps.

Two kernel variants share the same math and layout (dispatch via
``paged_attention_stats(..., streaming=...)``):

- ``_decode_kernel_cell`` — grid ``(B,)``, one cell per slot. Best for
  UNIFORM long lengths (aligned batched generation): flash state stays in
  registers and there is no work-list indirection.
- ``_decode_kernel_stream`` — ONE cell streaming a flat slot-major
  (slot, block) work list through a single double-buffered DMA chain, so
  the HBM stream never stops at slot boundaries. Best for RAGGED/short
  lengths (the continuous batcher): the per-cell variant restarts its
  pipeline B x layers times per event (~1.5 ms fixed at 12 x 32), the
  streaming one once. Measured +30% at 128 slots steady state.

The shared design:

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

**int8 pools** (``PagedPools.quantized``): decode attention is HBM-bound on
cache reads, so int8 page storage halves the dominant traffic (and doubles
serving cache capacity). Values are quantized per-token-per-head (symmetric
absmax); k and v scales share ONE bf16 pool ``[n_pages, page_size, LANE]``
(lanes [0:Hkv] = k, [Hkv:2Hkv] = v — Mosaic requires lane-aligned DMA
slices, so the scales must occupy a full 128-lane row; one combined pool
keeps that overhead to a single extra DMA, ~12% of the bf16 page it
replaces). Dequantization folds into the flash math where it is FREE on the
lane axis: scores are ``(k_int8 @ q_diag) * k_scale[t, kv(h)]`` and the v
contribution uses ``pexp * v_scale[t, kv(h)]`` — both [ps, H]-shaped
elementwise multiplies produced by one tiny lane-routing matmul
``scale_page [ps, LANE] @ E [LANE, H]`` (which also implements the GQA
head mapping), never a [ps, Hkv*LANE] dequantized materialization — only
the int8->bf16 convert touches the wide axis, ~2 VPU passes per page vs
the DMA it saves.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

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


class PagedPools(NamedTuple):
    """Event-KV paged pools: ``k, v: [n_pages, page_size, Hkv*stride]``
    (bf16/f32, or int8 when quantized, with per-token-per-head bf16 scales
    packed into ``scales: [n_pages, page_size, LANE]`` — lanes [0:Hkv] are
    k scales, [Hkv:2Hkv] v scales)."""

    k: jax.Array
    v: jax.Array
    scales: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.scales is not None

    @property
    def page_size(self) -> int:
        return self.k.shape[1]


def alloc_pools(kv_heads: int, n_pages: int, page_size: int, head_dim: int,
                dtype, quantized: bool = False, shards: int = 1) -> PagedPools:
    """Zeroed pools; ``quantized`` selects int8 storage + a bf16 scale pool.

    ``shards``: lane-shard count when the pool will be split over a model
    axis (tensor-parallel serving).  The per-head stride must then be the
    stride each shard computes from its LOCAL head count — global and local
    strides agree for the real configs (16 heads x 64 dims packs dense at
    any split), but diverge when a shard's ``Hkv_local * head_dim`` is not
    lane-aligned (head_stride pads per shard)."""
    hkv_local = kv_heads // shards
    shape = (n_pages, page_size,
             shards * hkv_local * head_stride(head_dim, hkv_local))
    if quantized:
        assert 2 * hkv_local <= LANE, "k+v scales must fit one 128-lane row"
        # one full 128-lane scale row PER SHARD: the lane axis then splits
        # over the model axis into exactly the single-chip local layout
        # (lanes [0:Hkv_local] k, [Hkv_local:2*Hkv_local] v), which is what
        # every shard_map'd kernel/splice sees — int8 composes with tensor
        # parallelism because per-token-per-head absmax quantization is
        # head-independent (bit-identical values under any head split)
        return PagedPools(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            scales=jnp.zeros((n_pages, page_size, shards * LANE),
                             jnp.bfloat16))
    return PagedPools(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def pack_heads(x, kv_heads: int, head_dim: int):
    """[..., Hkv, D] -> [..., Hkv*stride] (flat packed row)."""
    hs = head_stride(head_dim, kv_heads)
    if head_dim < hs:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, hs - head_dim)]
        x = jnp.pad(x, pad)
    return x.reshape(*x.shape[:-2], kv_heads * hs)


def quantize_packed(x, kv_heads: int, head_dim: int):
    """[..., Hkv, D] -> (packed int8 [..., Hkv*stride], scales [..., Hkv]).

    Symmetric per-token-per-head absmax; scales are cast to bf16 — the SAME
    values the pool stores — so dequantization is bit-identical between
    quantize-then-store and store-then-read paths.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = (absmax / 127.0 + 1e-12).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(xf / scale[..., None].astype(jnp.float32)),
                 -127, 127).astype(jnp.int8)
    return pack_heads(q, kv_heads, head_dim), scale


def combine_scales(k_scale, v_scale, kv_heads: int):
    """k/v scales [..., Hkv] -> one lane-aligned row [..., LANE] bf16
    (lanes [0:Hkv] k, [Hkv:2Hkv] v, rest zero)."""
    pad = LANE - 2 * kv_heads
    return jnp.concatenate(
        [k_scale.astype(jnp.bfloat16), v_scale.astype(jnp.bfloat16),
         jnp.zeros((*k_scale.shape[:-1], pad), jnp.bfloat16)], axis=-1)


def split_scales(scales, kv_heads: int):
    """Inverse of combine_scales: [..., LANE] -> (k [..., Hkv], v [..., Hkv])."""
    return scales[..., :kv_heads], scales[..., kv_heads:2 * kv_heads]


# ---------------------------------------------------------------------------
# kv append (one flat row per slot)
# ---------------------------------------------------------------------------


RMW_ROWS = 8  # sublane granularity Mosaic accepts for page-slice DMAs


def kv_append(pools: PagedPools, new_k, new_v, pages, offsets,
              new_scales=None) -> PagedPools:
    """XLA row write: each slot's packed new row into its pool page.

    new_k/new_v: [B, Hkv*stride] in the pool dtype (int8 when quantized,
    with new_scales [B, LANE] combined scale rows); pages/offsets: int32 [B].

    This is the CPU/reference path — on TPU the decode kernel appends
    IN-KERNEL (see _decode_kernel): each attention grid cell read-modify-
    writes the 8-row tile around its slot's write position while it streams
    cache blocks. The round-1 standalone append kernel blended one row into
    a whole aliased page per cell, moving 98 MB through the BlockSpec
    pipeline per decoded event (measured 0.39 ms); the fused RMW moves
    ~6 MB and zero extra kernel dispatches.
    """
    pages = pages.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)
    bufs = [pools.k, pools.v]
    news = [new_k.astype(pools.k.dtype), new_v.astype(pools.v.dtype)]
    if pools.quantized:
        bufs.append(pools.scales)
        news.append(new_scales.astype(jnp.bfloat16))
    out = [buf.at[pages, offsets, :].set(x) for buf, x in zip(bufs, news)]
    if pools.quantized:
        return PagedPools(k=out[0], v=out[1], scales=out[2])
    return PagedPools(k=out[0], v=out[1])


# ---------------------------------------------------------------------------
# all-heads paged flash decode attention
# ---------------------------------------------------------------------------


def _decode_kernel_cell(*args, page_size: int, ppcb: int, pages_per_slot: int,
                   num_heads: int, kv_heads: int, quantized: bool,
                   append: bool):
    """Grid (B,): flash attention over slot b's contiguous pages, all heads.

    qd_ref: [W, H] block-diagonal Q (pre-scaled, f32->bf16 by caller),
    W = Hkv * head_stride. kbuf/vbuf: VMEM [2, ppcb, page_size, W] double
    buffers (+ [2, ppcb, page_size, LANE] bf16 combined-scale buffers when
    quantized). o_ref: [H, W] NORMALIZED accumulator — each head's context
    is its diagonal head-block, extracted by the caller in XLA (an unaligned
    in-kernel lane slice would force padding, doubling HBM traffic);
    m_ref/l_ref: [H, 1] f32 flash stats.

    With ``append``, the cell also writes its slot's fresh KV row (computed
    by the caller, NOT part of this event's attention — lengths stop before
    it) into the pool: the 8-row tile around the write position is DMA'd
    in at cell start (overlapped with the attention block stream), the new
    row is blended in by a sublane select, and the tile is DMA'd back —
    ~16 KB per cell, fused into a kernel that is already running.
    """
    n_pools = 3 if quantized else 2
    n_scalars = 4 if append else 2
    scalars, rest = args[:n_scalars], args[n_scalars:]
    lengths_ref, base_pages_ref = scalars[0], scalars[1]
    qd_ref = rest[0]
    pools_in = rest[1:1 + n_pools]
    news = rest[1 + n_pools:1 + n_pools + (n_pools if append else 0)]
    outs = rest[1 + n_pools + len(news):]
    o_ref, m_ref, l_ref = outs[0], outs[1], outs[2]
    pools_out = outs[3:3 + (n_pools if append else 0)]
    scratch = outs[3 + len(pools_out):]
    bufs = scratch[:n_pools]
    kbuf, vbuf = bufs[0], bufs[1]
    sbuf = bufs[2] if quantized else None
    sems = scratch[n_pools]
    wbufs = scratch[n_pools + 1:n_pools + 1 + len(news)]
    wsem = scratch[-1] if append else None

    b = pl.program_id(0)
    length = lengths_ref[b]
    base = base_pages_ref[b]
    w = kbuf.shape[-1]
    bk = ppcb * page_size
    n_blocks = pl.cdiv(length, bk)
    groups = num_heads // kv_heads

    if append:
        wp = scalars[2][b]
        wo = scalars[3][b]
        wbase = pl.multiple_of((wo // RMW_ROWS) * RMW_ROWS, RMW_ROWS)

        def rmw(j, direction):
            tile = pools_out[j].at[wp, pl.ds(wbase, RMW_ROWS)]
            if direction == "in":
                return pltpu.make_async_copy(tile, wbufs[j], wsem.at[j])
            return pltpu.make_async_copy(wbufs[j], tile, wsem.at[j])

        for j in range(len(news)):  # overlap with the attention stream
            rmw(j, "in").start()

    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    o_ref[...] = jnp.zeros_like(o_ref)

    # The tail block is DMA'd at EXACT page granularity: only
    # ``ceil(len/page) - i*ppcb`` of its pages hold live rows (static-size
    # variants via pl.when — dynamic-size DMAs don't exist; the wait
    # recomputes the size so the semaphore byte counts match).
    n_live_pages = pl.cdiv(length, page_size)

    def blk_pages(i):
        return jnp.clip(n_live_pages - i * ppcb, 1, ppcb)

    def copy_block(i, slot):
        start = base + i * ppcb
        kp = blk_pages(i)
        for k in range(1, ppcb + 1):
            @pl.when(kp == k)
            def _(k=k):
                for j, (src, dst) in enumerate(zip(pools_in, bufs)):
                    pltpu.make_async_copy(src.at[pl.ds(start, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).start()

    def wait_block(i, slot):
        kp = blk_pages(i)
        for k in range(1, ppcb + 1):
            @pl.when(kp == k)
            def _(k=k):
                for j, (src, dst) in enumerate(zip(pools_in, bufs)):
                    pltpu.make_async_copy(src.at[pl.ds(0, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).wait()

    def scale_router(offset):
        # [LANE, H] 0/1 matrix: scale_page @ E -> [ps, H] per-query-head
        # scales; lane ``offset + kv(h)`` routes to column h (one MXU matmul
        # does both the lane extraction and the GQA head mapping)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 0)
        head_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 1)
        return (lane_i == offset + head_i // groups).astype(jnp.bfloat16)

    @pl.when(n_blocks > 0)
    def _():
        copy_block(0, 0)

        # 3-deep rotation: 2 copies in flight while a block computes (hides
        # the per-block issue+wait latency; see the streaming kernel)
        @pl.when(n_blocks > 1)
        def _():
            copy_block(1, 1)

        def body(i, carry):
            acc, m, l = carry  # [H, W] f32, [H, 1], [H, 1]
            slot = jax.lax.rem(i, 3)

            @pl.when(i + 2 < n_blocks)
            def _():
                copy_block(i + 2, jax.lax.rem(i + 2, 3))

            wait_block(i, slot)
            qd = qd_ref[...]  # [W, H]
            block_m = jnp.full((num_heads, 1), -jnp.inf, jnp.float32)
            block_scores = []
            for p in range(ppcb):
                k_page = kbuf[slot, p]  # [ps, W]
                if quantized:
                    k_page = k_page.astype(jnp.bfloat16)  # int8 exact
                s = jax.lax.dot(
                    k_page, qd,
                    preferred_element_type=jnp.float32)  # [ps, H]
                if quantized:
                    ks = jax.lax.dot(sbuf[slot, p], scale_router(0),
                                     preferred_element_type=jnp.float32)
                    s = s * ks
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
                # pages the tail DMA skipped hold garbage (NaN in interpret
                # mode); pexp there is 0 but 0*NaN = NaN in the AV
                # contraction — zero both factors on dead rows
                rowp = (i * ppcb + p) * page_size + jax.lax.broadcasted_iota(
                    jnp.int32, (page_size, 1), 0)
                v_page = vbuf[slot, p]  # [ps, W]
                v_page = jnp.where(rowp < length, v_page,
                                   jnp.zeros_like(v_page))
                if quantized:
                    # fold the v scale into the attention weights: only each
                    # head's own kv-head block of the [H, W] accumulator is
                    # ever read, so pexp * v_scale[t, kv(h)] dequantizes it
                    # (vs is garbage on dead rows — re-mask)
                    vs = jax.lax.dot(sbuf[slot, p], scale_router(kv_heads),
                                     preferred_element_type=jnp.float32)
                    pexp = jnp.where(rowp < length, pexp * vs, 0.0)
                    v_page = v_page.astype(jnp.bfloat16)
                acc = acc + jax.lax.dot(
                    pexp.astype(v_page.dtype), v_page,
                    preferred_element_type=jnp.float32,
                    dimension_numbers=(((0,), (0,)), ((), ())))  # [H, W]
            return acc, m_new, l

        acc0 = jnp.zeros((num_heads, w), jnp.float32)
        m0 = jnp.full((num_heads, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((num_heads, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
        o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        m_ref[...] = m
        l_ref[...] = l

    if append:
        # blend the fresh row into its 8-row tile and write it back (all
        # attention reads of this cell have completed by now)
        for j in range(len(news)):
            rmw(j, "in").wait()
            rows, width = wbufs[j].shape
            sel = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) \
                == (wo - wbase)
            wbufs[j][...] = jnp.where(
                sel, jnp.broadcast_to(news[j][...], (rows, width)),
                wbufs[j][...])
            rmw(j, "out").start()
        for j in range(len(news)):
            rmw(j, "out").wait()



def _decode_kernel_stream(*args, page_size: int, ppcb: int, pages_per_slot: int,
                   num_heads: int, kv_heads: int, quantized: bool,
                   append: bool, batch: int):
    """SINGLE-cell streaming flash decode over a flat (slot, block) work
    list, all heads per block.

    A per-slot grid (the v2 design) ran B sequential cells per layer; each
    cell stalled on its first block DMA, and at 12 layers x 32 slots those
    ~384 pipeline restarts per event dominated short-cache steps (~1.5 ms
    fixed). Here ONE cell streams every slot's blocks through one
    double-buffered DMA chain — block i+1's copy (possibly another slot's)
    is issued before block i is consumed, so the HBM stream never stops at
    slot boundaries.

    The caller prefetches ``slot_tbl/blk_tbl`` (flat work list, slot-major)
    and ``total`` (its live length). Flash state for ALL slots lives in VMEM
    scratch (``accs [B, H, W] f32``, ``ms/ls [B, H, 1]``), loaded/stored per
    block by dynamic leading-dim indexing; outputs are written once at the
    end. qd_ref: [B, W, H] block-diagonal Q (pre-scaled bf16).

    With ``append``, each slot's fresh KV row (NOT part of this event's
    attention — lengths stop before it) is read-modify-written at 8-row-tile
    granularity: all B tile reads are issued up front (overlapped with the
    attention stream), blended and written back at the end.
    """
    n_pools = 3 if quantized else 2
    n_scalars = 7 if append else 5
    scalars, rest = args[:n_scalars], args[n_scalars:]
    lengths_ref, base_pages_ref = scalars[0], scalars[1]
    start_tbl_ref, total_ref = scalars[2], scalars[3]
    pages_tbl_ref = scalars[4]
    qd_ref = rest[0]
    pools_in = rest[1:1 + n_pools]
    news = rest[1 + n_pools:1 + n_pools + (n_pools if append else 0)]
    outs = rest[1 + n_pools + len(news):]
    o_ref, m_ref, l_ref = outs[0], outs[1], outs[2]
    pools_out = outs[3:3 + (n_pools if append else 0)]
    scratch = outs[3 + len(pools_out):]
    bufs = scratch[:n_pools]
    kbuf, vbuf = bufs[0], bufs[1]
    sbuf = bufs[2] if quantized else None
    sems = scratch[n_pools]
    accs_ref, ms_ref, ls_ref = scratch[n_pools + 1:n_pools + 4]
    wbufs = scratch[n_pools + 4:n_pools + 4 + len(news)]
    wsem = scratch[-1] if append else None

    w = kbuf.shape[-1]
    total = total_ref[0]
    groups = num_heads // kv_heads

    if append:
        wp_ref, wo_ref = scalars[5], scalars[6]

        def rmw(s, j, direction):
            wbase = pl.multiple_of(
                (wo_ref[s] // RMW_ROWS) * RMW_ROWS, RMW_ROWS)
            tile = pools_out[j].at[wp_ref[s], pl.ds(wbase, RMW_ROWS)]
            if direction == "in":
                return pltpu.make_async_copy(tile, wbufs[j].at[s],
                                             wsem.at[s, j])
            return pltpu.make_async_copy(wbufs[j].at[s], tile,
                                         wsem.at[s, j])

        def start_rmw_in(s, _):
            for j in range(len(news)):
                rmw(s, j, "in").start()
            return 0

        jax.lax.fori_loop(0, batch, start_rmw_in, 0)

    # init flash state for every slot (skipped/empty slots keep it:
    # o=0, m=-inf, l=0 — same contract as the per-cell kernel)
    accs_ref[...] = jnp.zeros_like(accs_ref)
    ms_ref[...] = jnp.full_like(ms_ref, -jnp.inf)
    ls_ref[...] = jnp.zeros_like(ls_ref)

    # Tail blocks are DMA'd at EXACT page granularity (``pages_tbl``,
    # precomputed by the caller): copying the full ppcb-page block reads
    # masked rows the flash loop immediately discards — at the batcher's
    # ragged short lengths the tail block IS most blocks, so the saving is
    # a large share of all cache traffic.  Static-size variants selected by
    # ``pl.when`` (dynamic-size DMAs don't exist); the wait recomputes the
    # same size so the semaphore byte counts match.
    def copy_block(i, slot):
        start = start_tbl_ref[i]  # precomputed flat page index (one load)
        kp = pages_tbl_ref[i]
        for k in range(1, ppcb + 1):
            @pl.when(kp == k)
            def _(k=k):
                for j, (src, dst) in enumerate(zip(pools_in, bufs)):
                    pltpu.make_async_copy(src.at[pl.ds(start, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).start()

    def wait_block(i, slot):
        kp = pages_tbl_ref[i]
        for k in range(1, ppcb + 1):
            @pl.when(kp == k)
            def _(k=k):
                for j, (src, dst) in enumerate(zip(pools_in, bufs)):
                    pltpu.make_async_copy(src.at[pl.ds(0, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).wait()

    def scale_router(offset):
        # [LANE, H] 0/1 matrix: scale_page @ E -> [ps, H] per-query-head
        # scales; lane ``offset + kv(h)`` routes to column h (one MXU matmul
        # does both the lane extraction and the GQA head mapping)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 0)
        head_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 1)
        return (lane_i == offset + head_i // groups).astype(jnp.bfloat16)

    bk0 = ppcb * page_size

    @pl.when(total > 0)
    def _():
        copy_block(0, 0)

        # 3-deep buffer rotation (2 copies in flight while a block
        # computes — hides the per-block issue+wait latency; measured
        # ~2.24 -> 2.07 us/cache-row on the fused whole-step kernel)
        @pl.when(total > 1)
        def _():
            copy_block(1, 1)

        # slot-outer / block-inner: the flash state stays in REGISTERS for
        # a slot's whole block run (a flat single loop paid an [H, W] f32
        # scratch load+store per block, ~10% of the aligned decode step);
        # the DMA stream stays continuous across slots because blocks are
        # prefetched by FLAT index from the work tables.
        def slot_loop(s, i0):
            length = lengths_ref[s]
            n_b = (length + bk0 - 1) // bk0
            qd = qd_ref[s]  # [W, H]

            def blk_loop(j, carry):
                acc, m, l = carry
                i = i0 + j
                slot = jax.lax.rem(i, 3)

                @pl.when(i + 2 < total)
                def _():
                    copy_block(i + 2, jax.lax.rem(i + 2, 3))

                wait_block(i, slot)
                # whole block as ONE [bk, W] operand (the [ppcb, ps, W]
                # buffer collapses row-major, relayout-free)
                k_blk = kbuf[slot].reshape(bk0, w)
                if quantized:
                    k_blk = k_blk.astype(jnp.bfloat16)  # int8 exact
                sc = jax.lax.dot(
                    k_blk, qd, preferred_element_type=jnp.float32)  # [bk, H]
                if quantized:
                    s_blk = sbuf[slot].reshape(bk0, LANE)
                    ks = jax.lax.dot(s_blk, scale_router(0),
                                     preferred_element_type=jnp.float32)
                    sc = sc * ks
                row = j * bk0 + jax.lax.broadcasted_iota(
                    jnp.int32, sc.shape, 0)
                sc = jnp.where(row < length, sc, -jnp.inf)
                block_m = jnp.max(sc, axis=0)[:, None]  # [H, 1]

                m_new = jnp.maximum(m, block_m)  # [H, 1]
                alpha = jnp.exp(m - m_new)  # [H, 1]
                acc = acc * alpha
                l = l * alpha
                pexp = jnp.exp(sc - m_new.T)  # [bk, H]
                l = l + jnp.sum(pexp, axis=0)[:, None]
                # rows in pages the tail DMA skipped hold garbage (NaN in
                # interpret mode); pexp there is 0 but 0*NaN = NaN in the
                # AV contraction — zero both factors on dead rows
                pexp = jnp.where(row < length, pexp, 0.0)
                v_blk = vbuf[slot].reshape(bk0, w)
                v_blk = jnp.where(row[:, :1] < length, v_blk,
                                  jnp.zeros_like(v_blk))
                if quantized:
                    # fold the v scale into the attention weights: only
                    # each head's own kv-head block of the [H, W]
                    # accumulator is ever read, so pexp * v_scale[t, kv(h)]
                    # dequantizes it (vs is garbage on dead rows — re-mask)
                    vs = jax.lax.dot(s_blk, scale_router(kv_heads),
                                     preferred_element_type=jnp.float32)
                    pexp = jnp.where(row < length, pexp * vs, 0.0)
                    v_blk = v_blk.astype(jnp.bfloat16)
                acc = acc + jax.lax.dot(
                    pexp.astype(v_blk.dtype), v_blk,
                    preferred_element_type=jnp.float32,
                    dimension_numbers=(((0,), (0,)), ((), ())))  # [H, W]
                return acc, m_new, l

            init = (jnp.zeros((num_heads, w), jnp.float32),
                    jnp.full((num_heads, 1), -jnp.inf, jnp.float32),
                    jnp.zeros((num_heads, 1), jnp.float32))
            acc, m, l = jax.lax.fori_loop(0, n_b, blk_loop, init)

            @pl.when(n_b > 0)
            def _():
                accs_ref[s] = acc
                ms_ref[s] = m
                ls_ref[s] = l

            return i0 + n_b

        jax.lax.fori_loop(0, batch, slot_loop, 0)

    o_ref[...] = (accs_ref[...]
                  / jnp.maximum(ls_ref[...], 1e-30)).astype(o_ref.dtype)
    m_ref[...] = ms_ref[...]
    l_ref[...] = ls_ref[...]

    if append:
        # blend each slot's fresh row into its 8-row tile and write back
        # (all attention reads have completed by now)
        def finish_rmw(s, _):
            rows = RMW_ROWS
            wbase = (wo_ref[s] // RMW_ROWS) * RMW_ROWS
            for j in range(len(news)):
                rmw(s, j, "in").wait()
                width = wbufs[j].shape[-1]
                sel = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) \
                    == (wo_ref[s] - wbase)
                wbufs[j][s] = jnp.where(
                    sel, jnp.broadcast_to(news[j][s], (rows, width)),
                    wbufs[j][s])
                rmw(s, j, "out").start()
            return 0

        def wait_rmw_out(s, _):
            for j in range(len(news)):
                rmw(s, j, "out").wait()
            return 0

        jax.lax.fori_loop(0, batch, finish_rmw, 0)
        jax.lax.fori_loop(0, batch, wait_rmw_out, 0)


def _decode_tpu_cell(q_diag, pools: PagedPools, lengths, base_pages, write=None, *,
                page_size: int, ppcb: int, pages_per_slot: int,
                num_heads: int, kv_heads: int, interpret: bool = False):
    """write = (new_k [B, w], new_v [B, w], new_scales [B, LANE] | None,
    write_pages [B], write_offs [B]) appends each slot's fresh row in-kernel
    and returns updated pools after (o, m, l)."""
    b = lengths.shape[0]
    w = pools.k.shape[-1]
    quantized = pools.quantized
    n_pools = 3 if quantized else 2
    append = write is not None
    pool_arrays = [pools.k, pools.v] + ([pools.scales] if quantized else [])

    hbm_in = [pl.BlockSpec(memory_space=pl.ANY)] * n_pools
    news, new_specs = [], []
    scalars = [lengths, base_pages]
    out_shape = [
        jax.ShapeDtypeStruct((b, num_heads, w), jnp.float32),
        jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((None, num_heads, w), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((None, num_heads, 1), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((None, num_heads, 1), lambda b, *_: (b, 0, 0)),
    ]
    aliases = {}
    scratch = [  # 3-deep rotation: 2 block copies in flight during compute
        pltpu.VMEM((3, ppcb, page_size, w), pools.k.dtype),
        pltpu.VMEM((3, ppcb, page_size, w), pools.v.dtype),
    ]
    if quantized:
        scratch.append(pltpu.VMEM((3, ppcb, page_size, LANE), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((3, n_pools)))
    if append:
        new_k, new_v, new_s, wpages, woffs = write
        scalars += [wpages.astype(jnp.int32), woffs.astype(jnp.int32)]
        news = [new_k.astype(pools.k.dtype)[:, None, :],
                new_v.astype(pools.v.dtype)[:, None, :]]
        if quantized:
            news.append(new_s.astype(jnp.bfloat16)[:, None, :])
        new_specs = [
            pl.BlockSpec((None, 1, x.shape[-1]), lambda b, *_: (b, 0, 0))
            for x in news
        ]
        out_shape += [jax.ShapeDtypeStruct(p.shape, p.dtype)
                      for p in pool_arrays]
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_pools
        # pool input i (after len(scalars) prefetch args + qd) -> output 3+i
        aliases = {len(scalars) + 1 + i: 3 + i for i in range(n_pools)}
        for x in news:
            scratch.append(pltpu.VMEM((RMW_ROWS, x.shape[-1]), x.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((n_pools,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(b,),
        in_specs=[pl.BlockSpec((None, w, num_heads), lambda b, *_: (b, 0, 0))]
        + hbm_in + new_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_cell, page_size=page_size, ppcb=ppcb,
        pages_per_slot=pages_per_slot, num_heads=num_heads,
        kv_heads=kv_heads, quantized=quantized, append=append)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*scalars, q_diag, *pool_arrays, *news)
    if not append:
        return out
    o, m, l = out[:3]
    new_pools = PagedPools(k=out[3], v=out[4],
                           scales=out[5] if quantized else None)
    return o, m, l, new_pools




def _decode_tpu_stream(q_diag, pools: PagedPools, lengths, base_pages, write=None, *,
                page_size: int, ppcb: int, pages_per_slot: int,
                num_heads: int, kv_heads: int, interpret: bool = False):
    """write = (new_k [B, w], new_v [B, w], new_scales [B, LANE] | None,
    write_pages [B], write_offs [B]) appends each slot's fresh row in-kernel
    and returns updated pools after (o, m, l).

    Builds the flat slot-major (slot, block) work list the streaming kernel
    consumes: entry i covers block ``blk_tbl[i]`` of slot ``slot_tbl[i]``;
    ``total`` is its live length (empty slots contribute nothing).
    """
    b = lengths.shape[0]
    w = pools.k.shape[-1]
    quantized = pools.quantized
    n_pools = 3 if quantized else 2
    append = write is not None
    pool_arrays = [pools.k, pools.v] + ([pools.scales] if quantized else [])

    bk = ppcb * page_size
    nb = (lengths + bk - 1) // bk  # blocks per slot
    cum = jnp.cumsum(nb)
    total = cum[-1:].astype(jnp.int32)
    max_total = b * max(pages_per_slot // ppcb, 1)
    idx = jnp.arange(max_total, dtype=jnp.int32)
    slot_tbl = jnp.minimum(jnp.searchsorted(cum, idx, side="right"),
                           b - 1).astype(jnp.int32)
    blk_tbl = (idx - (cum - nb)[slot_tbl]).astype(jnp.int32)
    # flat start-page table: the kernel's copy issue is ONE SMEM load
    start_tbl = (base_pages[slot_tbl] + blk_tbl * ppcb).astype(jnp.int32)
    # live pages per work item: the tail block copies only what it needs
    pages_tbl = jnp.clip(
        (lengths[slot_tbl] + page_size - 1) // page_size - blk_tbl * ppcb,
        1, ppcb).astype(jnp.int32)

    hbm_in = [pl.BlockSpec(memory_space=pl.ANY)] * n_pools
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    news, new_specs = [], []
    scalars = [lengths, base_pages, start_tbl, total, pages_tbl]
    out_shape = [
        jax.ShapeDtypeStruct((b, num_heads, w), jnp.float32),
        jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, num_heads, 1), jnp.float32),
    ]
    out_specs = [vmem, vmem, vmem]
    aliases = {}
    scratch = [  # 3-deep rotation: 2 block copies in flight during compute
        pltpu.VMEM((3, ppcb, page_size, w), pools.k.dtype),
        pltpu.VMEM((3, ppcb, page_size, w), pools.v.dtype),
    ]
    if quantized:
        scratch.append(pltpu.VMEM((3, ppcb, page_size, LANE), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((3, n_pools)))
    scratch += [
        pltpu.VMEM((b, num_heads, w), jnp.float32),   # accs
        pltpu.VMEM((b, num_heads, 1), jnp.float32),   # ms
        pltpu.VMEM((b, num_heads, 1), jnp.float32),   # ls
    ]
    if append:
        new_k, new_v, new_s, wpages, woffs = write
        scalars += [wpages.astype(jnp.int32), woffs.astype(jnp.int32)]
        news = [new_k.astype(pools.k.dtype)[:, None, :],
                new_v.astype(pools.v.dtype)[:, None, :]]
        if quantized:
            news.append(new_s.astype(jnp.bfloat16)[:, None, :])
        new_specs = [vmem] * n_pools
        out_shape += [jax.ShapeDtypeStruct(p.shape, p.dtype)
                      for p in pool_arrays]
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_pools
        # pool input i (after len(scalars) prefetch args + qd) -> output 3+i
        aliases = {len(scalars) + 1 + i: 3 + i for i in range(n_pools)}
        for x in news:
            scratch.append(pltpu.VMEM((b, RMW_ROWS, x.shape[-1]), x.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((b, n_pools)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(1,),
        in_specs=[vmem] + hbm_in + new_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_stream, page_size=page_size, ppcb=ppcb,
        pages_per_slot=pages_per_slot, num_heads=num_heads,
        kv_heads=kv_heads, quantized=quantized, append=append, batch=b)
    # Scoped vmem is a budget SHARED with neighboring kernels in the same
    # program (the fused token-row kernel), so the limit must stay as tight
    # as the actual demand allows — but it must also scale with batch and
    # model width (a hardcoded MB split compiled only for the geometry it
    # was tuned on).  Demand = VMEM scratch + VMEM-resident inputs/outputs
    # (q_diag, o/m/l, fresh rows), plus ~4 MB for compiler temporaries
    # (reproduces the measured-good 14/28 MB at the tuned tv2o geometries).
    def _nbytes(shape, dtype):
        try:
            return int(np.prod(shape)) * jnp.dtype(dtype).itemsize
        except TypeError:  # semaphore scratch: no data dtype, ~0 bytes
            return 0

    demand = sum(_nbytes(s.shape, s.dtype) for s in scratch
                 if hasattr(s, "shape") and hasattr(s, "dtype"))
    demand += _nbytes(q_diag.shape, q_diag.dtype)
    demand += sum(_nbytes(x.shape, x.dtype) for x in news)
    demand += sum(_nbytes(o.shape, o.dtype) for o in out_shape[:3])
    vmem_limit = max(14 << 20, demand + (4 << 20))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*scalars, q_diag, *pool_arrays, *news)
    if not append:
        return out
    o, m, l = out[:3]
    new_pools = PagedPools(k=out[3], v=out[4],
                           scales=out[5] if quantized else None)
    return o, m, l, new_pools


def _decode_xla(q, pools: PagedPools, lengths, base_pages, *, page_size: int,
                pages_per_slot: int, kv_heads: int, head_dim: int):
    """Dense reference (CPU tests): gather each slot's pages, masked flash."""
    b, h, d = q.shape
    hs = head_stride(head_dim, kv_heads)
    cap = pages_per_slot * page_size
    page_ids = base_pages[:, None] + jnp.arange(pages_per_slot)[None, :]
    k = pools.k[page_ids].astype(jnp.float32)  # [B, pps, ps, Hkv*hs]
    v = pools.v[page_ids].astype(jnp.float32)
    k = k.reshape(b, cap, kv_heads, hs)[..., :d]
    v = v.reshape(b, cap, kv_heads, hs)[..., :d]
    if pools.quantized:
        ks, vs = split_scales(pools.scales[page_ids], kv_heads)
        k = k * ks.reshape(b, cap, kv_heads).astype(jnp.float32)[..., None]
        v = v * vs.reshape(b, cap, kv_heads).astype(jnp.float32)[..., None]
    groups = h // kv_heads
    k = jnp.repeat(k, groups, axis=2)
    v = jnp.repeat(v, groups, axis=2)
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


def paged_attention_stats(q, pools: PagedPools, lengths, base_pages,
                          write=None, *,
                          page_size: int, pages_per_slot: int, kv_heads: int,
                          head_dim: int, ppcb: int = 4,
                          streaming: bool = True,
                          interpret: bool = False):
    """All-heads paged flash decode. q: [B, H, D] PRE-SCALED; pools:
    [n_pages, page_size, Hkv*LANE] (+ scale pools when int8);
    lengths/base_pages: int32 [B]. Returns (o [B, H, D], m [B, H], l [B, H]).

    ``write = (new_k [B, w], new_v [B, w], new_scales [B, LANE] | None,
    write_pages [B], write_offs [B])`` additionally appends each slot's
    fresh packed row (NOT visible to this call's attention — lengths stop
    before it) and appends the updated ``pools`` to the return tuple.
    """
    b, h, d = q.shape
    lengths = lengths.astype(jnp.int32)
    base_pages = base_pages.astype(jnp.int32)
    if jax.default_backend() == "tpu" or interpret:
        ppcb = int(np.gcd(ppcb, pages_per_slot))
        qd = build_q_diag(q, kv_heads, d)
        decode = _decode_tpu_stream if streaming else _decode_tpu_cell
        out = decode(
            qd, pools, lengths, base_pages, write, page_size=page_size,
            ppcb=ppcb, pages_per_slot=pages_per_slot, num_heads=h,
            kv_heads=kv_heads, interpret=interpret)
        acc, m, l = out[:3]
        # each head's context is its kv head's diagonal block of the
        # normalized accumulator (extracted here — cheap in XLA, expensive
        # as an unaligned lane slice in the kernel)
        hs = head_stride(d, kv_heads)
        groups = h // kv_heads
        mapping = ((jnp.arange(h) // groups)[:, None]
                   == jnp.arange(kv_heads)[None]).astype(acc.dtype)
        o = jnp.einsum("bhgd,hg->bhd",
                       acc.reshape(b, h, kv_heads, hs), mapping)
        if write is None:
            return o[..., :d], m[..., 0], l[..., 0]
        return o[..., :d], m[..., 0], l[..., 0], out[3]
    o, m, l = _decode_xla(q, pools, lengths, base_pages,
                          page_size=page_size, pages_per_slot=pages_per_slot,
                          kv_heads=kv_heads, head_dim=d)
    if write is None:
        return o, m, l
    new_k, new_v, new_s, wpages, woffs = write
    return o, m, l, kv_append(pools, new_k, new_v, wpages, woffs,
                              new_scales=new_s)
