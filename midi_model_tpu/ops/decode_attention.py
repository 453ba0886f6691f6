"""Pallas fused decode attention over the ring KV cache.

The XLA decode path pays for two materializations per layer per step: a
dynamic-slice copy of the layer's KV cache and the score/softmax tensors —
measured at only ~100-160 GB/s effective HBM bandwidth (tools/
perf_experiments.py).  This kernel reads the cache blocks straight from HBM
into VMEM once, runs a flash-style running softmax across key blocks, and
writes only the [B, H, D] output — and it *stops reading* beyond the valid
cache length: trailing key blocks have their index-map pinned to the last
valid block, which Mosaic recognizes as "same block as previous iteration"
and skips the DMA, so early decode steps don't stream the whole preallocated
cache.

Layout: q [B, H, D] (one decode token, rope applied), cache [L, B, S, H, D]
(the stacked-layer ring buffer carried through the layer scan), layer index
and valid length as scalar-prefetch operands (they drive the index maps).
Mosaic has no batched-dot lowering, so the per-head [1, D] x [D, S_BLK] dots
are unrolled over heads (16 small MXU calls per block; memory-bound anyway);
flash statistics stay vectorized over heads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLK = 256
NEG_INF = -1e30


def _kernel(li_ref, vl_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
    """Flash accumulation with stats in [1, H] rows (lanes = heads).

    m_scr / l_scr: [8, 128] f32 scratch tiles, row 0 / cols :H significant.
    acc_scr: [H, D] f32 output accumulator.
    """
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    valid_len = vl_ref[0]
    h = q_ref.shape[1]
    d = q_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    block_start = j * S_BLK

    @pl.when(block_start < valid_len)
    def _compute():
        scale = d**-0.5
        hd = h * d
        # Mosaic has no batched-dot lowering; instead compute every head's
        # scores with ONE MXU call against a block-diagonal Q:
        #   K' [S_BLK, H*D] @ Qdiag [H*D, H]  ->  s [S_BLK, H]
        # where Qdiag[(hh,dd), c] = q[hh,dd] iff hh == c.
        k_flat = k_ref[0, 0].reshape(S_BLK, hd)
        q_flat = q_ref[0].reshape(hd, 1)  # all heads as one column
        row_head = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0) // d
        col_head = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
        q_diag = jnp.where(row_head == col_head,
                           jnp.broadcast_to(q_flat, (hd, h)),
                           jnp.zeros((), q_flat.dtype))
        s = jax.lax.dot_general(
            k_flat, q_diag, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [S_BLK, H]

        spos = block_start + jax.lax.broadcasted_iota(jnp.int32, (S_BLK, h), 0)
        s = jnp.where(spos < valid_len, s, NEG_INF)

        m_old = m_scr[:1, :h]  # [1, H]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)  # [S_BLK, H]
        alpha = jnp.exp(m_old - m_new)  # [1, H]
        l_new = l_scr[:1, :h] * alpha + jnp.sum(p, axis=0, keepdims=True)

        # p^T @ V' computes every (head, head') cross term in ONE MXU call;
        # the diagonal blocks are the per-head outputs.
        pt = p.T.astype(k_flat.dtype)  # [H, S_BLK]
        v_flat = v_ref[0, 0].reshape(S_BLK, hd)
        pv_all = jax.lax.dot_general(
            pt, v_flat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [H, H*D]
        pv = jnp.concatenate(
            [pv_all[hh:hh + 1, hh * d:(hh + 1) * d] for hh in range(h)],
            axis=0)  # [H, D]

        acc_scr[:] = acc_scr[:] * alpha.T + pv
        m_scr[:1, :h] = m_new
        l_scr[:1, :h] = l_new

    @pl.when(j == n_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:1, :h], 1e-30)  # [1, H]
        o_ref[0] = (acc_scr[:] / denom.T).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                     layer_index: jax.Array, valid_len: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """q: [B, H, D]; cache_k/v: [L, B, S, H, D]; returns [B, H, D].

    Attends to cache positions [0, valid_len) of layer ``layer_index``.
    """
    l_n, b, s, h, d = cache_k.shape
    if s % S_BLK:
        raise ValueError(
            f"cache length {s} must be a multiple of S_BLK={S_BLK}; "
            "round the allocation up (mask handles the unused tail)")
    n_blocks = s // S_BLK

    def q_map(bi, j, li_ref, vl_ref):
        return (bi, 0, 0)

    def kv_map(bi, j, li_ref, vl_ref):
        # pin out-of-range blocks to the last valid block: Mosaic skips the
        # DMA when the block index repeats
        last_valid_block = (vl_ref[0] - 1) // S_BLK
        return (li_ref[0], bi, jnp.minimum(j, last_valid_block), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, d), q_map),
            pl.BlockSpec((1, 1, S_BLK, h, d), kv_map),
            pl.BlockSpec((1, 1, S_BLK, h, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, h, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),  # running max [1, :H]
            pltpu.VMEM((8, 128), jnp.float32),  # running denom [1, :H]
            pltpu.VMEM((h, d), jnp.float32),    # output accumulator
        ],
    )
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    vl = jnp.asarray(valid_len, jnp.int32).reshape(1)
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(li, vl, q, cache_k, cache_v)
