"""Pallas fused decode attention over the ring KV cache.

The XLA decode path pays for two materializations per layer per step: a
dynamic-slice copy of the layer's KV cache and the score/softmax tensors —
measured at only ~100-160 GB/s effective HBM bandwidth
(tools/perf_experiments.py).  This kernel reads cache blocks straight from
HBM into VMEM once, runs a flash-style running softmax across key blocks, and
writes only the [B, H·D] output — and it *stops reading* beyond the valid
cache length: trailing key blocks have their index map pinned to the last
valid block, which Mosaic recognizes as "same block as previous iteration"
and skips the DMA, so early decode steps don't stream the whole preallocated
cache.

Shapes are pre-flattened to [..., H·D] outside the kernel (a free XLA
reshape of contiguous dims) because Mosaic cannot shape-cast loaded blocks.
Mosaic also has no batched-dot lowering, so per-head math is expressed as two
single MXU calls:

- scores  = K' [S_BLK, HD] @ Qdiag [HD->H]   (block-diagonal Q, built by iota
  masking, zero entries kill cross-head terms);
- context = pᵀ [H, S_BLK] @ V' [S_BLK, HD], taking each head's diagonal
  block of the [H, HD] result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLK = 256
NEG_INF = -1e30


def _make_kernel(h: int, d: int):
    hd = h * d

    def kernel(li_ref, vl_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        j = pl.program_id(1)
        n_blocks = pl.num_programs(1)
        valid_len = vl_ref[0]

        @pl.when(j == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        block_start = j * S_BLK

        def head_selector(dtype):
            """[H, HD] 0/1 matrix: row c is 1 on head c's lane span.

            Built with integer arithmetic only — boolean vectors with splat
            select branches trip Mosaic's relayout inference."""
            col_head = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 1) // d
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, hd), 0)
            delta = jnp.abs(col_head - row_idx)
            return (1 - jnp.minimum(delta, 1)).astype(dtype)

        @pl.when(block_start < valid_len)
        def _compute():
            scale = d**-0.5
            k_flat = k_ref[0, 0]  # [S_BLK, HD]
            v_flat = v_ref[0, 0]  # [S_BLK, HD]
            q_row = q_ref[0]  # [1, HD]
            sel = head_selector(k_flat.dtype)  # [H, HD]

            # Qdiag^T [H, HD]: row c carries q's head-c slice, zero elsewhere.
            q_diag_t = sel * q_row
            s = jax.lax.dot_general(
                k_flat, q_diag_t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [S_BLK, H]

            spos = block_start + jax.lax.broadcasted_iota(
                jnp.int32, (S_BLK, h), 0)
            s = jnp.where(spos < valid_len, s, NEG_INF)

            m_old = m_scr[:1, :h]  # [1, H]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp(s - m_new)  # [S_BLK, H]
            alpha = jnp.exp(m_old - m_new)  # [1, H]
            l_new = l_scr[:1, :h] * alpha + jnp.sum(p, axis=0, keepdims=True)

            # context for every (head, head') pair in one call; keep diagonals.
            pt = p.T.astype(k_flat.dtype)  # [H, S_BLK]
            pv_all = jax.lax.dot_general(
                pt, v_flat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [H, HD]
            self_f32 = head_selector(jnp.float32)
            pv = jnp.sum(pv_all * self_f32, axis=0, keepdims=True)
            # pv [1, HD]: head hh occupies lanes hh*d..(hh+1)*d

            # per-head alpha broadcast over its lane span, via one tiny matmul
            alpha_wide = jax.lax.dot_general(
                alpha, self_f32, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, HD]
            acc_scr[:1, :] = acc_scr[:1, :] * alpha_wide + pv
            m_scr[:1, :h] = m_new
            l_scr[:1, :h] = l_new

        @pl.when(j == n_blocks - 1)
        def _finalize():
            l_row = l_scr[:1, :h]  # [1, H]
            denom = jax.lax.dot_general(
                l_row, head_selector(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, HD]
            denom = jnp.maximum(denom, 1e-30)
            o_ref[0] = (acc_scr[:1, :] / denom).astype(o_ref.dtype)

    return kernel


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
    hd = h * d

    # free reshapes of contiguous trailing dims (layout unchanged); the
    # inserted singleton axis gives q/out a legal (1, hd) tile per batch row
    q2 = q.reshape(b, 1, hd)
    k2 = cache_k.reshape(l_n, b, s, hd)
    v2 = cache_v.reshape(l_n, b, s, hd)

    def q_map(bi, j, li_ref, vl_ref):
        return (bi, 0, 0)

    def kv_map(bi, j, li_ref, vl_ref):
        # pin out-of-range blocks to the last valid block: Mosaic skips the
        # DMA when the block index repeats
        last_valid_block = (vl_ref[0] - 1) // S_BLK
        return (li_ref[0], bi, jnp.minimum(j, last_valid_block), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, hd), q_map),
            pl.BlockSpec((1, 1, S_BLK, hd), kv_map),
            pl.BlockSpec((1, 1, S_BLK, hd), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), q_map),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),  # running max [0, :H]
            pltpu.VMEM((8, 128), jnp.float32),  # running denom [0, :H]
            pltpu.VMEM((8, hd), jnp.float32),   # output accumulator [0, :]
        ],
    )
    li = jnp.asarray(layer_index, jnp.int32).reshape(1)
    vl = jnp.asarray(valid_len, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _make_kernel(h, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(li, vl, q2, k2, v2)
    return out.reshape(b, h, d)
