"""Fused event-net decode step: all layers, one kernel dispatch.

The aligned decode's event-net step (models/llama.py ``decode_paged``) runs
~7 XLA matmul fusions + one Pallas attention kernel per layer, 12 layers per
event.  Measured at bs=32 the pure weight stream alone runs at ~44% of HBM
peak (tools/perf_event_net.py): every op boundary restarts the HBM pipeline,
and XLA cannot prefetch layer ``i+1``'s weights across the ``lax.scan``
iteration boundary while layer ``i`` computes.

This kernel runs the ENTIRE step — rmsnorm, fused qkv, RoPE, paged flash
attention over the KV pools (with the fresh row's self-term merged
analytically and the row appended in-kernel by an 8-row RMW tile), o-proj,
and the SwiGLU MLP — as ONE ``pallas_call`` with ``grid=(num_layers,)``:

- per-layer weights arrive through blocked ``BlockSpec``s indexed by the
  layer grid axis, so Pallas DOUBLE-BUFFERS them: layer ``i+1``'s ~33.5 MB
  (tv2o geometry) streams from HBM while layer ``i`` computes — the weight
  stream never stops at op or layer boundaries;
- the cache pages stream through the same flat slot-major double-buffered
  DMA chain as ``paged_allheads._decode_kernel_stream`` (work tables
  prefetched; per-layer page bases computed in-kernel from ``program_id``);
- the residual stream lives in VMEM scratch across grid steps (bf16, exactly
  the ``decode_paged`` dtype discipline);
- RoPE's rotate-half is ONE MXU matmul with a per-head ±1 permutation
  matrix (a lane shuffle expressed the TPU-native way);
- attention scores avoid the block-diagonal q operand (built in XLA for the
  standalone kernel, unbuildable in-kernel without a transpose): with one
  query row per slot, ``scores = (k_blk ⊙ q_row) @ G`` where ``G[w, h] = 1``
  iff lane ``w`` belongs to head ``h`` — the f32 products are bit-identical
  to the standalone kernel's ``k_blk @ q_diag`` (same factors, same
  contraction positions).

Numerics mirror ``decode_paged`` step for step (bf16 matmul results, f32
norm/rope/softmax/merge); parity is asserted against it in
``tests/test_fused_step.py`` (interpret mode).

Restrictions (the shipped model family satisfies all): MHA only
(``kv_heads == num_heads``), ``head_stride == head_dim`` (lane-aligned
packed pages), bf16 weights and pools (int8 pools keep the split path).

Reference capability: the torch generate loop's per-layer module calls
(/root/reference/midi_model.py:99-135) — re-architected as a single
resident-pipeline kernel, which a CUDA/torch translation could not express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paged_allheads import RMW_ROWS, PagedPools, head_stride

LANE = 128

# Slack added to the computed weight/scratch demand in the kernel's explicit
# vmem limit, for Mosaic compiler temporaries.  The explicit limit is
# RESERVED against the program's shared scoped-VMEM pool even while the
# co-compiled token-row kernel runs, so it must stay tight: 16 MB starves
# the token-row kernel by 2.23 MB at bs=32; 8 MB fits both with margin
# (measured on the live compiler via tools/probe_vmem.py).
_SLACK_BYTES = 8 << 20


def _mm(a, b):
    """bf16 matmul, f32 MXU accumulate, result in the input dtype (the XLA
    ``a @ b`` contract on TPU)."""
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return w * xf.astype(x.dtype)


def _fused_step_kernel(  # noqa: C901 - one kernel, one pipeline
        *args,
        batch: int, num_heads: int, head_dim: int, hidden: int,
        inter: int, page_size: int, ppcb: int, pages_per_slot: int,
        n_layers: int, eps: float, uniform_append: bool, quantized: bool,
        exact_tail: bool):
    n_pools = 3 if quantized else 2
    (lengths_ref, slot_tbl_ref, blk_tbl_ref, total_ref, wpos_ref) = args[:5]
    ins = args[5:5 + 8 + n_pools]
    (x0_ref, wqkv_ref, wo_ref, wgu_ref, wd_ref, ln_ref, cos_ref,
     sin_ref) = ins[:8]
    k_pool_ref, v_pool_ref = ins[8], ins[9]
    s_pool_ref = ins[10] if quantized else None
    rest = args[5 + 8 + n_pools:]
    if quantized:
        # int8 pools are READ-ONLY here: the fresh bf16 rows come out as
        # per-layer outputs and the wrapper quantizes + scatters them (the
        # in-kernel RMW can't quantize — per-head absmax needs a lane-group
        # reduction the wrapper does in one XLA pass over all layers)
        xout_ref, kn_ref, vn_ref = rest[:3]
        (xs_ref, kbuf, vbuf, sbuf, sems,
         accs_ref, ms_ref, ls_ref) = rest[3:]
        kwbuf = vwbuf = wsem = None
    else:
        xout_ref, k_out_ref, v_out_ref = rest[:3]
        (xs_ref, kbuf, vbuf, sems, kwbuf, vwbuf, wsem,
         accs_ref, ms_ref, ls_ref) = rest[3:]
        sbuf = None
    b, d = batch, hidden
    w = k_pool_ref.shape[-1]  # == num_heads * head_dim (lanes; int8 or bf16)
    f = inter
    li = pl.program_id(0)
    dtype = wqkv_ref.dtype
    scale = head_dim ** -0.5
    bk = ppcb * page_size

    @pl.when(li == 0)
    def _():
        xs_ref[...] = x0_ref[...]

    x = xs_ref[...]  # [B, D] bf16 residual stream

    # ---- qkv + RoPE ------------------------------------------------------
    h = _rms_norm(x, ln_ref[0, 0:1], eps)
    qkv = _mm(h, wqkv_ref[0])  # [B, 3W]
    q = qkv[:, :w]
    k = qkv[:, w:2 * w]
    v = qkv[:, 2 * w:]
    cos = cos_ref[...]  # [B, W] f32 (per-head tiled)
    sin = sin_ref[...]
    # per-head rotate-half via two whole-row lane rolls + a select: for
    # lane j in head h, rot(x)[j] = -x[j+half] (first half-block) or
    # x[j-half] (second); a global roll by ±half never crosses a head
    # boundary for the lanes each branch keeps.  Exact ±x values — bit-
    # identical to a ±1 permutation matmul, with no [W, W] temporaries
    # (the rmat + its iota scaffolding cost ~10 MB of scoped VMEM, which
    # the co-compiled token-row kernel needs).
    half = head_dim // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    first_half = jax.lax.rem(lane, head_dim) < half

    def rot(x):
        xf = x.astype(jnp.float32)
        return jnp.where(first_half, -pltpu.roll(xf, shift=w - half, axis=1),
                         pltpu.roll(xf, shift=half, axis=1))

    qr = (q.astype(jnp.float32) * cos + rot(q) * sin).astype(dtype)
    kr = (k.astype(jnp.float32) * cos + rot(k) * sin).astype(dtype)
    # pre-scaled query: f32 for the self term, bf16 for the cache scores
    # (build_q_diag's cast in the standalone path)
    qs32 = qr.astype(jnp.float32) * scale
    qsb = qs32.astype(dtype)

    # ---- fresh-row RMW append: start the tile reads now ------------------
    # pools arrive as a 4D [L*B, pages_per_slot, page, w] view, so with
    # ``uniform_append`` (the aligned path: every slot writes the same page
    # offset) ALL slots' 8-row tiles are ONE strided DMA — [B, 8, w] with a
    # pages_per_slot*page stride between slots — instead of B separate
    # issues+waits per tensor per layer (2*B*L DMA issues per event, a
    # measurable share of the kernel's fixed cost at bs=32).
    def wtile(ref, s):
        wp = wpos_ref[s]
        wbase = pl.multiple_of((wp % page_size) // RMW_ROWS * RMW_ROWS,
                               RMW_ROWS)
        return ref.at[li * batch + s, wp // page_size,
                      pl.ds(wbase, RMW_ROWS)]

    if quantized:
        pass  # no in-kernel append: fresh rows leave via kn/vn outputs
    elif uniform_append:
        wp0 = wpos_ref[0]
        wbase0 = pl.multiple_of((wp0 % page_size) // RMW_ROWS * RMW_ROWS,
                                RMW_ROWS)

        def wtile_all(ref):
            return ref.at[pl.ds(li * batch, batch), wp0 // page_size,
                          pl.ds(wbase0, RMW_ROWS)]

        pltpu.make_async_copy(wtile_all(k_out_ref), kwbuf,
                              wsem.at[0, 0]).start()
        pltpu.make_async_copy(wtile_all(v_out_ref), vwbuf,
                              wsem.at[0, 1]).start()
    else:
        for s in range(b):
            pltpu.make_async_copy(wtile(k_out_ref, s), kwbuf.at[s],
                                  wsem.at[s, 0]).start()
            pltpu.make_async_copy(wtile(v_out_ref, s), vwbuf.at[s],
                                  wsem.at[s, 1]).start()

    # ---- paged flash attention over the cached history -------------------
    # The slot loop is STATICALLY UNROLLED (batch is a compile-time
    # constant): per-slot rows are static register slices, so no dynamic
    # sublane indexing exists anywhere (Mosaic requires provable 8-row
    # alignment for those), and the flash state never leaves registers.
    total = total_ref[0]

    # Tail blocks are DMA'd at EXACT page granularity: a slot's last compute
    # block covers up to ppcb pages but only ``ceil(len/page) - blk*ppcb`` of
    # them hold live rows — copying the full block reads ~96 masked rows per
    # slot-layer on average (~150 MB/event at bs=32, ~15% of all cache
    # traffic).  Dynamic-SIZE DMAs don't exist, so the size is selected by
    # ``pl.when`` over the ppcb static variants (one DMA issued either way;
    # the wait recomputes the same size so the semaphore bytes match).
    def blk_pages(i):
        need = ((lengths_ref[slot_tbl_ref[i]] + page_size - 1) // page_size
                - blk_tbl_ref[i] * ppcb)
        return jnp.clip(need, 1, ppcb)

    pool_srcs = [k_pool_ref, v_pool_ref] + ([s_pool_ref] if quantized else [])
    pool_bufs = [kbuf, vbuf] + ([sbuf] if quantized else [])

    # ``exact_tail=False`` keeps the single full-ppcb copy variant: the
    # pl.when size selection multiplies the DMA code by ppcb, and at 24
    # layers the total program size crashes this container's remote
    # compiler (tv2o-large keeps whole-block copies; the tail waste is the
    # price of compiling at all)
    def _sized(kp, k, body):
        if exact_tail:
            pl.when(kp == k)(body)
        else:
            body()

    def copy_block(i, slot):
        row = li * batch + slot_tbl_ref[i]
        blk0 = blk_tbl_ref[i] * ppcb
        kp = blk_pages(i) if exact_tail else ppcb
        for k in (range(1, ppcb + 1) if exact_tail else (ppcb,)):
            def body(k=k):
                for j, (src, dst) in enumerate(zip(pool_srcs, pool_bufs)):
                    pltpu.make_async_copy(src.at[row, pl.ds(blk0, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).start()
            _sized(kp, k, body)

    def wait_block(i, slot):
        kp = blk_pages(i) if exact_tail else ppcb
        for k in (range(1, ppcb + 1) if exact_tail else (ppcb,)):
            def body(k=k):
                for j, (src, dst) in enumerate(zip(pool_srcs, pool_bufs)):
                    pltpu.make_async_copy(src.at[0, pl.ds(0, k)],
                                          dst.at[slot, pl.ds(0, k)],
                                          sems.at[slot, j]).wait()
            _sized(kp, k, body)

    if quantized:
        # [LANE, H] routers: one bf16 matmul extracts the per-row k (lane h)
        # or v (lane H+h) scale AND maps it to every query head (MHA)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 0)
        head_r = jax.lax.broadcasted_iota(jnp.int32, (LANE, num_heads), 1)
        router_k = (lane_r == head_r).astype(jnp.bfloat16)
        router_v = (lane_r == num_heads + head_r).astype(jnp.bfloat16)

    # G[w, h] = 1 iff lane w belongs to head h (MHA: head = w // head_dim)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (w, num_heads), 0)
    head_w = jax.lax.broadcasted_iota(jnp.int32, (w, num_heads), 1)
    gmask32 = (lane_w // head_dim == head_w).astype(jnp.float32)
    gt32 = (jax.lax.broadcasted_iota(jnp.int32, (num_heads, w), 1)
            // head_dim
            == jax.lax.broadcasted_iota(jnp.int32, (num_heads, w), 0)
            ).astype(jnp.float32)  # [H, W]

    # 3-deep buffer rotation: with 2 buffers at most ONE copy is in flight
    # while a block computes; the third buffer keeps 2 outstanding, hiding
    # the per-block issue+wait latency across slot boundaries
    @pl.when(total > 0)
    def _():
        copy_block(0, 0)

    @pl.when(total > 1)
    def _():
        copy_block(1, 1)

    i0 = jnp.zeros((), jnp.int32)
    for s in range(b):
        length = lengths_ref[s]
        n_b = (length + bk - 1) // bk
        q_rowb = qsb[s:s + 1, :].astype(jnp.float32)  # bf16-rounded, f32

        def blk_loop(j, carry, i0=i0, length=length, q_rowb=q_rowb):
            acc, m, l = carry
            i = i0 + j
            slot = jax.lax.rem(i, 3)

            @pl.when(i + 2 < total)
            def _():
                copy_block(i + 2, jax.lax.rem(i + 2, 3))

            wait_block(i, slot)
            k_blk = kbuf[slot].reshape(bk, w)
            # (k ⊙ q) @ G: identical f32 products and contraction
            # positions as the standalone kernel's k @ q_diag (int8 cache
            # values are exact in f32; the per-row-per-head scale factors
            # out of the head's lane sum, so sc * ks dequantizes exactly
            # like the standalone kernel's (k_blk @ qd) * ks)
            prod = k_blk.astype(jnp.float32) * q_rowb
            sc = jax.lax.dot(prod, gmask32,
                             preferred_element_type=jnp.float32)
            if quantized:
                s_blk = sbuf[slot].reshape(bk, LANE)
                ks = jax.lax.dot(s_blk, router_k,
                                 preferred_element_type=jnp.float32)
                sc = sc * ks
            row = j * bk + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
            sc = jnp.where(row < length, sc, -jnp.inf)
            block_m = jnp.max(sc, axis=0)[:, None]  # [H, 1]

            m_new = jnp.maximum(m, block_m)
            alpha = jnp.exp(m - m_new)
            acc = acc * alpha
            l = l * alpha
            pexp = jnp.exp(sc - m_new.T)  # [bk, H] f32
            l = l + jnp.sum(pexp, axis=0)[:, None]
            # rows in pages the tail DMA skipped hold garbage (NaN in
            # interpret mode): pexp there is 0, but 0*NaN = NaN in the AV
            # contraction — zero the dead V rows explicitly
            v_blk = vbuf[slot].reshape(bk, w)
            v_blk = jnp.where(row[:, :1] < length, v_blk,
                              jnp.zeros_like(v_blk))
            if quantized:
                # fold the v scale into the attention weights (garbage on
                # dead rows — re-mask)
                vs = jax.lax.dot(s_blk, router_v,
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
        i0 = i0 + n_b
        # park the flash state in scratch; the self-term merge runs ONCE,
        # batched over all slots (the per-slot merge was ~6 tiny MXU ops x
        # B slots x L layers of serial latency — a large share of the
        # kernel's fixed cost — and kept B [1, W] rows live to the end)
        accs_ref[s] = acc
        ms_ref[s:s + 1, :] = m.T
        ls_ref[s:s + 1, :] = l.T

    # ---- batched self-term merge (all slots, a handful of [B, *] ops) ----
    # each head's context is its own diagonal head_dim-lane block of the
    # normalized accumulator.  Every contraction below sums the SAME f32
    # products at the same positions as the old per-slot [1, W] ops, so the
    # result is bit-identical; the diagonal extraction sums exactly one
    # nonzero term per (slot, lane), so MXU-vs-VPU order cannot differ.
    acc2d = accs_ref[...].reshape(b * num_heads, w)
    # gt tiled over slots: row r of acc2d belongs to head r % H
    gt_tiled = (jax.lax.broadcasted_iota(jnp.int32, (b * num_heads, w), 1)
                // head_dim
                == jax.lax.broadcasted_iota(
                    jnp.int32, (b * num_heads, w), 0) % num_heads
                ).astype(jnp.float32)
    # SEL[s, r] = 1 iff row r belongs to slot s: sums the H masked rows
    sel = (jax.lax.broadcasted_iota(jnp.int32, (b, b * num_heads), 1)
           // num_heads
           == jax.lax.broadcasted_iota(jnp.int32, (b, b * num_heads), 0)
           ).astype(jnp.float32)
    ls2d = ls_ref[...]  # [B, H]
    ms2d = ms_ref[...]
    lane_l = jax.lax.dot(ls2d, gt32,
                         preferred_element_type=jnp.float32)  # [B, W]
    o_diag = jax.lax.dot(sel, acc2d * gt_tiled,
                         preferred_element_type=jnp.float32) \
        / jnp.maximum(lane_l, 1e-30)
    s_self = jax.lax.dot(qs32 * kr.astype(jnp.float32), gmask32,
                         preferred_element_type=jnp.float32)  # [B, H]
    m2 = jnp.maximum(ms2d, s_self)
    w_cache = ls2d * jnp.exp(ms2d - m2)  # [B, H]
    w_self = jnp.exp(s_self - m2)
    # broadcast per-head weights over their head_dim-lane blocks via G^T
    wc = jax.lax.dot(w_cache, gt32, preferred_element_type=jnp.float32)
    ws = jax.lax.dot(w_self, gt32, preferred_element_type=jnp.float32)
    attn = (wc * o_diag + ws * v.astype(jnp.float32)) / (wc + ws)  # [B, W]
    x = x + _mm(attn.astype(dtype), wo_ref[0])

    # ---- MLP -------------------------------------------------------------
    hm = _rms_norm(x, ln_ref[0, 1:2], eps)
    gu = _mm(hm, wgu_ref[0])  # [B, 2F]
    gf = gu[:, :f].astype(jnp.float32)
    gated = (gf * jax.nn.sigmoid(gf)).astype(dtype) * gu[:, f:]
    x = x + _mm(gated, wd_ref[0])
    xs_ref[...] = x

    @pl.when(li == n_layers - 1)
    def _():
        xout_ref[...] = x

    if quantized:
        # fresh rows out (per-layer blocks); the wrapper quantizes + scatters
        kn_ref[0] = kr
        vn_ref[0] = v
        return

    # ---- finish the RMW append ------------------------------------------
    if uniform_append:
        off0 = wp0 % page_size - wbase0
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (b, RMW_ROWS, w), 1) == off0
        pltpu.make_async_copy(wtile_all(k_out_ref), kwbuf,
                              wsem.at[0, 0]).wait()
        kwbuf[...] = jnp.where(
            sel, jnp.broadcast_to(kr[:, None, :], (b, RMW_ROWS, w)),
            kwbuf[...])
        pltpu.make_async_copy(kwbuf, wtile_all(k_out_ref),
                              wsem.at[0, 0]).start()
        pltpu.make_async_copy(wtile_all(v_out_ref), vwbuf,
                              wsem.at[0, 1]).wait()
        vwbuf[...] = jnp.where(
            sel, jnp.broadcast_to(v[:, None, :], (b, RMW_ROWS, w)),
            vwbuf[...])
        pltpu.make_async_copy(vwbuf, wtile_all(v_out_ref),
                              wsem.at[0, 1]).start()
        pltpu.make_async_copy(kwbuf, wtile_all(k_out_ref),
                              wsem.at[0, 0]).wait()
        pltpu.make_async_copy(vwbuf, wtile_all(v_out_ref),
                              wsem.at[0, 1]).wait()
        return
    for s in range(b):
        wp = wpos_ref[s]
        off = wp % page_size - (wp % page_size) // RMW_ROWS * RMW_ROWS
        sel = jax.lax.broadcasted_iota(jnp.int32, (RMW_ROWS, w), 0) == off
        pltpu.make_async_copy(wtile(k_out_ref, s), kwbuf.at[s],
                              wsem.at[s, 0]).wait()
        kwbuf[s] = jnp.where(
            sel, jnp.broadcast_to(kr[s:s + 1, :], (RMW_ROWS, w)), kwbuf[s])
        pltpu.make_async_copy(kwbuf.at[s], wtile(k_out_ref, s),
                              wsem.at[s, 0]).start()
        pltpu.make_async_copy(wtile(v_out_ref, s), vwbuf.at[s],
                              wsem.at[s, 1]).wait()
        vwbuf[s] = jnp.where(
            sel, jnp.broadcast_to(v[s:s + 1, :], (RMW_ROWS, w)), vwbuf[s])
        pltpu.make_async_copy(vwbuf.at[s], wtile(v_out_ref, s),
                              wsem.at[s, 1]).start()
    for s in range(b):
        pltpu.make_async_copy(kwbuf.at[s], wtile(k_out_ref, s),
                              wsem.at[s, 0]).wait()
        pltpu.make_async_copy(vwbuf.at[s], wtile(v_out_ref, s),
                              wsem.at[s, 1]).wait()


def prepare_fused(net_params: dict):
    """Concatenate the per-layer projections once per decode chunk:
    ``wqkv [L, D, 3W]``, ``wgu [L, D, 2F]``, ``lnorms [L, 2, D]``.  Cheap
    (one pass over the weights) and hoisted outside the event loop by every
    caller, so the concat never runs per event."""
    lp = net_params["layers"]
    return {
        "wqkv": jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=-1),
        "wo": lp["wo"],
        "wgu": jnp.concatenate([lp["w_gate"], lp["w_up"]], axis=-1),
        "wd": lp["w_down"],
        "ln": jnp.stack([lp["ln_attn"], lp["ln_mlp"]], axis=1),
        "final_norm": net_params["final_norm"],
    }


@functools.partial(jax.jit, static_argnames=("cfg", "page_size",
                                             "pages_per_slot", "ppcb",
                                             "uniform_append", "exact_tail",
                                             "interpret"))
def fused_decode_step(fused: dict, cfg, x: jax.Array, pools: PagedPools,
                      index: jax.Array, active=None, *,
                      page_size: int, pages_per_slot: int, ppcb: int = 4,
                      uniform_append: bool = False, exact_tail: bool = None,
                      interpret: bool = False):
    """Drop-in replacement for ``llama.decode_paged`` on the TPU hot path.

    fused: :func:`prepare_fused` output; x: [B, D] embeddings; index:
    int32 [B] per-slot lengths BEFORE this token.  Returns (hidden [B, D]
    after the final norm, updated pools).  bf16 or int8 MHA pools.

    ``uniform_append``: caller guarantees every slot writes the same page
    offset (``index`` is a broadcast scalar — the aligned decode loop); the
    fresh-row RMW then runs as ONE strided [B, 8, w] DMA per tensor per
    layer instead of B separate issues+waits.

    int8 pools: the kernel streams k/v/scale pages and dequantizes in the
    score and p-weight math (same factorization as the standalone kernels);
    the fresh bf16 rows come back as per-layer outputs and are quantized +
    scattered here in one XLA pass (``quantize_packed`` semantics — the
    pool stores the SAME values the split path would).
    """
    b, d = x.shape
    l_n, _, w3 = fused["wqkv"].shape
    w = w3 // 3
    f2 = fused["wgu"].shape[-1]
    num_heads = cfg.num_heads
    head_dim = cfg.head_dim
    assert cfg.kv_heads == num_heads, "fused step kernel is MHA-only"
    assert head_stride(head_dim, num_heads) == head_dim
    quantized = pools.quantized
    dtype = fused["wqkv"].dtype
    capacity = pages_per_slot * page_size

    if active is None:
        active = jnp.ones((b,), bool)
    index = index.astype(jnp.int32)
    lengths = jnp.where(active, jnp.minimum(index, capacity), 0)
    wpos = jnp.clip(index, 0, capacity - 1)

    # flat slot-major work list (same construction as the streaming kernel)
    bk = ppcb * page_size
    nb = (lengths + bk - 1) // bk
    cum = jnp.cumsum(nb)
    total = cum[-1:].astype(jnp.int32)
    max_total = b * max(pages_per_slot // ppcb, 1)
    idx = jnp.arange(max_total, dtype=jnp.int32)
    slot_tbl = jnp.minimum(jnp.searchsorted(cum, idx, side="right"),
                           b - 1).astype(jnp.int32)
    blk_tbl = (idx - (cum - nb)[slot_tbl]).astype(jnp.int32)

    # RoPE tables tiled per head: [B, W] f32
    from ..models.llama import rope_cos_sin

    cos, sin = rope_cos_sin(index[:, None].astype(jnp.int32), head_dim,
                            cfg.rope_theta)  # [B, 1, dh]
    cos = jnp.tile(cos[:, 0], (1, num_heads))
    sin = jnp.tile(sin[:, 0], (1, num_heads))

    if exact_tail is None:
        # exact-page tail DMAs multiply the copy/wait code by ppcb; at 24
        # layers (tv2o-large) the program crashes this container's remote
        # compiler — whole-block copies keep large compiling
        exact_tail = l_n <= 16
    kernel = functools.partial(
        _fused_step_kernel, batch=b, num_heads=num_heads, head_dim=head_dim,
        hidden=d, inter=f2 // 2, page_size=page_size, ppcb=ppcb,
        pages_per_slot=pages_per_slot, n_layers=l_n, eps=cfg.rms_norm_eps,
        uniform_append=uniform_append, quantized=quantized,
        exact_tail=exact_tail)

    # 4D slot-major pool view: [L*B, pages_per_slot, page, w] — the RMW
    # append addresses all slots' tiles as one strided slice, and block
    # copies index (slot-row, page) instead of a flat page offset
    pool_shape = pools.k.shape
    assert pool_shape[0] == l_n * b * pages_per_slot, pool_shape
    k4 = pools.k.reshape(l_n * b, pages_per_slot, page_size, -1)
    v4 = pools.v.reshape(l_n * b, pages_per_slot, page_size, -1)
    pool_ins = [k4, v4]
    if quantized:
        pool_ins.append(
            pools.scales.reshape(l_n * b, pages_per_slot, page_size, -1))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((b, d), dtype),        # xs residual stream
        pltpu.VMEM((3, ppcb, page_size, w), pools.k.dtype),
        pltpu.VMEM((3, ppcb, page_size, w), pools.v.dtype),
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((3, ppcb, page_size, LANE), jnp.bfloat16),  # scales
            pltpu.SemaphoreType.DMA((3, 3)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, d), dtype),
            jax.ShapeDtypeStruct((l_n, b, w), dtype),  # fresh k rows
            jax.ShapeDtypeStruct((l_n, b, w), dtype),  # fresh v rows
        ]
        row_spec = pl.BlockSpec((1, b, w), lambda li, *_: (li, 0, 0))
        out_specs = [vmem, row_spec, row_spec]
        aliases = {}
    else:
        scratch += [
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.VMEM((b, RMW_ROWS, w), pools.k.dtype),  # k RMW tiles
            pltpu.VMEM((b, RMW_ROWS, w), pools.v.dtype),  # v RMW tiles
            pltpu.SemaphoreType.DMA((b, 2)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, d), dtype),
            jax.ShapeDtypeStruct(k4.shape, k4.dtype),
            jax.ShapeDtypeStruct(v4.shape, v4.dtype),
        ]
        out_specs = [vmem, any_, any_]
        aliases = {13: 1, 14: 2}  # 5 scalars + 8 ins before pools
    scratch += [
        pltpu.VMEM((b, num_heads, w), jnp.float32),   # parked flash accs
        pltpu.VMEM((b, num_heads), jnp.float32),      # parked flash m
        pltpu.VMEM((b, num_heads), jnp.float32),      # parked flash l
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(l_n,),
        in_specs=[
            vmem,  # x0
            pl.BlockSpec((1, d, w3), lambda li, *_: (li, 0, 0)),      # wqkv
            pl.BlockSpec((1, w, d), lambda li, *_: (li, 0, 0)),       # wo
            pl.BlockSpec((1, d, f2), lambda li, *_: (li, 0, 0)),      # wgu
            pl.BlockSpec((1, f2 // 2, d), lambda li, *_: (li, 0, 0)),  # wd
            pl.BlockSpec((1, 2, d), lambda li, *_: (li, 0, 0)),       # ln
            vmem, vmem,  # cos, sin
        ] + [any_] * len(pool_ins),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    # weight blocks double-buffer across the layer grid: 2 x per-layer
    # weight bytes + the cache stream + RMW tiles + slack for compiler
    # temporaries.  This explicit limit is RESERVED against the program's
    # shared scoped-vmem pool even while the co-compiled token-row kernel
    # runs, so keep it as tight as the kernel's real demand allows
    # (tools/probe_vmem.py measures the interplay on the live compiler).
    wbytes = sum(int(np.prod(fused[n].shape[1:]))
                 for n in ("wqkv", "wo", "wgu", "wd", "ln"))
    wbytes *= jnp.dtype(dtype).itemsize
    kv_itemsize = jnp.dtype(pools.k.dtype).itemsize
    scratch_bytes = b * d * 2 + 3 * 2 * bk * w * kv_itemsize \
        + b * num_heads * (w + 2) * 4  # parked flash state
    if quantized:
        scratch_bytes += 3 * 2 * bk * LANE  # bf16 scale stream
        scratch_bytes += 2 * 2 * b * w * 2  # double-buffered fresh-row outs
    else:
        scratch_bytes += 2 * b * RMW_ROWS * w * 2  # RMW tiles
    vmem_limit = 2 * int(wbytes) + int(scratch_bytes) + _SLACK_BYTES

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(lengths, slot_tbl, blk_tbl, total, wpos,
      x.astype(dtype), fused["wqkv"], fused["wo"], fused["wgu"], fused["wd"],
      fused["ln"], cos, sin, *pool_ins)

    from ..models.llama import rms_norm

    hidden = rms_norm(outs[0], fused["final_norm"], cfg.rms_norm_eps)
    if not quantized:
        return hidden, PagedPools(k=outs[1].reshape(pool_shape),
                                  v=outs[2].reshape(pool_shape))

    # ---- quantize + scatter the fresh rows (all layers, one XLA pass) ----
    from .paged_allheads import combine_scales, quantize_packed

    kn, vn = outs[1], outs[2]  # [L, B, W] bf16
    kq, kscale = quantize_packed(
        kn.reshape(l_n, b, num_heads, head_dim), num_heads, head_dim)
    vq, vscale = quantize_packed(
        vn.reshape(l_n, b, num_heads, head_dim), num_heads, head_dim)
    srow = combine_scales(kscale, vscale, num_heads)  # [L, B, LANE]
    page = (jnp.arange(l_n * b, dtype=jnp.int32) * pages_per_slot
            + jnp.tile(wpos // page_size, (l_n,)))
    # inactive slots: out-of-range page -> the scatter drops the update
    page = jnp.where(jnp.tile(active, (l_n,)), page, pool_shape[0])
    offs = jnp.tile(wpos % page_size, (l_n,))
    new_pools = PagedPools(
        k=pools.k.at[page, offs].set(kq.reshape(l_n * b, w)),
        v=pools.v.at[page, offs].set(vq.reshape(l_n * b, w)),
        scales=pools.scales.at[page, offs].set(srow.reshape(l_n * b, LANE)))
    return hidden, new_pools


_ENABLED = True


def set_enabled(v: bool):
    """Toggle the fused step kernel (A/B benchmarks, strict-parity runs)."""
    global _ENABLED
    _ENABLED = v


def usable(params: dict, cfg, pools: PagedPools) -> bool:
    """TPU, bf16 weights, MHA (bf16 and int8 pools both supported)."""
    return (_ENABLED and jax.default_backend() == "tpu"
            and params["lm_head"].dtype == jnp.bfloat16
            and cfg.net.kv_heads == cfg.net.num_heads
            and head_stride(cfg.net.head_dim, cfg.net.num_heads)
            == cfg.net.head_dim)
