"""Whole-event decode loop kernel: E events — token rows AND event net —
in ONE dispatch.

Round 3 fused each half of the decode step into its own kernel: the
whole-step event net (ops/fused_step.py, all layers one dispatch) and the
token row (ops/token_loop.py, 8 sampling steps one dispatch).  Two dispatch
boundaries per event remained, and the length sweep
(tools/probe_fused_sweep.py) attributed ~0.46 ms/event of fixed cost to
them: each ``pallas_call`` re-stages the token net's ~56 MB of VMEM-input
weights from HBM, the XLA glue between the kernels (event-embedding gather,
row scatter, while-loop bookkeeping) runs at tiny shapes, and the HBM
pipeline drains at every kernel edge — during the ~0.3 ms token phase the
weight stream sits idle.

This kernel runs ``grid=(E, L+1)``: phase 0 of event ``e`` is the token row
(8 autoregressive token-net steps + grammar masks + top-p/top-k Gumbel
sampling, token_loop.py semantics), phases 1..L are the event-net layers
(fused_step.py semantics: rmsnorm → qkv → RoPE → paged flash attention with
the fresh row's self-term merged analytically and the row RMW-appended
in-kernel → o-proj → SwiGLU).  What the merge buys:

- the token-net weights are plain VMEM inputs, fetched ONCE per dispatch
  and reused by all E events (~56 MB/event of HBM traffic deleted);
- the event-net weights stream through a manual R-slot DMA rotation of
  WIDE uniform ``[D, 4D]`` chunks (q|k|v|o lane-packed in one DMA; gate
  and up whole; down's D-row blocks packed side-by-side along lanes — see
  prepare_merged).  A consumed chunk immediately re-issues its slot for
  the chunk R ahead, so the stream crosses layer, phase, and EVENT
  boundaries without draining — layer-0 chunks of event ``e+1`` stream
  while event ``e``'s token row computes.  The rotation also replaces the
  2x-per-layer-weights BlockSpec double-buffer (~67 MB) with R chunk slots
  (~34 MB at R=4), which is what lets the token net's weights co-reside;
  wide chunks measure +0.7% over [D, D] granularity (48 scalar-core DMA
  waits per event instead of 192; v5e, bs=32);
- the sampled row feeds the event net in-kernel: the event embedding
  (midinet.embed_events: gather + sum over the row) accumulates as one-hot
  MXU matmuls against the event embed table while the tokens are sampled —
  no XLA round-trip between the halves;
- per-event cache geometry (uniform lengths: ``len0 + e``) is scalar
  arithmetic in-kernel — the per-event host tables of the split path are
  gone.

Numerics: identical contractions to the two round-3 kernels everywhere
except (a) the event-embedding sum (f32 accumulate + one round vs XLA's
reduce over the gathered bf16 rows) and (b) the MLP down-projection,
accumulated f32 across D-row chunks in chunk order (the MXU accumulates a
whole [F, D] contraction over sublane blocks in the same order; interpret
mode differs at f32 epsilon).  Both are below sampling-relevant magnitude;
greedy streams are asserted identical to the split path in
tests/test_event_loop.py.

Two token-net residency layouts, chosen by size (prepare_inputs):

- resident (tv2o-medium, ~63 MB): every token-net array is a VMEM input
  for the whole dispatch;
- stream_tok_mlp (tv2o-large, whose ~105 MB full residency cannot co-exist
  with the rotation in the 128 MB VMEM): attention weights + lm_head +
  embeds (~69 MB) stay resident while each layer's gate|up|down rides the
  SAME chunk rotation as one packed zero-padded [D, 4D] chunk, re-consumed
  at every one of the t_max token steps (the stored stream holds them
  once; the schedule re-reads them, +t_max*t_layers chunks per event).
  Padding is exact — padded lanes contribute 0.0 to every f32
  accumulation — so sampled rows stay bit-identical to the resident
  layout (asserted in tests/test_event_loop.py).

Restrictions (the tv2o family satisfies all): MHA, bf16 weights and pools,
``num_heads * head_dim == hidden`` (uniform chunk shapes), batch <= 64;
stream_tok_mlp additionally needs token FFN width <= hidden.

Reference capability: the torch generate loop (/root/reference/
midi_model.py:167-250) — one Python iteration per TOKEN there; one kernel
dispatch per E*(1+8) sampled tokens here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paged_allheads import RMW_ROWS, PagedPools, head_stride
from .token_loop import K_CAP, _mm, _rms_norm, _rope, _sample

LANE = 128
_SLACK_BYTES = 8 << 20  # Mosaic compiler temporaries


def _event_loop_kernel(  # noqa: C901 - one kernel, one pipeline
        *args,
        batch: int, num_heads: int, head_dim: int, hidden: int, ng: int,
        page_size: int, ppcb: int, pages_per_slot: int, n_layers: int,
        eps: float, exact_tail: bool, n_rot: int,
        t_layers: int, t_heads: int, t_head_dim: int, t_max: int,
        n_events: int, t_eps: float, eos_id: int, greedy: bool,
        stream_tok: bool, ragged: bool = False, group: int = 1):
    if ragged:
        # per-slot geometry: the continuous batcher's slots have different
        # history lengths and retire independently.  The flat slot-major
        # (slot, block) work tables are precomputed by the wrapper from
        # CONSERVATIVE lengths (len0 + E): blocks beyond a slot's current
        # length are exact no-ops (scores masked to -inf before the
        # softmax), so ONE table serves all E events of the dispatch.
        (len0_ref, maxk_ref, slot_tbl, blk_tbl, pages_tbl, nbt_ref,
         total_ref) = args[:7]
        ns = 7
    else:
        (len0_ref, maxk_ref) = args[:2]
        ns = 2
    n_in = 31 if ragged else 28
    ins = args[ns:ns + n_in]
    (hid0_ref, chunks_ref, ln_ref, fnorm_ref, cos_e_ref, sin_e_ref,
     temp_ref, topp_ref, topk_ref,
     wq_t, wk_t, wv_t, wo_t, wg_t, wu_t, wd_t, lna_t, lnm_t, fnorm_t,
     lm_ref, embt_ref, embn_ref, first_ref, steps_ref, pad_ref,
     cos_t_ref, sin_t_ref, gum_ref) = ins[:28]
    if ragged:
        active0_ref, lens0v_ref, allow_ref = ins[28:31]
    k_pool_ref, v_pool_ref = args[ns + n_in], args[ns + n_in + 1]
    outs = args[ns + n_in + 2:]
    (rows_ref, xout_ref,
     k_out_ref, v_out_ref,
     xs_ref, g_ref, wbuf, wsems, kbuf, vbuf, csems,
     kwbuf, vwbuf, rmwsem, accs_ref, ms_ref, ls_ref, work_ref) = outs[:18]
    alive_ref = outs[18] if ragged else None
    capacity = page_size * pages_per_slot

    b, d, w = batch, hidden, num_heads * head_dim
    e_i = pl.program_id(0)
    p_i = pl.program_id(1)
    n_e = pl.num_programs(0)
    dtype = lm_ref.dtype
    scale = head_dim ** -0.5
    bk = ppcb * page_size
    cpl = 1 + 3 * ng                # chunks per layer: qkvo + 3*ng MLP
    # chunks per EVENT: in stream_tok mode the token net's packed
    # gate|up|down chunks (one per token layer, re-consumed each of the
    # t_max steps) lead the event's schedule, then the event-net layers
    tk = t_max * t_layers if stream_tok else 0
    cpe = tk + n_layers * cpl
    n_chunks = n_e * cpe

    # ---- weight-chunk rotation ------------------------------------------
    def issue(c):
        @pl.when(c < n_chunks)
        def _():
            rc = jax.lax.rem(c, cpe)
            if stream_tok:
                # token chunks are stored ONCE after the event chunks and
                # re-read every step: src cycles over the t_layers entries
                src = jnp.where(rc < tk,
                                n_layers * cpl + jax.lax.rem(rc, t_layers),
                                rc - tk)
            else:
                src = rc
            slot = jax.lax.rem(c, n_rot)
            pltpu.make_async_copy(chunks_ref.at[src], wbuf.at[slot],
                                  wsems.at[slot]).start()

    def wait(c):
        slot = jax.lax.rem(c, n_rot)
        pltpu.make_async_copy(chunks_ref.at[0], wbuf.at[slot],
                              wsems.at[slot]).wait()
        return slot

    def consume(c):
        """Wait for chunk ``c``, hand its buffer out, refill the slot with
        the chunk ``n_rot`` ahead (same slot by construction)."""
        slot = wait(c)
        return slot

    # ---- cross-phase cache prefetch (aligned only) -----------------------
    # The first 2 cache blocks of every layer phase are issued by the
    # PREVIOUS phase — layer 0's during the token phase (~0.25 ms of
    # otherwise cache-idle compute), layer li+1's right after layer li's
    # flash loop (the MLP's weight-chunk consumes cover the latency).
    # Without this the stream restarts cold L times per event: the block-0
    # DMA is only issued after the qkv chunk wait, a measured stall at
    # every phase boundary.  Geometry is per-event uniform, so the issuing
    # phase computes the same (kp, row) the waiting phase expects.
    def aligned_cache_copy(layer, i, slot):
        len_e = len0_ref[0] + e_i
        nbs_ = jnp.maximum((len_e + bk - 1) // bk, 1)
        blk0 = jax.lax.rem(i, nbs_) * ppcb
        need = (len_e + page_size - 1) // page_size - blk0
        kp = jnp.clip(need, 1, ppcb)
        row = layer * batch + (i // nbs_) * group
        for kk in (range(1, ppcb + 1) if exact_tail else (ppcb,)):
            def body(kk=kk):
                for jj, (src, dst) in enumerate(
                        ((k_out_ref, kbuf), (v_out_ref, vbuf))):
                    pltpu.make_async_copy(
                        src.at[pl.ds(row, group), pl.ds(blk0, kk)],
                        dst.at[slot, :, pl.ds(0, kk)],
                        csems.at[slot, jj]).start()
            if exact_tail:
                pl.when(kp == kk)(body)
            else:
                body()

    def prefetch_layer(layer):
        """Issue blocks 0 and 1 of ``layer`` (this event) into slots 0/1."""
        len_e = len0_ref[0] + e_i
        total_ = (b // group) * ((len_e + bk - 1) // bk)
        pl.when(total_ > 0)(lambda: aligned_cache_copy(layer, 0, 0))
        pl.when(total_ > 1)(lambda: aligned_cache_copy(layer, 1, 1))

    # ======================================================================
    # phase 0: token row (token_loop.py semantics) + in-kernel event embed
    # ======================================================================
    @pl.when(p_i == 0)
    def _token_phase():
        # first dispatch step primes the whole rotation
        @pl.when(e_i == 0)
        def _():
            for c0 in range(n_rot):
                issue(c0)
            if ragged:
                alive_ref[...] = active0_ref[...]

        if not ragged:
            # layer 0's first cache blocks ride under the token compute
            prefetch_layer(0)

        alive_b = (alive_ref[...] > 0) if ragged else None  # [B, 1]
        v_voc = lm_ref.shape[-1]
        temp = temp_ref[...]
        top_p = topp_ref[...]
        top_k = topk_ref[...]
        max_k = maxk_ref[0]
        first_event_id = eos_id + 1

        # event e>0 reads the residual left by event e-1's layers
        normed = _rms_norm(xs_ref[...], fnorm_ref[...], eps)
        x = jnp.where(e_i == 0, hid0_ref[...], normed).astype(dtype)

        lane_v = jax.lax.broadcasted_iota(jnp.int32, (b, v_voc), 1)
        lane_e = jax.lax.broadcasted_iota(jnp.int32, (b, n_events), 1)
        ended = jnp.zeros((b, 1), bool)
        e_onehot = jnp.zeros((b, n_events), jnp.float32)
        ks = [[] for _ in range(t_layers)]
        vs = [[] for _ in range(t_layers)]
        ev_acc = jnp.zeros((b, d), jnp.float32)  # event-embedding accumulator

        for j in range(t_max):
            cos_j = cos_t_ref[j:j + 1, :]
            sin_j = sin_t_ref[j:j + 1, :]
            for li in range(t_layers):
                h = _rms_norm(x, lna_t[li:li + 1, :], t_eps)
                q = _mm(h, wq_t[li])
                k = _mm(h, wk_t[li])
                vv = _mm(h, wv_t[li])
                k_heads = [
                    _rope(k[:, hk * t_head_dim:(hk + 1) * t_head_dim],
                          cos_j, sin_j)
                    for hk in range(t_heads)
                ]
                ks[li].append(jnp.concatenate(k_heads, axis=-1)
                              if t_heads > 1 else k_heads[0])
                vs[li].append(vv)
                outs = []
                t_scale = t_head_dim ** -0.5
                for hq in range(t_heads):
                    sl = slice(hq * t_head_dim, (hq + 1) * t_head_dim)
                    qh = _rope(q[:, sl], cos_j, sin_j).astype(jnp.float32)
                    scores = [
                        jnp.sum(qh * ks[li][t][:, sl].astype(jnp.float32),
                                axis=-1, keepdims=True) * t_scale
                        for t in range(j + 1)
                    ]
                    s = jnp.concatenate(scores, axis=-1) if j else scores[0]
                    m = jnp.max(s, axis=-1, keepdims=True)
                    ex = jnp.exp(s - m)
                    p = (ex / jnp.sum(ex, axis=-1, keepdims=True)
                         ).astype(dtype)
                    o = jnp.zeros((b, t_head_dim), jnp.float32)
                    for t in range(j + 1):
                        o = o + (p[:, t:t + 1].astype(jnp.float32)
                                 * vs[li][t][:, sl].astype(jnp.float32))
                    outs.append(o.astype(dtype))
                attn = (jnp.concatenate(outs, axis=-1) if t_heads > 1
                        else outs[0])
                x = x + _mm(attn, wo_t[li])
                hm = _rms_norm(x, lnm_t[li:li + 1, :], t_eps)
                if stream_tok:
                    # gate|up|down ride the rotation as ONE packed chunk
                    # (gate cols, up cols, down rows each zero-padded to D:
                    # padded lanes contribute exact 0.0 to every f32
                    # accumulation, so rows stay bit-identical to the
                    # resident path)
                    cT = e_i * cpe + j * t_layers + li
                    sg = consume(cT)
                    gf = _mm(hm, wbuf[sg, :, :d]).astype(jnp.float32)
                    gated = (gf * jax.nn.sigmoid(gf)).astype(dtype) \
                        * _mm(hm, wbuf[sg, :, d:2 * d])
                    x = x + _mm(gated, wbuf[sg, :, 2 * d:3 * d])
                    issue(cT + n_rot)
                else:
                    gf = _mm(hm, wg_t[li]).astype(jnp.float32)
                    gated = (gf * jax.nn.sigmoid(gf)).astype(dtype) \
                        * _mm(hm, wu_t[li])
                    x = x + _mm(gated, wd_t[li])

            hf = _rms_norm(x, fnorm_t[...], t_eps)
            logits = _mm(hf, lm_ref[...]).astype(jnp.float32)
            lmax = jnp.max(logits / temp, axis=-1, keepdims=True)
            eexp = jnp.exp(logits / temp - lmax)
            probs = eexp / jnp.sum(eexp, axis=-1, keepdims=True)

            if j == 0:
                mask = jnp.broadcast_to(first_ref[...], (b, v_voc))
            else:
                step_tbl = steps_ref[j * n_events:(j + 1) * n_events, :]
                mask = jnp.dot(e_onehot.astype(jnp.bfloat16),
                               step_tbl.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            if j > 0 or ragged:
                pad_mask = jnp.broadcast_to(pad_ref[...], (b, v_voc))
            if j > 0:
                mask = jnp.where(ended, pad_mask, mask)
            if ragged:
                # retired slots emit pad rows at every step (the split
                # path's forced_pad; the host reads row[0]==pad as
                # "device-retired earlier in the chunk")
                mask = jnp.where(alive_b, mask, pad_mask)
            probs = probs * mask
            if ragged:
                # per-slot constraint plane (instrument/channel bans share
                # the batch; 0/1 in bf16 is exact — token_loop.py semantics)
                probs = probs * allow_ref[...].astype(jnp.float32)

            g_step = gum_ref[0, j * b:(j + 1) * b, :]
            tok = _sample(probs, g_step, work_ref, top_p, top_k, max_k,
                          greedy, K_CAP)

            rows_ref[0, :, j:j + 1] = tok[:, None]
            onehot = (lane_v == tok[:, None]).astype(dtype)
            # event-net input: midinet.embed_events — gather rows (exact
            # through the one-hot matmul: one nonzero product each) and sum
            ev_acc = ev_acc + jnp.dot(onehot, embn_ref[...],
                                      preferred_element_type=jnp.float32)
            if j == 0:
                ended = (tok[:, None] == eos_id)
                e_off = jnp.clip(tok[:, None] - first_event_id, 0,
                                 n_events - 1)
                e_onehot = (lane_e == e_off).astype(jnp.float32)
            if j < t_max - 1:
                x = jnp.dot(onehot, embt_ref[...],
                            preferred_element_type=jnp.float32).astype(dtype)

        if ragged:
            # retired slots keep their residual FROZEN at its retirement
            # value (the split path's hidden freeze); slots dead at entry
            # get zeros at e==0 so the scratch never leaks garbage/NaN into
            # the (unused but computed) dead-slot math
            base = jnp.where(e_i == 0, jnp.zeros((b, d), dtype), xs_ref[...])
            xs_ref[...] = jnp.where(alive_b, ev_acc.astype(dtype), base)
        else:
            xs_ref[...] = ev_acc.astype(dtype)

    # ======================================================================
    # phases 1..L: event-net layer (fused_step.py semantics, uniform length)
    # ======================================================================
    @pl.when(p_i > 0)
    def _layer_phase():
        li = p_i - 1
        if ragged:
            # per-slot lengths len0_ref[s] + e_i (exact while a slot is
            # alive; retired slots' outputs are frozen out below, so their
            # drifted geometry is unobservable); block counts/sizes come
            # from the conservative prefetched work tables
            total = total_ref[0]
        else:
            len_e = len0_ref[0] + e_i    # history length for this event
            wpos = len_e                 # append position (wrapper-clipped)
            nb = (len_e + bk - 1) // bk  # cache blocks per slot (uniform)
            nbs = jnp.maximum(nb, 1)
            # GROUPED flash loop: ``group`` consecutive slots share each
            # cache-block DMA — their pool rows (li*batch + s) are adjacent,
            # so ONE strided copy fetches [group, kk, page_size, W].  At
            # bs=32/L=12/nb=2 the per-slot loop costs 2*32*2*12 = 1536
            # scalar DMA waits per event; grouping divides that by G (the
            # round-4 floor accounting attributed the 0.36 ms/event gap to
            # exactly this bookkeeping).
            total = (b // group) * nb
        c_base = e_i * cpe + tk + li * cpl

        x0 = xs_ref[...]
        x = x0

        # ---- qkv + RoPE (wide weight chunk: q|k|v|o one DMA) -------------
        h = _rms_norm(x, ln_ref[0, 0:1], eps)
        s0 = consume(c_base)
        q = _mm(h, wbuf[s0, :, :w])
        k = _mm(h, wbuf[s0, :, w:2 * w])
        v = _mm(h, wbuf[s0, :, 2 * w:3 * w])
        # slot s0 stays live through the o-proj below; refilled there

        cos = cos_e_ref[0]  # [1, W] f32, uniform positions
        sin = sin_e_ref[0]
        half = head_dim // 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        first_half = jax.lax.rem(lane, head_dim) < half

        def rot(xx):
            xf = xx.astype(jnp.float32)
            return jnp.where(first_half,
                             -pltpu.roll(xf, shift=w - half, axis=1),
                             pltpu.roll(xf, shift=half, axis=1))

        qr = (q.astype(jnp.float32) * cos + rot(q) * sin).astype(dtype)
        kr = (k.astype(jnp.float32) * cos + rot(k) * sin).astype(dtype)
        qs32 = qr.astype(jnp.float32) * scale
        qsb = qs32.astype(dtype)

        # ---- fresh-row RMW append: start the tile reads now --------------
        if ragged:
            # per-slot write positions -> per-slot tile DMAs (the uniform
            # one-strided-DMA trick needs equal page/offset across slots;
            # per-slot issues measured ~0.5% on the aligned kernel, r3)
            def wtile_s(ref, s):
                wp = jnp.minimum(len0_ref[s] + e_i, capacity - 1)
                wb = pl.multiple_of(
                    (wp % page_size) // RMW_ROWS * RMW_ROWS, RMW_ROWS)
                return ref.at[li * batch + s, wp // page_size,
                              pl.ds(wb, RMW_ROWS)]

            def start_rmw_in(s, _):
                pltpu.make_async_copy(wtile_s(k_out_ref, s), kwbuf.at[s],
                                      rmwsem.at[s, 0]).start()
                pltpu.make_async_copy(wtile_s(v_out_ref, s), vwbuf.at[s],
                                      rmwsem.at[s, 1]).start()
                return 0

            jax.lax.fori_loop(0, b, start_rmw_in, 0)
        else:
            wbase = pl.multiple_of(
                (wpos % page_size) // RMW_ROWS * RMW_ROWS, RMW_ROWS)

            def wtile_all(ref):
                return ref.at[pl.ds(li * batch, batch), wpos // page_size,
                              pl.ds(wbase, RMW_ROWS)]

            pltpu.make_async_copy(wtile_all(k_out_ref), kwbuf,
                                  rmwsem.at[0, 0]).start()
            pltpu.make_async_copy(wtile_all(v_out_ref), vwbuf,
                                  rmwsem.at[0, 1]).start()

        # ---- paged flash attention over the cached history ---------------
        if ragged:
            def blk_geom(i):
                # one SMEM load each: flat work tables (slot-major)
                return (slot_tbl[i], blk_tbl[i] * ppcb, pages_tbl[i])
        else:
            def blk_geom(i):
                need = ((len_e + page_size - 1) // page_size
                        - jax.lax.rem(i, nbs) * ppcb)
                return (i // nbs, jax.lax.rem(i, nbs) * ppcb,
                        jnp.clip(need, 1, ppcb))

        def _sized(kp, kk, body):
            if exact_tail or ragged:
                pl.when(kp == kk)(body)
            else:
                body()

        def copy_block(i, slot):
            s_i, blk0, kp = blk_geom(i)
            # ragged: s_i is a slot; aligned grouped: s_i is a GROUP index
            row = li * batch + s_i * (1 if ragged else group)
            if not (exact_tail or ragged):
                kp = ppcb
            for kk in (range(1, ppcb + 1) if exact_tail or ragged
                       else (ppcb,)):
                def body(kk=kk):
                    # stream from the OUTPUT refs: aliased to the input
                    # pools on hardware, and earlier events' in-dispatch
                    # appends are visible through them in interpret mode
                    for jj, (src, dst) in enumerate(
                            ((k_out_ref, kbuf), (v_out_ref, vbuf))):
                        if ragged:
                            pltpu.make_async_copy(
                                src.at[row, pl.ds(blk0, kk)],
                                dst.at[slot, pl.ds(0, kk)],
                                csems.at[slot, jj]).start()
                        else:
                            pltpu.make_async_copy(
                                src.at[pl.ds(row, group), pl.ds(blk0, kk)],
                                dst.at[slot, :, pl.ds(0, kk)],
                                csems.at[slot, jj]).start()
                _sized(kp, kk, body)

        def wait_block(i, slot):
            kp = blk_geom(i)[2]
            if not (exact_tail or ragged):
                kp = ppcb
            for kk in (range(1, ppcb + 1) if exact_tail or ragged
                       else (ppcb,)):
                def body(kk=kk):
                    for jj, (src, dst) in enumerate(
                            ((k_out_ref, kbuf), (v_out_ref, vbuf))):
                        if ragged:
                            pltpu.make_async_copy(
                                src.at[0, pl.ds(0, kk)],
                                dst.at[slot, pl.ds(0, kk)],
                                csems.at[slot, jj]).wait()
                        else:
                            pltpu.make_async_copy(
                                src.at[pl.ds(0, group), pl.ds(0, kk)],
                                dst.at[slot, :, pl.ds(0, kk)],
                                csems.at[slot, jj]).wait()
                _sized(kp, kk, body)

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (w, num_heads), 0)
        head_w = jax.lax.broadcasted_iota(jnp.int32, (w, num_heads), 1)
        gmask32 = (lane_w // head_dim == head_w).astype(jnp.float32)
        gt32 = (jax.lax.broadcasted_iota(jnp.int32, (num_heads, w), 1)
                // head_dim
                == jax.lax.broadcasted_iota(jnp.int32, (num_heads, w), 0)
                ).astype(jnp.float32)

        if ragged:
            # aligned phases find blocks 0/1 already in flight (issued by
            # the previous phase via prefetch_layer); ragged keeps the
            # in-phase priming
            @pl.when(total > 0)
            def _():
                copy_block(0, 0)

            @pl.when(total > 1)
            def _():
                copy_block(1, 1)

        if ragged:
            i0 = jnp.zeros((), jnp.int32)
            for s in range(b):
                q_rowb = qsb[s:s + 1, :].astype(jnp.float32)
                nb_s = nbt_ref[s]          # conservative (== the table's)
                len_s = len0_ref[s] + e_i  # exact while the slot is alive

                def blk_loop(j, carry, i0=i0, q_rowb=q_rowb, len_s=len_s):
                    acc, m, l = carry
                    i = i0 + j
                    slot = jax.lax.rem(i, 3)

                    @pl.when(i + 2 < total)
                    def _():
                        copy_block(i + 2, jax.lax.rem(i + 2, 3))

                    wait_block(i, slot)
                    k_blk = kbuf[slot].reshape(bk, w)
                    prod = k_blk.astype(jnp.float32) * q_rowb
                    sc = jax.lax.dot(prod, gmask32,
                                     preferred_element_type=jnp.float32)
                    row = j * bk + jax.lax.broadcasted_iota(jnp.int32,
                                                            sc.shape, 0)
                    sc = jnp.where(row < len_s, sc, -jnp.inf)
                    block_m = jnp.max(sc, axis=0)[:, None]
                    m_new = jnp.maximum(m, block_m)
                    alpha = jnp.exp(m - m_new)
                    acc = acc * alpha
                    l = l * alpha
                    pexp = jnp.exp(sc - m_new.T)
                    # conservative blocks can be ALL-masked (m_new still
                    # -inf): exp(-inf - -inf) = NaN — re-mask like the
                    # streaming kernel (exact: pexp is 0 on live geometry)
                    pexp = jnp.where(row < len_s, pexp, 0.0)
                    l = l + jnp.sum(pexp, axis=0)[:, None]
                    v_blk = vbuf[slot].reshape(bk, w)
                    v_blk = jnp.where(row[:, :1] < len_s, v_blk,
                                      jnp.zeros_like(v_blk))
                    acc = acc + jax.lax.dot(
                        pexp.astype(v_blk.dtype), v_blk,
                        preferred_element_type=jnp.float32,
                        dimension_numbers=(((0,), (0,)), ((), ())))
                    return acc, m_new, l

                init = (jnp.zeros((num_heads, w), jnp.float32),
                        jnp.full((num_heads, 1), -jnp.inf, jnp.float32),
                        jnp.zeros((num_heads, 1), jnp.float32))
                acc, m, l = jax.lax.fori_loop(0, nb_s, blk_loop, init)
                accs_ref[s] = acc
                ms_ref[s:s + 1, :] = m.T
                ls_ref[s:s + 1, :] = l.T
                i0 = i0 + nb_s
        else:
            # grouped: G slots per buffered block, (b//G)*nb iterations.
            # Numerics are bit-identical to the per-slot loop: every score/
            # softmax/PV contraction is still per-slot over the same
            # elements in the same order — only the DMA granularity and the
            # MXU call SIZES change ([G*bk, W] scores, G-batched PV).
            for g in range(b // group):
                q_g = qsb[g * group:(g + 1) * group, :].astype(jnp.float32)

                def blk_loop(j, carry, g=g, q_g=q_g):
                    acc, m, l = carry
                    i = g * nb + j
                    slot = jax.lax.rem(i, 3)

                    @pl.when(i + 2 < total)
                    def _():
                        copy_block(i + 2, jax.lax.rem(i + 2, 3))

                    wait_block(i, slot)
                    k_blk = kbuf[slot].reshape(group, bk, w)
                    prod = (k_blk.astype(jnp.float32)
                            * q_g[:, None, :]).reshape(group * bk, w)
                    sc = jax.lax.dot(prod, gmask32,
                                     preferred_element_type=jnp.float32)
                    sc = sc.reshape(group, bk, num_heads)
                    row = j * bk + jax.lax.broadcasted_iota(
                        jnp.int32, sc.shape, 1)
                    sc = jnp.where(row < len_e, sc, -jnp.inf)
                    block_m = jnp.max(sc, axis=1)            # [G, H]
                    m_new = jnp.maximum(m, block_m)
                    alpha = jnp.exp(m - m_new)
                    acc = acc * alpha[:, :, None]
                    l = l * alpha
                    pexp = jnp.exp(sc - m_new[:, None, :])
                    l = l + jnp.sum(pexp, axis=1)
                    v_blk = vbuf[slot].reshape(group, bk, w)
                    v_blk = jnp.where(row[:, :, :1] < len_e, v_blk,
                                      jnp.zeros_like(v_blk))
                    acc = acc + jax.lax.dot_general(
                        pexp.astype(v_blk.dtype), v_blk,
                        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [G, H, W]
                    return acc, m_new, l

                init = (jnp.zeros((group, num_heads, w), jnp.float32),
                        jnp.full((group, num_heads), -jnp.inf, jnp.float32),
                        jnp.zeros((group, num_heads), jnp.float32))
                acc, m, l = jax.lax.fori_loop(0, nb, blk_loop, init)
                accs_ref[g * group:(g + 1) * group] = acc
                ms_ref[g * group:(g + 1) * group, :] = m
                ls_ref[g * group:(g + 1) * group, :] = l

            # every flash wait is done — slots 0/1 are free.  Prime the
            # NEXT layer's first blocks now so its stream is already
            # flowing while this layer's o-proj + MLP compute (the token
            # phase primes layer 0 of the next event).
            @pl.when(li < n_layers - 1)
            def _():
                prefetch_layer(li + 1)

        # ---- batched self-term merge (fused_step.py math) ----------------
        acc2d = accs_ref[...].reshape(b * num_heads, w)
        gt_tiled = (jax.lax.broadcasted_iota(
            jnp.int32, (b * num_heads, w), 1) // head_dim
            == jax.lax.broadcasted_iota(
                jnp.int32, (b * num_heads, w), 0) % num_heads
        ).astype(jnp.float32)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (b, b * num_heads), 1)
               // num_heads
               == jax.lax.broadcasted_iota(jnp.int32, (b, b * num_heads), 0)
               ).astype(jnp.float32)
        ls2d = ls_ref[...]
        ms2d = ms_ref[...]
        lane_l = jax.lax.dot(ls2d, gt32, preferred_element_type=jnp.float32)
        o_diag = jax.lax.dot(sel, acc2d * gt_tiled,
                             preferred_element_type=jnp.float32) \
            / jnp.maximum(lane_l, 1e-30)
        s_self = jax.lax.dot(qs32 * kr.astype(jnp.float32), gmask32,
                             preferred_element_type=jnp.float32)
        m2 = jnp.maximum(ms2d, s_self)
        w_cache = ls2d * jnp.exp(ms2d - m2)
        w_self = jnp.exp(s_self - m2)
        wc = jax.lax.dot(w_cache, gt32, preferred_element_type=jnp.float32)
        ws = jax.lax.dot(w_self, gt32, preferred_element_type=jnp.float32)
        attn = (wc * o_diag + ws * v.astype(jnp.float32)) / (wc + ws)

        x = x + _mm(attn.astype(dtype), wbuf[s0, :, 3 * w:])
        issue(c_base + n_rot)

        # ---- MLP (wide chunks: gate, up, then down row-packed) -----------
        w4 = 4 * d
        hm = _rms_norm(x, ln_ref[0, 1:2], eps)
        for gi in range(ng):
            sg = consume(c_base + 1 + gi)
            g_ref[:, gi * w4:(gi + 1) * w4] = _mm(hm, wbuf[sg])
            issue(c_base + 1 + gi + n_rot)
        for gi in range(ng):
            su = consume(c_base + 1 + ng + gi)
            gf = g_ref[:, gi * w4:(gi + 1) * w4].astype(jnp.float32)
            g_ref[:, gi * w4:(gi + 1) * w4] = \
                (gf * jax.nn.sigmoid(gf)).astype(dtype) * _mm(hm, wbuf[su])
            issue(c_base + 1 + ng + gi + n_rot)
        out = jnp.zeros((b, d), jnp.float32)
        for gi in range(ng):
            sd = consume(c_base + 1 + 2 * ng + gi)
            for jj in range(4):  # 4 D-row blocks per down chunk
                out = out + jax.lax.dot(
                    g_ref[:, (gi * 4 + jj) * d:(gi * 4 + jj + 1) * d],
                    wbuf[sd, :, jj * d:(jj + 1) * d],
                    preferred_element_type=jnp.float32)
            issue(c_base + 1 + 2 * ng + gi + n_rot)
        x = x + out.astype(dtype)
        if ragged:
            alive_b = alive_ref[...] > 0  # [B, 1], pre-event value
            x = jnp.where(alive_b, x, x0)  # freeze retired slots' residual
        xs_ref[...] = x

        @pl.when((e_i == n_e - 1) & (li == n_layers - 1))
        def _():
            xout_ref[...] = x

        if ragged:
            # ---- finish the RMW append (per-slot tiles) -------------------
            def wait_rmw_in(s, _):
                pltpu.make_async_copy(wtile_s(k_out_ref, s), kwbuf.at[s],
                                      rmwsem.at[s, 0]).wait()
                pltpu.make_async_copy(wtile_s(v_out_ref, s), vwbuf.at[s],
                                      rmwsem.at[s, 1]).wait()
                return 0

            jax.lax.fori_loop(0, b, wait_rmw_in, 0)
            # per-slot in-tile offset (RMW_ROWS divides page_size, so
            # offset-in-tile == wpos mod RMW_ROWS); retired slots blend
            # NOTHING — their tile writes back byte-identical
            wpv = jnp.minimum(lens0v_ref[...] + e_i, capacity - 1)  # [B, 1]
            offv = jax.lax.rem(wpv, RMW_ROWS)[:, :, None]           # [B,1,1]
            selr = (jax.lax.broadcasted_iota(
                jnp.int32, (b, RMW_ROWS, w), 1) == offv) \
                & alive_b[:, :, None]
            kwbuf[...] = jnp.where(
                selr, jnp.broadcast_to(kr[:, None, :], (b, RMW_ROWS, w)),
                kwbuf[...])
            vwbuf[...] = jnp.where(
                selr, jnp.broadcast_to(v[:, None, :], (b, RMW_ROWS, w)),
                vwbuf[...])

            def start_rmw_out(s, _):
                pltpu.make_async_copy(kwbuf.at[s], wtile_s(k_out_ref, s),
                                      rmwsem.at[s, 0]).start()
                pltpu.make_async_copy(vwbuf.at[s], wtile_s(v_out_ref, s),
                                      rmwsem.at[s, 1]).start()
                return 0

            def wait_rmw_out(s, _):
                pltpu.make_async_copy(kwbuf.at[s], wtile_s(k_out_ref, s),
                                      rmwsem.at[s, 0]).wait()
                pltpu.make_async_copy(vwbuf.at[s], wtile_s(v_out_ref, s),
                                      rmwsem.at[s, 1]).wait()
                return 0

            jax.lax.fori_loop(0, b, start_rmw_out, 0)
            jax.lax.fori_loop(0, b, wait_rmw_out, 0)

            # ---- retirement: the eos row itself went through the event
            # net (split-path parity); nothing after it does.  Updated at
            # the LAST layer phase so every phase of event e saw the
            # pre-event alive/lengths.
            @pl.when(li == n_layers - 1)
            def _():
                tok0 = rows_ref[0, :, 0:1]  # [B, 1] i32
                new_len = lens0v_ref[...] + e_i + 1
                alive_new = alive_b & (tok0 != eos_id) & (new_len < capacity)
                alive_ref[...] = alive_new.astype(jnp.int32)
        else:
            # ---- finish the RMW append (uniform: one strided DMA each) ---
            off0 = wpos % page_size - wbase
            selr = jax.lax.broadcasted_iota(
                jnp.int32, (b, RMW_ROWS, w), 1) == off0
            pltpu.make_async_copy(wtile_all(k_out_ref), kwbuf,
                                  rmwsem.at[0, 0]).wait()
            kwbuf[...] = jnp.where(
                selr, jnp.broadcast_to(kr[:, None, :], (b, RMW_ROWS, w)),
                kwbuf[...])
            pltpu.make_async_copy(kwbuf, wtile_all(k_out_ref),
                                  rmwsem.at[0, 0]).start()
            pltpu.make_async_copy(wtile_all(v_out_ref), vwbuf,
                                  rmwsem.at[0, 1]).wait()
            vwbuf[...] = jnp.where(
                selr, jnp.broadcast_to(v[:, None, :], (b, RMW_ROWS, w)),
                vwbuf[...])
            pltpu.make_async_copy(vwbuf, wtile_all(v_out_ref),
                                  rmwsem.at[0, 1]).start()
            pltpu.make_async_copy(kwbuf, wtile_all(k_out_ref),
                                  rmwsem.at[0, 0]).wait()
            pltpu.make_async_copy(vwbuf, wtile_all(v_out_ref),
                                  rmwsem.at[0, 1]).wait()


def prepare_merged(params: dict):
    """Stack the event-net layer weights into the uniform [D, 4D] chunk
    stream — WIDE chunks so the rotation waits ~4x less often (192 scalar-
    core DMA waits per event at [D, D] granularity measured ~0.5% of
    headline each; 48 at this width).  Per layer:

      chunk 0:        q | k | v | o          (lane-packed, one DMA)
      chunks 1..ng:   gate, 4 D-column blocks per chunk
      chunks ..2ng:   up, same
      chunks ..3ng:   down, 4 D-ROW blocks packed side-by-side along lanes
                      (chunk[:, j*D:(j+1)*D] = w_down[(4g+j)*D:, :][:D]) —
                      row-major streaming without any transposed matmul

    Zero-padded when the MLP width is not a 4D multiple — exact: padded
    columns/rows contribute nothing.  One HBM copy per decode chunk,
    hoisted outside the event loop by the caller (same contract as
    fused_step.prepare_fused)."""
    lp = params["net"]["layers"]
    l_n, dd, ww = lp["wq"].shape
    assert dd == ww, "merged kernel needs hidden == heads*head_dim"
    ff = lp["w_gate"].shape[-1]
    nf = (ff + dd - 1) // dd          # D-column/row blocks in the MLP
    ng = (nf + 3) // 4                # [D, 4D] chunks per MLP matrix
    pad = ng * 4 * dd - ff

    qkvo = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"], lp["wo"]],
                           axis=-1)  # [L, D, 4D]

    def cols(m):  # [L, D, F] -> [L, ng, D, 4D]
        m = jnp.pad(m, ((0, 0), (0, 0), (0, pad)))
        return jnp.swapaxes(m.reshape(l_n, dd, ng, 4 * dd), 1, 2)

    def rows4(m):  # [L, F, D] -> [L, ng, D, 4D], 4 row-blocks per chunk
        m = jnp.pad(m, ((0, 0), (0, pad), (0, 0)))
        m = m.reshape(l_n, ng, 4, dd, dd)
        return jnp.transpose(m, (0, 1, 3, 2, 4)).reshape(
            l_n, ng, dd, 4 * dd)

    parts = jnp.concatenate([
        qkvo[:, None], cols(lp["w_gate"]), cols(lp["w_up"]),
        rows4(lp["w_down"]),
    ], axis=1)  # [L, cpl, D, 4D]
    return {
        "chunks": parts.reshape(l_n * (1 + 3 * ng), dd, 4 * dd),
        "ln": jnp.stack([lp["ln_attn"], lp["ln_mlp"]], axis=1),
        "final_norm": params["net"]["final_norm"],
    }


@functools.partial(jax.jit, static_argnames=(
    "cfg", "page_size", "pages_per_slot", "n_events", "ppcb", "greedy",
    "exact_tail", "n_rot", "interpret"))
def merged_decode_events(merged: dict, cfg, hidden: jax.Array,
                         pools: PagedPools, len0, temp, top_p, top_k,
                         gumbel: jax.Array, *, page_size: int,
                         pages_per_slot: int, n_events: int,
                         ppcb: int = 4, greedy: bool = False,
                         exact_tail: bool = True, n_rot: int = 4,
                         interpret: bool = False):
    """Decode ``n_events`` full event rows in ONE kernel dispatch.

    merged: :func:`prepare_merged` output merged with the token-net arrays
    (the caller builds it once per chunk via :func:`prepare_inputs`);
    hidden [B, D]: normed event-net hidden conditioning the first row;
    len0: scalar uniform history length (the caller guarantees
    ``len0 + n_events <= capacity``); gumbel [E, t_max*B, K_CAP].

    Returns (rows [E, B, T] i32, xout [B, D] un-normed residual, pools).
    """
    cfgn = cfg.net
    b, d = hidden.shape
    assert b <= 64, (
        f"merged event-loop kernel supports batch <= 64, got {b} "
        "(per-slot flash loops are unrolled; use the split path above)")
    w = cfgn.num_heads * cfgn.head_dim
    assert w == d and cfgn.kv_heads == cfgn.num_heads
    assert head_stride(cfgn.head_dim, cfgn.num_heads) == cfgn.head_dim
    l_n = merged["ln"].shape[0]
    t_max = cfg.tokenizer.max_token_seq
    tok_cfg = cfg.net_token
    # placeholder MLP entries mark the streamed-token-MLP layout (the real
    # gate|up|down chunks are appended to the event-net chunk stream)
    stream_tok = merged["wg_t"].shape[1] == 1
    n_stored = merged["chunks"].shape[0]
    cpl = (n_stored - (tok_cfg.num_layers if stream_tok else 0)) // l_n
    ng = (cpl - 1) // 3
    dtype = merged["chunks"].dtype
    n_ev_types = merged["steps"].shape[0] // t_max

    from ..models.llama import rope_cos_sin
    from .sampler import _per_row

    len0 = jnp.asarray(len0, jnp.int32).reshape(())
    # uniform per-event RoPE tables [E, W]
    cos_e, sin_e = rope_cos_sin(len0 + jnp.arange(n_events), cfgn.head_dim,
                                cfgn.rope_theta)  # [E, dh]
    # [E, 1, W]: the unit sublane dim keeps the (1, 1, W) block legal
    cos_e = jnp.tile(cos_e, (1, cfgn.num_heads)).astype(jnp.float32)[:, None]
    sin_e = jnp.tile(sin_e, (1, cfgn.num_heads)).astype(jnp.float32)[:, None]
    cos_t, sin_t = rope_cos_sin(jnp.arange(t_max), tok_cfg.head_dim,
                                tok_cfg.rope_theta)

    # grouped flash loop: largest group whose 3-deep [G, ppcb, ps, W] k+v
    # rotation still fits the VMEM budget next to the token-net residency
    # (the budget math below); G divides b so every group is full
    tok_bytes = sum(int(np.prod(merged[n].shape)) * merged[n].dtype.itemsize
                    for n in ("wq_t", "wk_t", "wv_t", "wo_t", "wg_t", "wu_t",
                              "wd_t", "lm", "emb_t", "emb_net", "steps"))
    vocab = merged["lm"].shape[-1]
    bk = ppcb * page_size

    def _vmem_limit(g):
        # the grouped flash loop's spilled [G, H, W] f32 carries push the
        # compiler's stack temporaries past the base slack — measured
        # 118.92M demand at G=8/medium vs 110.9M accounted (2026-08-19)
        scratch = (b * d + b * ng * 4 * d + n_rot * d * 4 * d) * 2 \
            + 3 * 2 * g * bk * w * 2 + 2 * b * RMW_ROWS * w * 2 \
            + b * cfgn.num_heads * (w + 2) * 4 + b * vocab * 4
        return int(tok_bytes) + int(scratch) + _SLACK_BYTES + (2 << 20)

    group = next((g for g in (8, 4, 2, 1)
                  if b % g == 0 and _vmem_limit(g) <= 122 << 20), 1)

    kernel = functools.partial(
        _event_loop_kernel, batch=b, num_heads=cfgn.num_heads,
        head_dim=cfgn.head_dim, hidden=d, ng=ng,
        page_size=page_size, ppcb=ppcb, pages_per_slot=pages_per_slot,
        n_layers=l_n, eps=cfgn.rms_norm_eps, exact_tail=exact_tail,
        n_rot=n_rot, t_layers=tok_cfg.num_layers, t_heads=tok_cfg.num_heads,
        t_head_dim=tok_cfg.head_dim, t_max=t_max, n_events=n_ev_types,
        t_eps=tok_cfg.rms_norm_eps, eos_id=int(cfg.tokenizer.eos_id),
        greedy=greedy, stream_tok=stream_tok, group=group)

    pool_shape = pools.k.shape
    assert not pools.quantized, "merged kernel serves bf16 pools"
    assert pool_shape[0] == l_n * b * pages_per_slot, pool_shape
    k4 = pools.k.reshape(l_n * b, pages_per_slot, page_size, -1)
    v4 = pools.v.reshape(l_n * b, pages_per_slot, page_size, -1)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_events, l_n + 1),
        in_specs=[
            vmem,                                                # hidden0
            any_,                                                # chunks
            pl.BlockSpec((1, 2, d), lambda e, p, *_: (jnp.maximum(p, 1) - 1,
                                                  0, 0)),        # ln
            vmem,                                                # final_norm
            pl.BlockSpec((1, 1, w), lambda e, p, *_: (e, 0, 0)),     # cos_e
            pl.BlockSpec((1, 1, w), lambda e, p, *_: (e, 0, 0)),     # sin_e
            vmem, vmem, vmem,                                    # knobs
        ] + [vmem] * 18                                # token net + cos/sin
        + [pl.BlockSpec((1, t_max * b, K_CAP),
                        lambda e, p, *_: (e, 0, 0))]                 # gumbel
        + [any_, any_],                                          # pools
        out_specs=[
            pl.BlockSpec((1, b, t_max), lambda e, p, *_: (e, 0, 0)),  # rows
            vmem,                                                 # xout
            any_, any_,                                           # pools out
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), dtype),                   # xs residual
            pltpu.VMEM((b, ng * 4 * d), dtype),          # g / gated
            pltpu.VMEM((n_rot, d, 4 * d), dtype),        # weight rotation
            pltpu.SemaphoreType.DMA((n_rot,)),
            pltpu.VMEM((3, group, ppcb, page_size, w), pools.k.dtype),
            pltpu.VMEM((3, group, ppcb, page_size, w), pools.v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.VMEM((b, RMW_ROWS, w), pools.k.dtype),  # RMW tiles
            pltpu.VMEM((b, RMW_ROWS, w), pools.v.dtype),
            pltpu.SemaphoreType.DMA((1, 2)),
            pltpu.VMEM((b, cfgn.num_heads, w), jnp.float32),
            pltpu.VMEM((b, cfgn.num_heads), jnp.float32),
            pltpu.VMEM((b, cfgn.num_heads), jnp.float32),
            pltpu.VMEM((b, vocab), jnp.float32),          # sampler work
        ],
    )
    # VMEM budget: token-net residency (~56 MB) + R weight-chunk slots +
    # grouped cache stream + RMW tiles + parked flash state + sampler work
    vmem_limit = _vmem_limit(group)

    topk = _per_row(top_k, b, jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_events, b, t_max), jnp.int32),
            jax.ShapeDtypeStruct((b, d), dtype),
            jax.ShapeDtypeStruct(k4.shape, k4.dtype),
            jax.ShapeDtypeStruct(v4.shape, v4.dtype),
        ],
        input_output_aliases={30: 2, 31: 3},  # 2 scalars + 28 ins
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        len0.reshape(1), jnp.max(topk).reshape(1),
        hidden.astype(dtype), merged["chunks"], merged["ln"],
        merged["final_norm"].reshape(1, d).astype(dtype), cos_e, sin_e,
        _per_row(temp, b, jnp.float32), _per_row(top_p, b, jnp.float32),
        topk,
        merged["wq_t"], merged["wk_t"], merged["wv_t"], merged["wo_t"],
        merged["wg_t"], merged["wu_t"], merged["wd_t"],
        merged["lna_t"], merged["lnm_t"], merged["fnorm_t"],
        merged["lm"], merged["emb_t"], merged["emb_net"],
        merged["first"], merged["steps"], merged["pad_only"],
        cos_t, sin_t, gumbel, k4, v4,
    )
    rows, xout, k_new, v_new = outs
    return rows, xout, PagedPools(k=k_new.reshape(pool_shape),
                                  v=v_new.reshape(pool_shape))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "page_size", "pages_per_slot", "n_events", "ppcb", "greedy",
    "n_rot", "interpret"))
def merged_decode_ragged(merged: dict, cfg, hidden: jax.Array,
                         pools: PagedPools, index, active, allow,
                         temp, top_p, top_k, gumbel: jax.Array, *,
                         page_size: int, pages_per_slot: int, n_events: int,
                         ppcb: int = 4, greedy: bool = False, n_rot: int = 4,
                         interpret: bool = False):
    """Ragged (continuous-batching) variant of :func:`merged_decode_events`:
    per-slot history lengths, per-slot retirement (eos / cache capacity),
    per-slot sampling knobs + constraint planes + seed streams.

    index [B] i32: per-slot history length at chunk start; active [B] bool:
    host-side slot occupancy (inactive slots emit pad rows and are skipped
    by the cache stream); allow [B, V]: 0/1 constraint plane (all-ones for
    unconstrained); gumbel [E, t_max*B, K_CAP]: per-slot per-position draw
    streams (the caller derives them from fold_in(PRNGKey(seed_s),
    index_s + e) — a slot's stream depends only on its request's seed and
    its sequence position, batcher seed semantics).

    Returns (rows [E, B, T] i32, xout [B, D], pools).  Semantics match
    serve/batcher._step_impl's split scan slot-for-slot: the eos row itself
    goes through the event net, nothing after it does; retired slots emit
    pad rows, stop appending, and keep their residual frozen (xout for a
    slot that was ALREADY inactive at entry is zeros — unobservable, the
    batcher overwrites hidden on admission).  The new per-slot index is
    derivable host-side as ``index + sum_e(rows[e, :, 0] != pad_id)``.

    Reference capability: concurrent gradio sessions over the torch
    generate loop (/root/reference/app.py:27-120, :496) — here one kernel
    dispatch advances every live session by ``n_events`` events.
    """
    cfgn = cfg.net
    b, d = hidden.shape
    assert b <= 64, f"ragged merged kernel supports <= 64 slots, got {b}"
    w = cfgn.num_heads * cfgn.head_dim
    assert w == d and cfgn.kv_heads == cfgn.num_heads
    assert head_stride(cfgn.head_dim, cfgn.num_heads) == cfgn.head_dim
    l_n = merged["ln"].shape[0]
    t_max = cfg.tokenizer.max_token_seq
    tok_cfg = cfg.net_token
    stream_tok = merged["wg_t"].shape[1] == 1
    n_stored = merged["chunks"].shape[0]
    cpl = (n_stored - (tok_cfg.num_layers if stream_tok else 0)) // l_n
    ng = (cpl - 1) // 3
    dtype = merged["chunks"].dtype
    n_ev_types = merged["steps"].shape[0] // t_max
    capacity = page_size * pages_per_slot

    from ..models.llama import rope_cos_sin
    from .sampler import _per_row

    index = jnp.asarray(index, jnp.int32).reshape(b)
    active = jnp.asarray(active).reshape(b)
    # conservative per-slot lengths: one work table serves all E events
    # (blocks beyond the current length are exact no-ops in the flash loop);
    # slots inactive at entry stream nothing
    len_cons = jnp.where(active, jnp.minimum(index + n_events, capacity), 0)
    bk = ppcb * page_size
    nbt = (len_cons + bk - 1) // bk
    cum = jnp.cumsum(nbt)
    total = cum[-1:].astype(jnp.int32)
    max_total = b * max(pages_per_slot // ppcb, 1)
    flat = jnp.arange(max_total, dtype=jnp.int32)
    slot_tbl = jnp.minimum(jnp.searchsorted(cum, flat, side="right"),
                           b - 1).astype(jnp.int32)
    blk_tbl = (flat - (cum - nbt)[slot_tbl]).astype(jnp.int32)
    pages_tbl = jnp.clip(
        (len_cons[slot_tbl] + page_size - 1) // page_size
        - blk_tbl * ppcb, 1, ppcb).astype(jnp.int32)

    # per-(event, slot) RoPE tables: position index_s + e (exact while the
    # slot is alive; retired slots' drifted values are frozen out)
    pos = index[None, :] + jnp.arange(n_events, dtype=jnp.int32)[:, None]
    cos_e, sin_e = rope_cos_sin(pos.reshape(-1), cfgn.head_dim,
                                cfgn.rope_theta)  # [E*B, dh]
    cos_e = jnp.tile(cos_e, (1, cfgn.num_heads)).astype(
        jnp.float32).reshape(n_events, b, w)
    sin_e = jnp.tile(sin_e, (1, cfgn.num_heads)).astype(
        jnp.float32).reshape(n_events, b, w)
    cos_t, sin_t = rope_cos_sin(jnp.arange(t_max), tok_cfg.head_dim,
                                tok_cfg.rope_theta)

    kernel = functools.partial(
        _event_loop_kernel, batch=b, num_heads=cfgn.num_heads,
        head_dim=cfgn.head_dim, hidden=d, ng=ng,
        page_size=page_size, ppcb=ppcb, pages_per_slot=pages_per_slot,
        n_layers=l_n, eps=cfgn.rms_norm_eps, exact_tail=True,
        n_rot=n_rot, t_layers=tok_cfg.num_layers, t_heads=tok_cfg.num_heads,
        t_head_dim=tok_cfg.head_dim, t_max=t_max, n_events=n_ev_types,
        t_eps=tok_cfg.rms_norm_eps, eos_id=int(cfg.tokenizer.eos_id),
        greedy=greedy, stream_tok=stream_tok, ragged=True)

    pool_shape = pools.k.shape
    assert not pools.quantized, "merged kernel serves bf16 pools"
    assert pool_shape[0] == l_n * b * pages_per_slot, pool_shape
    k4 = pools.k.reshape(l_n * b, pages_per_slot, page_size, -1)
    v4 = pools.v.reshape(l_n * b, pages_per_slot, page_size, -1)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    vocab = merged["lm"].shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_events, l_n + 1),
        in_specs=[
            vmem,                                                # hidden0
            any_,                                                # chunks
            pl.BlockSpec((1, 2, d), lambda e, p, *_: (jnp.maximum(p, 1) - 1,
                                                  0, 0)),        # ln
            vmem,                                                # final_norm
            pl.BlockSpec((1, b, w), lambda e, p, *_: (e, 0, 0)),     # cos_e
            pl.BlockSpec((1, b, w), lambda e, p, *_: (e, 0, 0)),     # sin_e
            vmem, vmem, vmem,                                    # knobs
        ] + [vmem] * 18                                # token net + cos/sin
        + [pl.BlockSpec((1, t_max * b, K_CAP),
                        lambda e, p, *_: (e, 0, 0))]                 # gumbel
        + [vmem, vmem, vmem]                    # active0, lens0v, allow
        + [any_, any_],                                          # pools
        out_specs=[
            pl.BlockSpec((1, b, t_max), lambda e, p, *_: (e, 0, 0)),  # rows
            vmem,                                                 # xout
            any_, any_,                                           # pools out
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), dtype),                   # xs residual
            pltpu.VMEM((b, ng * 4 * d), dtype),          # g / gated
            pltpu.VMEM((n_rot, d, 4 * d), dtype),        # weight rotation
            pltpu.SemaphoreType.DMA((n_rot,)),
            pltpu.VMEM((3, ppcb, page_size, w), pools.k.dtype),
            pltpu.VMEM((3, ppcb, page_size, w), pools.v.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.VMEM((b, RMW_ROWS, w), pools.k.dtype),  # RMW tiles
            pltpu.VMEM((b, RMW_ROWS, w), pools.v.dtype),
            pltpu.SemaphoreType.DMA((b, 2)),              # per-slot RMW sems
            pltpu.VMEM((b, cfgn.num_heads, w), jnp.float32),
            pltpu.VMEM((b, cfgn.num_heads), jnp.float32),
            pltpu.VMEM((b, cfgn.num_heads), jnp.float32),
            pltpu.VMEM((b, vocab), jnp.float32),          # sampler work
            pltpu.VMEM((b, 1), jnp.int32),                # alive
        ],
    )
    tok_bytes = sum(int(np.prod(merged[n].shape)) * merged[n].dtype.itemsize
                    for n in ("wq_t", "wk_t", "wv_t", "wo_t", "wg_t", "wu_t",
                              "wd_t", "lm", "emb_t", "emb_net", "steps"))
    scratch_bytes = (b * d + b * ng * 4 * d + n_rot * d * 4 * d) * 2 \
        + 3 * 2 * bk * w * 2 + 2 * b * RMW_ROWS * w * 2 \
        + b * cfgn.num_heads * (w + 2) * 4 + b * vocab * 4 \
        + b * vocab * 2 + 2 * b * w * 4  # allow plane + cos/sin blocks
    # ragged extras (per-slot RMW semaphores, gumbel/rows double-buffered
    # windows, the bigger scalar tables) measured ~1 MB over the aligned
    # formula on the live compiler — 4 MB headroom on top of _SLACK_BYTES
    vmem_limit = int(tok_bytes) + int(scratch_bytes) + _SLACK_BYTES \
        + (4 << 20)

    topk = _per_row(top_k, b, jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_events, b, t_max), jnp.int32),
            jax.ShapeDtypeStruct((b, d), dtype),
            jax.ShapeDtypeStruct(k4.shape, k4.dtype),
            jax.ShapeDtypeStruct(v4.shape, v4.dtype),
        ],
        input_output_aliases={38: 2, 39: 3},  # 7 scalars + 31 ins
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        index, jnp.max(topk).reshape(1),
        slot_tbl, blk_tbl, pages_tbl, nbt.astype(jnp.int32), total,
        hidden.astype(dtype), merged["chunks"], merged["ln"],
        merged["final_norm"].reshape(1, d).astype(dtype), cos_e, sin_e,
        _per_row(temp, b, jnp.float32), _per_row(top_p, b, jnp.float32),
        topk,
        merged["wq_t"], merged["wk_t"], merged["wv_t"], merged["wo_t"],
        merged["wg_t"], merged["wu_t"], merged["wd_t"],
        merged["lna_t"], merged["lnm_t"], merged["fnorm_t"],
        merged["lm"], merged["emb_t"], merged["emb_net"],
        merged["first"], merged["steps"], merged["pad_only"],
        cos_t, sin_t, gumbel,
        active.astype(jnp.int32)[:, None], index[:, None],
        allow.astype(jnp.bfloat16),
        k4, v4,
    )
    rows, xout, k_new, v_new = outs
    return rows, xout, PagedPools(k=k_new.reshape(pool_shape),
                                  v=v_new.reshape(pool_shape))


def _tok_mlp_chunks(params: dict):
    """Pack each token layer's gate|up|down into ONE uniform [D, 4D] chunk
    for the weight rotation: gate columns, up columns, and down ROWS each
    zero-padded from the token FFN width to D (padded lanes multiply
    through as exact 0.0 in every f32 accumulation, so sampled rows stay
    bit-identical to the resident path), plus a zero [D, D] filler."""
    lp = params["net_token"]["layers"]
    tl, dd, ft = lp["w_gate"].shape
    assert ft <= dd, "stream_tok needs token FFN width <= hidden"
    padc = ((0, 0), (0, 0), (0, dd - ft))
    padr = ((0, 0), (0, dd - ft), (0, 0))
    return jnp.concatenate(
        [jnp.pad(lp["w_gate"], padc), jnp.pad(lp["w_up"], padc),
         jnp.pad(lp["w_down"], padr),
         jnp.zeros((tl, dd, dd), lp["w_gate"].dtype)], axis=-1)


def prepare_inputs(params: dict, config, masks, stream_tok_mlp: bool = None):
    """Everything :func:`merged_decode_events` needs that is loop-invariant:
    the event-net chunk stream (:func:`prepare_merged`) plus the token-net
    weight arrays and mask tables, keyed exactly like token_loop's inputs.

    ``stream_tok_mlp`` (default: auto by resident size) moves the token
    net's gate/up/down out of VMEM residency and into the chunk rotation —
    what lets tv2o-large's 6-layer token net fit the 128 MB VMEM: its
    attention weights + lm_head + embeds (~69 MB) stay resident while the
    36 MB of MLP weights re-stream once per token step.  The mode is
    encoded in the returned arrays (appended chunks + placeholder MLP
    entries), so :func:`merged_decode_events` derives it from shapes."""
    if stream_tok_mlp is None:
        stream_tok_mlp = _resident_bytes(params) > _RESIDENT_CAP
    merged = prepare_merged(params)
    lp = params["net_token"]["layers"]
    d = params["lm_head"].shape[0]
    dtype = params["lm_head"].dtype
    first, steps_tbl, pad_only = masks
    n_ev, t_max, vocab = steps_tbl.shape
    if stream_tok_mlp:
        merged["chunks"] = jnp.concatenate(
            [merged["chunks"], _tok_mlp_chunks(params).astype(dtype)], axis=0)
        dummy = jnp.zeros((1, 1, LANE), dtype)
        wg, wu, wd = dummy, dummy, dummy
    else:
        wg, wu, wd = lp["w_gate"], lp["w_up"], lp["w_down"]
    merged.update({
        "wq_t": lp["wq"], "wk_t": lp["wk"], "wv_t": lp["wv"],
        "wo_t": lp["wo"], "wg_t": wg, "wu_t": wu,
        "wd_t": wd, "lna_t": lp["ln_attn"], "lnm_t": lp["ln_mlp"],
        "fnorm_t": params["net_token"]["final_norm"].reshape(1, d),
        "lm": params["lm_head"].astype(dtype),
        "emb_t": params["net_token"]["embed"].astype(dtype),
        "emb_net": params["net"]["embed"].astype(dtype),
        "first": first.astype(jnp.float32)[None, :],
        "steps": jnp.swapaxes(steps_tbl.astype(jnp.bfloat16), 0, 1
                              ).reshape(t_max * n_ev, vocab),
        "pad_only": pad_only.astype(jnp.float32)[None, :],
    })
    return merged


_ENABLED = True
EVENTS_PER_DISPATCH = 8


def set_enabled(v: bool):
    """Toggle the merged kernel (A/B benchmarks, strict-parity runs)."""
    global _ENABLED
    _ENABLED = v


_RESIDENT_CAP = 80 << 20


def _resident_bytes(params: dict) -> int:
    """Token-net weights + lm_head + both embed tables: what the token
    phase keeps VMEM-resident for the whole dispatch."""
    leaves = list(jax.tree_util.tree_leaves(params["net_token"]))
    leaves += [params["lm_head"], params["net"]["embed"]]
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)


def _mlp_bytes(params: dict) -> int:
    lp = params["net_token"]["layers"]
    return sum(int(np.prod(lp[n].shape)) * lp[n].dtype.itemsize
               for n in ("w_gate", "w_up", "w_down"))


def plan_layout(params: dict, config, b: int):
    """Pick the token-phase layout for a ``b``-slot dispatch, VMEM-aware.

    Returns ``stream_tok_mlp`` (bool) if a layout fits the physical VMEM,
    else None (caller falls back to the split per-event path).

    Measured envelope (v5e compile reports, 2026-08-19): the kernel's
    slot-scaled stack demand (logits + gumbel staging + flash scratch +
    spills) outgrows the physical VMEM above 32 slots in EVERY layout —
    medium/64 resident: 123.95 M demand vs a 117.65 M stack limit;
    medium/64 streamed: 104.99 M vs 99.65 M (streaming shrinks the demand
    AND the available stack — the extra chunk-stream entries reserve
    VMEM); large/64 is strictly bigger.  At <= 32 slots both models fit
    (medium resident, large streamed; 22.8k / 11.2k ev/s sustained).  So:
    b <= 32 picks the layout by residency; b > 32 is a split-path verdict.
    """
    if b > 32:
        return None
    res = _resident_bytes(params)
    if res <= _RESIDENT_CAP:
        return False
    if (config.net_token.intermediate_size <= config.net_token.hidden_size
            and res - _mlp_bytes(params) <= _RESIDENT_CAP):
        return True
    return None


def usable(params: dict, config, pools: PagedPools) -> bool:
    """TPU serving configuration: bf16 weights + pools, MHA, hidden ==
    heads*head_dim (uniform chunk shapes), and a token net that fits the
    128 MB VMEM next to the weight rotation + cache stream — either fully
    resident (tv2o-medium: ~63 MB) or with its MLP streamed through the
    chunk rotation (stream_tok_mlp: tv2o-large's 6-layer token net is
    ~105 MB resident but ~69 MB once gate/up/down ride the stream)."""
    cfgn = config.net
    res = _resident_bytes(params)
    tok_fits = (res <= _RESIDENT_CAP
                or (config.net_token.intermediate_size
                    <= config.net_token.hidden_size
                    and res - _mlp_bytes(params) <= _RESIDENT_CAP))
    return (_ENABLED and jax.default_backend() == "tpu"
            and params["lm_head"].dtype == jnp.bfloat16
            and not pools.quantized
            and cfgn.kv_heads == cfgn.num_heads
            and cfgn.num_heads * cfgn.head_dim == cfgn.hidden_size
            and head_stride(cfgn.head_dim, cfgn.num_heads) == cfgn.head_dim
            and tok_fits)
