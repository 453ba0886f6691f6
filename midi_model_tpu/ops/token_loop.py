"""Fused token-row decode kernel: the whole 8-step inner loop in one dispatch.

The hierarchical model decodes each event row with 8 sequential token-net
steps (3-layer Llama + shared lm_head + grammar mask + top-p/top-k sample,
/root/reference/midi_model.py:192-250).  As an XLA ``lax.scan`` every step
re-reads all ~59 MB of token-net + lm_head + embed weights from HBM — ~470 MB
per event, ~65% of the token-loop's time at bs=32.

This kernel keeps the weights RESIDENT IN VMEM (~56 MB bf16, well under the
v5e's 128 MB) and runs all 8 steps in one ``pallas_call``:

- steps and layers are statically unrolled (T=8, L=3), so the per-step KV
  "cache" is just live values — no dynamic indexing anywhere;
- attention is exact masked softmax over the 0..j cached positions, computed
  per-head on the VPU (shapes are [B, 256] — far below MXU tile size);
- projections/lm_head/embed-lookup run on the MXU (embed lookup as a one-hot
  matmul, the TPU-native gather);
- grammar masks are applied in-kernel (per-row event-type one-hot × the
  precomputed step table, masks.py semantics);
- sampling is the iterative descending extraction of ops/sampler.py
  (reference-exact keep semantics, Gumbel-argmax draw, top-p early stop).

Numerics match models/llama.forward exactly: bf16 matmul outputs (MXU f32
accumulate, bf16 result), f32 RMSNorm/RoPE/softmax, probs cast to bf16 before
the value contraction.  Measured on v5e at bs=32: 0.78 ms/event-row (XLA
scan) -> ~0.20 ms (this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_CAP = 128  # == sampling.topk_topp.K_CAP (max top_k the UI offers)
LANE = 128


def _mm(a, b):
    """bf16 matmul with f32 MXU accumulate, result truncated to the input
    dtype — bit-identical to XLA's ``a @ b`` on TPU (Mosaic requires the
    32-bit accumulator to be explicit)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return w * xf.astype(x.dtype)


def _rope(x, cos, sin):
    """x [B, dh] (one head), cos/sin [1, dh] f32."""
    dh = x.shape[-1]
    x1 = x[:, : dh // 2]
    x2 = x[:, dh // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    out = x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin
    return out.astype(x.dtype)


def _sample(probs, g_step, work_ref, top_p, top_k, max_k, greedy: bool,
            k_cap: int):
    """One categorical draw per row. probs [B, V] f32 (masked, unnormalized);
    g_step [B, k_cap] Gumbel noise; top_p/top_k [B, 1] per-row knobs,
    max_k their scalar loop bound.  Same extraction loop as ops/sampler.py."""
    b, v = probs.shape
    if greedy:
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        m = jnp.max(probs, axis=1, keepdims=True)
        return jnp.min(jnp.where(probs == m, lane, v), axis=1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
    g_lane = jax.lax.broadcasted_iota(jnp.int32, (b, k_cap), 1)
    work_ref[...] = probs

    def extract(j, carry):
        best, bidx, texcl = carry
        w = work_ref[...]
        m = jnp.max(w, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(w == m, lane, v), axis=1, keepdims=True)
        keep = (texcl <= top_p) & (j < top_k)
        gj = jnp.sum(jnp.where(g_lane == j, g_step, 0.0), axis=1,
                     keepdims=True)
        score = jnp.where(keep, jnp.log(m) + gj, -jnp.inf)
        upd = score > best
        best = jnp.where(upd, score, best)
        bidx = jnp.where(upd, idx, bidx)
        work_ref[...] = jnp.where(lane == idx, 0.0, w)
        return best, bidx, texcl + m

    def body(j, carry):
        n_active = jnp.sum((carry[2] <= top_p).astype(jnp.int32))
        return jax.lax.cond(n_active > 0, extract, lambda _, c: c, j, carry)

    init = (jnp.full((b, 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, 1), jnp.int32),
            jnp.zeros((b, 1), jnp.float32))
    n_iter = jnp.minimum(max_k, k_cap)
    _, bidx, _ = jax.lax.fori_loop(0, n_iter, body, init)
    return bidx[:, 0]


def _token_row_kernel(maxk_ref, temp_ref, topp_ref, topk_ref, hidden_ref,
                      wq_ref, wk_ref, wv_ref, wo_ref, wg_ref, wu_ref, wd_ref,
                      ln_attn_ref, ln_mlp_ref, fnorm_ref, lm_ref, emb_ref,
                      first_ref, steps_ref, pad_only_ref, cos_ref, sin_ref,
                      gumbel_ref, forced_ref, allow_ref,
                      row_ref, ended_ref, work_ref, *stream_scratch,
                      n_layers: int, n_heads: int, kv_heads: int,
                      head_dim: int, t_max: int, n_events: int, eps: float,
                      eos_id: int, k_cap: int, greedy: bool,
                      per_slot_allow: bool, stream_mlp: bool = False):
    b, d = hidden_ref.shape
    v = lm_ref.shape[-1]
    temp = temp_ref[...]  # [B, 1] f32 per-row sampling knobs
    top_p = topp_ref[...]
    top_k = topk_ref[...]
    max_k = maxk_ref[0]
    first_event_id = eos_id + 1
    dtype = wq_ref.dtype

    lane_v = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (b, n_events), 1)
    forced = forced_ref[...] > 0  # [B, 1]

    x = hidden_ref[...].astype(dtype)
    ended = jnp.zeros((b, 1), bool)
    e_onehot = jnp.zeros((b, n_events), jnp.float32)
    ks = [[] for _ in range(n_layers)]  # per layer: list of [B, Hkv*dh] bf16
    vs = [[] for _ in range(n_layers)]

    if stream_mlp:
        # streamed-MLP layout (deep token nets whose full residency does not
        # fit next to the slot-scaled stack): wg_ref is the packed per-layer
        # gate|up|down chunk array [L, D, 2F+D] in ANY memory, double-
        # buffered through VMEM scratch.  All chunk indices are STATIC
        # (steps and layers are unrolled), so each copy is a plain
        # static-slice DMA.  Chunks re-stream every step — ~L*(2F+D)*D*2
        # bytes x t_max per dispatch — but that stream is batch-invariant
        # and overlaps the per-layer attention compute, which scales with B.
        wbuf, wsem = stream_scratch
        n_chunks = t_max * n_layers

        def issue(c):
            if c < n_chunks:
                pltpu.make_async_copy(wg_ref.at[c % n_layers],
                                      wbuf.at[c % 2], wsem.at[c % 2]).start()

        def consume(c):
            pltpu.make_async_copy(wg_ref.at[c % n_layers],
                                  wbuf.at[c % 2], wsem.at[c % 2]).wait()
            return c % 2

        issue(0)
        issue(1)

    for j in range(t_max):  # static unroll: the KV "cache" is live values
        cos_j = cos_ref[j:j + 1, :]
        sin_j = sin_ref[j:j + 1, :]
        for li in range(n_layers):
            h = _rms_norm(x, ln_attn_ref[li:li + 1, :], eps)
            q = _mm(h, wq_ref[li])
            k = _mm(h, wk_ref[li])
            vv = _mm(h, wv_ref[li])
            # per-head RoPE + exact softmax over the 0..j live positions
            groups = n_heads // kv_heads
            k_heads = [
                _rope(k[:, hk * head_dim:(hk + 1) * head_dim], cos_j, sin_j)
                for hk in range(kv_heads)
            ]
            ks[li].append(jnp.concatenate(k_heads, axis=-1)
                          if kv_heads > 1 else k_heads[0])
            vs[li].append(vv)
            outs = []
            scale = head_dim ** -0.5
            for hq in range(n_heads):
                sl = slice(hq * head_dim, (hq + 1) * head_dim)
                slkv = slice((hq // groups) * head_dim,
                             (hq // groups + 1) * head_dim)
                qh = _rope(q[:, sl], cos_j, sin_j).astype(jnp.float32)
                scores = [
                    jnp.sum(qh * ks[li][t][:, slkv].astype(jnp.float32),
                            axis=-1, keepdims=True) * scale
                    for t in range(j + 1)
                ]  # each [B, 1] f32
                s = jnp.concatenate(scores, axis=-1) if j else scores[0]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
                o = jnp.zeros((b, head_dim), jnp.float32)
                for t in range(j + 1):
                    o = o + (p[:, t:t + 1].astype(jnp.float32)
                             * vs[li][t][:, slkv].astype(jnp.float32))
                outs.append(o.astype(dtype))
            attn = jnp.concatenate(outs, axis=-1) if n_heads > 1 else outs[0]
            x = x + _mm(attn, wo_ref[li])
            hm = _rms_norm(x, ln_mlp_ref[li:li + 1, :], eps)
            # silu in f32 (Mosaic has no bf16 logistic; XLA's bf16 sigmoid
            # is computed in f32 internally and rounded, same result)
            if stream_mlp:
                ft = (wg_ref.shape[-1] - d) // 2
                c = j * n_layers + li
                s = consume(c)
                gf = _mm(hm, wbuf[s, :, :ft]).astype(jnp.float32)
                gated = (gf * jax.nn.sigmoid(gf)).astype(dtype) \
                    * _mm(hm, wbuf[s, :, ft:2 * ft])
                # down rows are zero-padded from F to D: the padded gated
                # lanes multiply through as exact 0.0, bit-identical to the
                # resident path
                gp = (gated if ft == d
                      else jnp.pad(gated, ((0, 0), (0, d - ft))))
                x = x + _mm(gp, wbuf[s, :, 2 * ft:])
                issue(c + 2)
            else:
                gf = _mm(hm, wg_ref[li]).astype(jnp.float32)
                gated = (gf * jax.nn.sigmoid(gf)).astype(dtype) \
                    * _mm(hm, wu_ref[li])
                x = x + _mm(gated, wd_ref[li])

        hf = _rms_norm(x, fnorm_ref[...], eps)
        logits = _mm(hf, lm_ref[...]).astype(jnp.float32)
        lmax = jnp.max(logits / temp, axis=-1, keepdims=True)
        eexp = jnp.exp(logits / temp - lmax)
        probs = eexp / jnp.sum(eexp, axis=-1, keepdims=True)

        if j == 0:
            mask = jnp.broadcast_to(first_ref[...], (b, v))
        else:
            # steps_ref rows are (step, event) flattened: row t*E + e
            step_tbl = steps_ref[j * n_events:(j + 1) * n_events, :]  # [E, V]
            mask = jnp.dot(e_onehot.astype(jnp.bfloat16),
                           step_tbl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        pad_mask = jnp.broadcast_to(pad_only_ref[...], (b, v))
        if j > 0:
            mask = jnp.where(ended, pad_mask, mask)
        mask = jnp.where(forced, pad_mask, mask)
        probs = probs * mask
        if per_slot_allow:
            # per-slot constraint plane (0/1; bans ride exclusive id blocks
            # so one multiply per step is exact — sampling/masks.py)
            probs = probs * allow_ref[...].astype(jnp.float32)

        g_step = gumbel_ref[j * b:(j + 1) * b, :]
        tok = _sample(probs, g_step, work_ref, top_p, top_k, max_k, greedy,
                      k_cap)

        row_ref[:, j:j + 1] = tok[:, None]
        if j == 0:
            ended = (tok[:, None] == eos_id)
            e_off = jnp.clip(tok[:, None] - first_event_id, 0, n_events - 1)
            e_onehot = (lane_e == e_off).astype(jnp.float32)
        if j < t_max - 1:
            onehot = (lane_v == tok[:, None]).astype(dtype)
            x = jnp.dot(onehot, emb_ref[...],
                        preferred_element_type=jnp.float32).astype(dtype)

    ended_ref[...] = ended.astype(jnp.int32)


def _mlp_chunks(lp):
    """Pack each token layer's gate|up|down into one [D, 2F+D] chunk for the
    streamed-MLP layout (down ROWS zero-padded from F to D — padded rows
    multiply against zero-padded gated lanes, exact)."""
    tl, dd, ft = lp["w_gate"].shape
    assert ft <= dd, "stream_mlp needs token FFN width <= hidden"
    down = jnp.pad(lp["w_down"], ((0, 0), (0, dd - ft), (0, 0)))
    return jnp.concatenate([lp["w_gate"], lp["w_up"], down], axis=-1)


def decode_token_row(params: dict, config, hidden: jax.Array, masks,
                     temp, top_p, top_k, key: jax.Array, *,
                     greedy: bool = False, forced_pad=None, allow=None,
                     stream_mlp: bool = False, interpret: bool = False):
    """Decode one full token row for every batch row in ONE kernel dispatch.

    params: the full model pytree ({"net_token": ..., "lm_head": ...});
    hidden [B, D]: event-net hidden (token position 0); masks: the
    ``_mask_arrays`` triple (first [V], steps [E, T, V], pad_only [V]);
    forced_pad [B] bool (optional): rows forced to emit pad (retired batcher
    slots).  Returns (row [B, T] i32, ended [B] bool).

    ``temp`` / ``top_p`` / ``top_k`` may be scalars or per-row [B] vectors
    (continuous batching serves requests with different sampling knobs in
    one batch).  ``allow`` [B, V] 0/1 (optional) multiplies every step's
    grammar mask — the per-request constraint plane
    (sampling/masks.py ``build_allow_vector``).

    The sampled distribution matches sampling/topk_topp.py (reference keep
    semantics, Gumbel-argmax draw); ``greedy`` is exact argmax.
    """
    from ..models.llama import rope_cos_sin

    tok_cfg = config.net_token
    t_max = config.tokenizer.max_token_seq
    eos_id = int(config.tokenizer.eos_id)
    pad_id = int(config.tokenizer.pad_id)
    first, steps_tbl, pad_only = masks
    n_events, _, vocab = steps_tbl.shape
    b, d = hidden.shape
    lp = params["net_token"]["layers"]
    dtype = lp["wq"].dtype

    cos, sin = rope_cos_sin(jnp.arange(t_max), tok_cfg.head_dim,
                            tok_cfg.rope_theta)  # [T, dh] f32
    if greedy:
        gumbel = jnp.zeros((t_max * b, K_CAP), jnp.float32)
    elif key.ndim == 2:  # per-row keys [B, 2] (batcher per-request seeds):
        # each row draws its own [t_max, K] stream, laid out step-major to
        # match the kernel's g_step slicing (row j*b + r = step j, row r)
        gumbel = jnp.swapaxes(
            jax.vmap(lambda k: jax.random.gumbel(
                k, (t_max, K_CAP), jnp.float32))(key),
            0, 1).reshape(t_max * b, K_CAP)
    else:
        gumbel = jax.random.gumbel(key, (t_max * b, K_CAP), jnp.float32)
    forced = (jnp.zeros((b, 1), jnp.int32) if forced_pad is None
              else forced_pad.astype(jnp.int32)[:, None])

    # VMEM-input weights: XLA's liveness analysis overlaps the input
    # windows with the paged kernel's scratch.  (An ANY+manual-DMA variant
    # that staged the weights through single-buffered scratch measured WORSE
    # in every tried configuration — its scratch is live for the whole
    # kernel, so the two kernels' vmem budgets sum past 128 MB — and was
    # deleted.)
    kernel = functools.partial(
        _token_row_kernel,
        n_layers=tok_cfg.num_layers, n_heads=tok_cfg.num_heads,
        kv_heads=tok_cfg.kv_heads, head_dim=tok_cfg.head_dim, t_max=t_max,
        n_events=int(n_events), eps=tok_cfg.rms_norm_eps, eos_id=eos_id,
        k_cap=K_CAP, greedy=greedy, per_slot_allow=allow is not None,
        stream_mlp=stream_mlp)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    from .sampler import _per_row

    # 0/1 plane: bf16 is exact and halves the input window; a one-tile dummy
    # keeps the program identical when no per-slot constraints are active
    allow_in = (jnp.zeros((8, LANE), jnp.bfloat16) if allow is None
                else allow.astype(jnp.bfloat16))
    topk = _per_row(top_k, b, jnp.int32)
    scratch = [pltpu.VMEM((b, vocab), jnp.float32)]
    if stream_mlp:
        # MLP weights leave residency: packed chunks live in ANY memory and
        # double-buffer through this scratch (the kernel's static-index DMA
        # rotation), freeing ~L*3*F*D bytes of residency for deep token nets
        d_mlp = jnp.zeros((8, LANE), dtype)
        mlp_in = (_mlp_chunks(lp), d_mlp, d_mlp)
        ft = tok_cfg.intermediate_size
        scratch += [pltpu.VMEM((2, d, 2 * ft + d), dtype),
                    pltpu.SemaphoreType.DMA((2,))]
        mlp_spec = [pl.BlockSpec(memory_space=pl.ANY), vmem, vmem]
    else:
        mlp_in = (lp["w_gate"], lp["w_up"], lp["w_down"])
        mlp_spec = [vmem] * 3
    row, ended = pl.pallas_call(
        kernel,
        in_specs=[smem] + [vmem] * 8 + mlp_spec + [vmem] * 13,
        out_specs=[vmem, vmem],
        out_shape=[jax.ShapeDtypeStruct((b, t_max), jnp.int32),
                   jax.ShapeDtypeStruct((b, 1), jnp.int32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # measured demand with double-buffered VMEM weight inputs is
            # ~110 MB; the explicit limits of co-compiled Pallas kernels
            # can SUM in the program's vmem accounting, so keep this as
            # tight as the demand allows (the fused decode-step kernel's
            # weight windows shave the shared pool too — its rope matrix
            # and this kernel's step table went bf16/in-kernel for that).
            # The streamed-MLP layout trades ~3LFD bytes of residency for
            # a 2-chunk buffer (large: -36 MB + 12 MB) but serves DEEP nets
            # at big slot counts (large/128 resident demand measured
            # 141.7 MB; streamed ~118 MB) — give it the headroom.
            vmem_limit_bytes=(120 if stream_mlp else 112) * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.max(topk).reshape(1),
        _per_row(temp, b, jnp.float32),
        _per_row(top_p, b, jnp.float32),
        topk,
        hidden.astype(dtype),
        lp["wq"], lp["wk"], lp["wv"], lp["wo"],
        *mlp_in,
        lp["ln_attn"], lp["ln_mlp"],
        params["net_token"]["final_norm"].reshape(1, d),
        params["lm_head"].astype(dtype),
        params["net_token"]["embed"].astype(dtype),
        first.astype(jnp.float32)[None, :],
        # 0/1 mask table: bf16 is exact and halves this input's VMEM window
        # (the kernel's mask matmul already ran in bf16)
        jnp.swapaxes(steps_tbl.astype(jnp.bfloat16), 0, 1
                     ).reshape(t_max * n_events, vocab),
        pad_only.astype(jnp.float32)[None, :],
        cos, sin, gumbel, forced, allow_in,
    )
    return row, ended[:, 0] > 0


_ENABLED = True


def set_enabled(v: bool):
    """Toggle the fused kernel (benchmark comparisons / strict-parity runs)."""
    global _ENABLED
    _ENABLED = v


def usable(params: dict, config) -> bool:
    """The kernel targets the TPU serving configuration: bf16 weights (VMEM
    residency budget) on a real TPU backend."""
    return (_ENABLED and jax.default_backend() == "tpu"
            and params["lm_head"].dtype == jnp.bfloat16)
