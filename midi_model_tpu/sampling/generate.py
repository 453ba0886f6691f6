"""Fully-jitted autoregressive generation for the hierarchical MIDI model.

The reference generation loop (/root/reference/app.py:27-120,
midi_model.py:167-250) crosses the host↔device boundary ~17× per event
(1 event forward + 8 token forwards + 8 host-built masks/syncs).  Here the
whole loop lives on device:

- the event-level KV cache is an all-heads paged pool (ops/paged_allheads):
  attention traffic scales with the true decoded length and the Pallas
  kernel streams cache reads at ~85% of HBM peak (two-level cache design
  per SURVEY.md §7.3; the opt-in int8 cache keeps a dense ring instead);
- the 8-step inner token loop is a ``lax.scan`` whose grammar constraints come
  from precomputed mask tables (masks.py) — variable event arity and per-row
  eos become masked fixed-shape steps, exactly reproducing the reference's
  dynamic loop including pad-forcing after eos;
- per-event "end" state resets every event, matching the reference's quirk
  that only a *simultaneous* all-rows eos terminates generation
  (midi_model.py:196,248);
- decoding runs in chunks of ``chunk_size`` events per device dispatch so the
  serving layer can stream rows while amortizing dispatch overhead.

Sampling is reference-exact top-p/top-k over temperature-scaled softmax times
the grammar mask (see topk_topp.py); ``greedy=True`` takes the argmax instead
(the checkpoint-parity acceptance gate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, midinet
from ..models.config import MIDIModelConfig
from ..models.llama import KVCache
from .masks import MaskTable, build_mask_table
from .topk_topp import sample_greedy, sample_top_p_k


class GenState(NamedTuple):
    """Carried decode state between chunks (all statically shaped).

    The event-net KV lives in all-heads PAGED POOLS (ops/paged_allheads.py) —
    attention traffic scales with the TRUE current length, not the
    preallocated capacity, so no cache-growth bucketing is needed and the
    Pallas kernel streams cache reads at ~85% of HBM peak (~2x the dense XLA
    path). With ``kv_int8`` the pools store int8 pages + per-token-per-head
    scales: cache-read traffic (the decode bottleneck) halves again.

    INVARIANT: when ``all_eos`` is True, ``hidden`` is UNDEFINED (the merged
    whole-event-loop kernel may have advanced it past the all-eos event, and
    the pools may hold speculated appends beyond ``cur_len``).  Every caller
    terminates on ``all_eos``; a future resume/ignore-eos path must
    recompute ``hidden`` from the kept prefix before decoding further.
    """

    pools: "object"  # ops.paged_allheads.PagedPools (layer axis folded)
    hidden: jax.Array  # [B, D] hidden of the last consumed event row
    cur_len: jax.Array  # int32: rows consumed so far (prompt + generated)
    all_eos: jax.Array  # bool: every row emitted eos in the same event step

    def capacity(self, config: MIDIModelConfig, batch: int) -> int:
        n_pages, ps, _ = self.pools.k.shape
        return (n_pages // (config.net.num_layers * batch)) * ps


PAGE_SIZE = 64  # aligned-decode pool page size (DMA granularity)


def _mask_arrays(table: MaskTable):
    return (jnp.asarray(table.first), jnp.asarray(table.steps),
            jnp.asarray(table.pad_only))


@functools.partial(jax.jit, static_argnames=("config", "max_seq", "kv_int8",
                                             "tp_axis"))
def prefill(params, config: MIDIModelConfig, prompt: jax.Array, max_seq: int,
            kv_int8: bool = False, tp_axis: str = None) -> GenState:
    """Run the event net over the prompt rows, writing the prompt KV
    DIRECTLY into paged pools (capacity ``max_seq`` rounded up to whole
    pages) — no dense scratch cache, so prefill peak memory is the pools
    themselves (the old scratch+pack route doubled it and OOM'd a 16 GB
    chip at bs=32 x 4096-event prompts; llama.prefill_paged).

    ``kv_int8`` quantizes the pools (int8 pages + per-token-per-head
    scales): half the cache-read traffic and capacity footprint.

    ``tp_axis``: tensor-parallel shard pass (sharded.tp_local_config builds
    the local ``config``; weights arrive as this shard's slices; the pools
    come out holding only this shard's heads)."""
    from ..ops.paged_allheads import alloc_pools

    b, p_len, _ = prompt.shape
    dtype = params["lm_head"].dtype
    net = config.net

    ps = PAGE_SIZE
    pps = -(-max_seq // ps)  # capacity in pages per (layer, row)
    # round up to whole compute blocks: a pages_per_slot not divisible by
    # the kernel's 4-page block forces ppcb=1 (one-page DMAs) — measured
    # 1.5-1.7x slower at cache 512-1024 than 4-page blocks
    pps = -(-pps // 4) * 4
    # embed in 16-event chunks: the fused pad+clamp+gather of a whole long
    # prompt holds a [B, L, 8, D] gather output live (>1 GB at bs=32 x
    # 2048) and can exceed the 16 MB scoped-VMEM fusion budget (same
    # family as serve/batcher._prefill_request); lax.map serializes the
    # gathers, noise next to the transformer forward
    t_max = prompt.shape[-1]
    if p_len > 64:
        pad16 = (-p_len) % 16
        padded = (jnp.pad(prompt, ((0, 0), (0, pad16), (0, 0)),
                          constant_values=config.tokenizer.pad_id)
                  if pad16 else prompt)
        emb = jax.lax.map(
            lambda c: midinet.embed_events(params, c),
            padded.reshape(b, -1, 16, t_max).swapaxes(0, 1))
        emb = emb.swapaxes(0, 1).reshape(b, -1, emb.shape[-1])[:, :p_len]
    else:
        emb = midinet.embed_events(params, prompt)

    l_n, hkv, dh = net.num_layers, net.kv_heads, net.head_dim
    pools = alloc_pools(hkv, l_n * b * pps, ps, dh, dtype,
                        quantized=kv_int8)
    hidden, pools = llama.prefill_paged(
        params["net"], net, emb.astype(dtype), pools,
        page_size=ps, pages_per_slot=pps, tp_axis=tp_axis)

    return GenState(
        pools=pools, hidden=hidden[:, -1],
        cur_len=jnp.asarray(p_len, jnp.int32),
        all_eos=jnp.asarray(False))


def token_row_scan(params, config: MIDIModelConfig, hidden: jax.Array, masks,
                   temp, top_p, top_k, key, greedy: bool,
                   forced_pad: Optional[jax.Array] = None,
                   allow: Optional[jax.Array] = None):
    """Decode one full token row per batch row as an XLA ``lax.scan`` (the
    portable path; on TPU with bf16 weights ``ops.token_loop`` fuses the whole
    loop into one VMEM-resident kernel — see :func:`decode_token_row_any`).

    hidden [B, D]: event-net hidden; forced_pad [B] bool (optional): rows
    forced to emit pad rows (retired continuous-batching slots); allow
    [B, V] 0/1 (optional): per-row constraint plane multiplied into every
    step's grammar mask (masks.build_allow_vector).  ``key`` [2] shares one
    draw stream across rows; [B, 2] gives each row its own stream (the
    batcher's per-request seeds).
    Returns (row [B, T] i32, ended [B] bool — eos emitted at step 0).
    """
    first, steps_tbl, pad_only = masks
    tok_cfg = config.net_token
    b = hidden.shape[0]
    t_max = config.tokenizer.max_token_seq
    dtype = params["lm_head"].dtype
    eos_id = config.tokenizer.eos_id
    first_event_id = int(config.tokenizer.eos_id) + 1
    n_events = len(config.tokenizer.events)
    # temp may be a scalar or a per-row [B] vector (continuous batching)
    temp_b = jnp.asarray(temp, jnp.float32)[..., None]

    cache2 = KVCache.zeros(tok_cfg, b, t_max, dtype=dtype)

    def token_step(carry, xs):
        cache2, prev_tok, ended, e_off = carry
        i, step_key = xs
        inp = jnp.where(
            (i == 0),
            hidden.astype(dtype),
            jnp.take(params["net_token"]["embed"], prev_tok, axis=0),
        )[:, None, :]
        h, cache2 = llama.forward(params["net_token"], tok_cfg, inp, cache=cache2)
        logits = midinet.lm_head(params, h[:, 0])  # [B, V] f32
        probs = jax.nn.softmax(logits / temp_b, axis=-1)
        step_mask = steps_tbl[e_off, i]  # [B, V]
        mask = jnp.where(i == 0, first[None, :], step_mask)
        mask = jnp.where(ended[:, None], pad_only[None, :], mask)
        if forced_pad is not None:
            mask = jnp.where(forced_pad[:, None], pad_only[None, :], mask)
        probs = probs * mask
        if allow is not None:
            probs = probs * allow.astype(probs.dtype)
        if greedy:
            tok = sample_greedy(probs)
        else:
            tok = sample_top_p_k(probs, top_p, top_k, step_key)
        tok = tok.astype(jnp.int32)
        is_first = i == 0
        ended = jnp.where(is_first, tok == eos_id, ended)
        e_off = jnp.where(
            is_first, jnp.clip(tok - first_event_id, 0, n_events - 1), e_off)
        return (cache2, tok, ended, e_off), tok

    if key.ndim == 2:  # per-row keys [B, 2] -> per-step-per-row [T, B, 2]
        keys = jnp.swapaxes(
            jax.vmap(lambda k: jax.random.split(k, t_max))(key), 0, 1)
    else:
        keys = jax.random.split(key, t_max)
    init = (cache2, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
            jnp.zeros((b,), jnp.int32))
    (cache2, _, ended, _), toks = jax.lax.scan(
        token_step, init, (jnp.arange(t_max), keys))
    return toks.T, ended  # row [B, T], ended [B]


def decode_token_row_any(params, config: MIDIModelConfig, hidden: jax.Array,
                         masks, temp, top_p, top_k, key, greedy: bool,
                         forced_pad: Optional[jax.Array] = None,
                         kernel_ok: bool = True,
                         allow: Optional[jax.Array] = None,
                         stream_mlp: bool = False):
    """Token-row decode with backend dispatch: the fused VMEM-resident Pallas
    kernel on TPU/bf16 (ops/token_loop.py, ~4x the XLA scan at bs=32), the
    XLA scan elsewhere.  ``kernel_ok=False`` forces the scan — the aligned
    decode loop uses it above 64 rows, where the kernel's ~110 MB VMEM
    footprint doesn't fit next to that program's other buffers and its
    weight-reuse advantage has amortized away anyway.  ``stream_mlp`` keeps
    the kernel usable for deep token nets (tv2o-large above 32 slots) by
    streaming the MLP weights instead of keeping them resident.  ``allow``
    [B, V] 0/1: per-row constraint plane (continuous batching;
    masks.build_allow_vector)."""
    from ..ops import token_loop

    if kernel_ok and token_loop.usable(params, config):
        return token_loop.decode_token_row(
            params, config, hidden, masks, temp, top_p, top_k, key,
            greedy=greedy, forced_pad=forced_pad, allow=allow,
            stream_mlp=stream_mlp)
    return token_row_scan(params, config, hidden, masks, temp, top_p, top_k,
                          key, greedy, forced_pad, allow)


def _decode_one_event(params, config: MIDIModelConfig, state: GenState,
                      masks, temp, top_p, top_k, key, greedy: bool,
                      fused=None, tp_axis=None):
    """Sample one full row (8 tokens) and advance the event cache.

    ``fused`` (ops.fused_step.prepare_fused output, hoisted outside the
    event loop by decode_events) selects the whole-step fused kernel: all
    layers in ONE dispatch with the per-layer weights double-buffered across
    the layer grid — the weight stream never stops at op/layer boundaries
    (the split path measures ~44% of HBM peak on the matmul stream alone).
    """
    b = state.hidden.shape[0]
    # The token-row kernel next to the fused whole-step kernel: at <=16
    # layers the pair co-compiles (since round 4 at ANY scan length — XLA's
    # custom-fusion cloning drops the token kernel's explicit vmem limit at
    # long scans and the program default rejects it; _decode_events_jitted
    # compiles with the default raised, utils/xla_opts.py).  At 24 layers
    # (tv2o-large) the conflict is REAL, not an accounting bug: the cloned
    # token-kernel fusion demands 108.94 MB of scoped VMEM and only 96.43 MB
    # remains next to the 24-layer fused kernel's reservation ("Scoped
    # allocation with size 108.94M and limit 96.43M", 2026-08-19,
    # tools/probe_both_kernels_real.py large) — no default raise can create
    # VMEM, so large keeps the XLA token scan with the fused event net
    # (which matters ~4x more at 24 layers).
    kernel_ok = b <= 64 and (fused is None or config.net.num_layers <= 16)
    row, ended = decode_token_row_any(params, config, state.hidden, masks,
                                      temp, top_p, top_k, key, greedy,
                                      kernel_ok=kernel_ok)

    # Feed the sampled row through the event net (conditions the next event).
    emb = midinet.embed_events(params, row[:, None, :])
    ps = state.pools.page_size
    pps = state.pools.k.shape[0] // (config.net.num_layers * b)
    index = jnp.broadcast_to(state.cur_len, (b,))
    if fused is not None:
        from ..ops.fused_step import fused_decode_step

        h, pools = fused_decode_step(fused, config.net, emb[:, 0],
                                     state.pools, index,
                                     page_size=ps, pages_per_slot=pps,
                                     uniform_append=True)
    else:
        # split path (non-TPU, fp32 weights, GQA): per-layer XLA ops with
        # the per-cell kernel.  The tensor-parallel step also lives here:
        # its two per-layer psums must run between XLA ops, which the
        # whole-step kernel cannot.
        h, pools = llama.decode_paged(
            params["net"], config.net, emb[:, 0], state.pools,
            index, page_size=ps, pages_per_slot=pps, streaming=False,
            tp_axis=tp_axis)
    return state._replace(pools=pools, hidden=h,
                          cur_len=state.cur_len + 1,
                          all_eos=jnp.all(ended)), row


def _decode_events_impl(params, config: MIDIModelConfig, state: GenState,
                        masks, n_events_chunk: int, temp, top_p, top_k, key,
                        greedy: bool = False, tp_axis: str = None):
    """Decode up to ``n_events_chunk`` rows in one device dispatch.

    Stops early (masked no-op iterations) once every batch row emitted eos in
    the same event, or the event cache is full.  Returns (state, rows
    [B, n_events_chunk, T], n_done) where rows beyond n_done are pad.

    The GenState is DONATED: the multi-GB event KV cache is carried in place
    across dispatches instead of being copied once per chunk (callers must
    rebind ``state`` to the returned value, which every call site does).
    """
    from ..ops import fused_step as _fs

    b = state.hidden.shape[0]
    t_max = config.tokenizer.max_token_seq
    max_seq = state.capacity(config, b)
    pad_id = config.tokenizer.pad_id
    rows0 = jnp.full((b, n_events_chunk, t_max), pad_id, jnp.int32)
    # whole-step fused kernel (TPU/bf16/MHA): prepared ONCE per chunk here,
    # outside the event loop, so the qkv/gate-up concats never run per event
    fused = (_fs.prepare_fused(params["net"])
             if tp_axis is None and _fs.usable(params, config, state.pools)
             else None)

    def cond(carry):
        state, _, step = carry
        return (step < n_events_chunk) & (~state.all_eos) & (state.cur_len < max_seq)

    def body(carry):
        state, rows, step = carry
        step_key = jax.random.fold_in(key, step)
        state, row = _decode_one_event(params, config, state, masks, temp,
                                       top_p, top_k, step_key, greedy,
                                       fused=fused, tp_axis=tp_axis)
        rows = jax.lax.dynamic_update_slice(rows, row[:, None, :], (0, step, 0))
        return state, rows, step + 1

    # whole-event-loop kernel (TPU/bf16/MHA, bs<=64): E events per dispatch —
    # token rows sampled AND the event net advanced in ONE pallas_call, the
    # weight stream crossing event boundaries (ops/event_loop.py).  Runs the
    # E-sized dispatches; the per-event while_loop below finishes the tail
    # (chunk remainder, near-capacity spans, post-eos) with identical
    # semantics, so the two paths compose as one chunk.
    from ..ops import event_loop as _el

    step0 = 0
    _layout = (_el.plan_layout(params, config, b)
               if tp_axis is None and b <= 64
               and _el.usable(params, config, state.pools) else None)
    if _layout is not None:
        E = _el.EVENTS_PER_DISPATCH
        merged = _el.prepare_inputs(params, config, masks,
                                    stream_tok_mlp=_layout)
        nd = n_events_chunk // E
        eos_id = config.tokenizer.eos_id
        ps = state.pools.page_size
        pps = state.pools.k.shape[0] // (config.net.num_layers * b)

        def mcond(carry):
            st, _, _, d = carry
            return (d < nd) & (~st.all_eos) & (st.cur_len + E <= max_seq)

        def mbody(carry):
            st, rows, step, d = carry
            keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(
                step + jnp.arange(E))
            if greedy:
                gumbel = jnp.zeros((E, t_max * b, _el.K_CAP), jnp.float32)
            else:
                gumbel = jax.vmap(lambda k2: jax.random.gumbel(
                    k2, (t_max * b, _el.K_CAP), jnp.float32))(keys)
            rows_e, xout, pools = _el.merged_decode_events(
                merged, config, st.hidden, st.pools, st.cur_len, temp,
                top_p, top_k, gumbel, page_size=ps, pages_per_slot=pps,
                n_events=E, greedy=greedy)
            hidden = llama.rms_norm(xout, merged["final_norm"],
                                    config.net.rms_norm_eps)
            # an all-eos event ends the chunk: keep rows up to and including
            # it, rewind cur_len past the speculated appends (rows beyond
            # cur_len are never read and are overwritten by later appends)
            ended_e = jnp.all(rows_e[:, :, 0] == eos_id, axis=1)  # [E]
            any_end = jnp.any(ended_e)
            n_in = jnp.where(any_end, jnp.argmax(ended_e) + 1, E
                             ).astype(jnp.int32)
            keep = jnp.arange(E)[None, :, None] < n_in
            block = jnp.where(keep, jnp.transpose(rows_e, (1, 0, 2)), pad_id)
            rows = jax.lax.dynamic_update_slice(rows, block, (0, step, 0))
            st = st._replace(pools=pools, hidden=hidden,
                             cur_len=st.cur_len + n_in, all_eos=any_end)
            return st, rows, step + n_in, d + 1

        state, rows0, step0, _ = jax.lax.while_loop(
            mcond, mbody, (state, rows0, 0, 0))

    state, rows, n_done = jax.lax.while_loop(cond, body,
                                             (state, rows0, step0))
    return state, rows, n_done


@functools.lru_cache(maxsize=4)
def _decode_events_jitted(backend: str):
    """Lazily jitted ``_decode_events_impl`` with the TPU scoped-VMEM raise
    (utils/xla_opts.py): at 24 layers XLA's custom-fusion cloning drops the
    token-row kernel's explicit vmem limit and the 16 MB program default
    rejects the program.  Keyed on the backend name — other backends reject
    the TPU-specific compile option, and a test that flips
    ``jax.default_backend()`` must not inherit a stale TPU jit."""
    from ..utils.xla_opts import decode_step_compiler_options

    opts = decode_step_compiler_options() if backend == "tpu" else None
    return jax.jit(_decode_events_impl,
                   static_argnames=("config", "n_events_chunk", "greedy",
                                    "tp_axis"),
                   donate_argnums=(2,),
                   compiler_options=opts)


def decode_events(params, config, state, masks, n_events_chunk, temp, top_p,
                  top_k, key, greedy: bool = False, tp_axis: str = None):
    """See :func:`_decode_events_impl` — jit-dispatched wrapper."""
    return _decode_events_jitted(jax.default_backend())(
        params, config, state, masks, n_events_chunk, temp, top_p, top_k,
        key, greedy=greedy, tp_axis=tp_axis)


def normalize_prompt(tokenizer, prompt: Optional[np.ndarray], batch_size: int,
                     max_token_seq: Optional[int] = None) -> np.ndarray:
    """Reference prompt normalization (midi_model.py:171-188): tile to batch,
    clip/pad rows to ``max_token_seq``; default prompt is a lone bos row."""
    t_max = max_token_seq or tokenizer.max_token_seq
    if prompt is None:
        out = np.full((batch_size, 1, t_max), tokenizer.pad_id, dtype=np.int64)
        out[:, 0, 0] = tokenizer.bos_id
        return out
    prompt = np.asarray(prompt)
    if prompt.ndim == 2:
        prompt = np.repeat(prompt[None], batch_size, axis=0)
    elif prompt.shape[0] == 1:
        prompt = np.repeat(prompt, batch_size, axis=0)
    elif prompt.ndim != 3 or prompt.shape[0] != batch_size:
        raise ValueError(f"invalid shape for prompt, {prompt.shape}")
    prompt = prompt[..., :t_max]
    if prompt.shape[-1] < t_max:
        prompt = np.pad(prompt, ((0, 0), (0, 0), (0, t_max - prompt.shape[-1])),
                        mode="constant", constant_values=tokenizer.pad_id)
    return prompt.astype(np.int64)


def generate(params, config: MIDIModelConfig, prompt: Optional[np.ndarray] = None,
             batch_size: int = 1, max_len: int = 512, temp: float = 1.0,
             top_p: float = 0.98, top_k: int = 20, seed: int = 0,
             greedy: bool = False, disable_patch_change: bool = False,
             disable_control_change: bool = False,
             disable_channels: Optional[list] = None,
             chunk_size: Optional[int] = None, context_limit: int = 4096,
             kv_int8: bool = False,
             event_callback=None) -> np.ndarray:
    """Host-facing generation: returns ``[B, L, T]`` int numpy rows
    (prompt + generated), mirroring reference ``MIDIModel.generate``.

    ``event_callback(rows_chunk)`` (if given) receives each decoded chunk as
    numpy — this is the streaming hook the serving app uses.

    The event KV lives in a paged pool, so attention traffic scales with the
    TRUE decoded length — the pool is allocated at full ``max_len`` capacity
    upfront and no cache-growth bucketing is needed (the round-1 bucketing
    machinery existed because the dense cache was read at its full static
    width every step).

    Note on reproducibility: on TPU the sampling draw comes from the Pallas
    Gumbel-argmax kernel — the same distribution as the XLA inverse-CDF
    sampler used on other backends, but a different realized draw for the
    same seed (see sampling/topk_topp.py ``use_kernel``).  Greedy decode is
    backend-identical.
    """
    tokenizer = config.tokenizer
    prompt = normalize_prompt(tokenizer, prompt, batch_size)
    # Only the model-visible window is truncated; the dropped head is kept
    # and re-prepended to the returned sequence so continuation flows that
    # consume the return value (service.last_output -> finish) keep the full
    # history, like the reference app which tracks history host-side
    # (/root/reference/app.py:53 truncates only the model input).
    head = prompt[:, : max(0, prompt.shape[1] - context_limit)]
    prompt = prompt[:, -context_limit:]
    b, p_len, t_max = prompt.shape
    if p_len >= max_len:
        return np.concatenate([head, prompt], axis=1) if head.shape[1] else prompt

    table = build_mask_table(
        tokenizer, disable_patch_change=disable_patch_change,
        disable_control_change=disable_control_change,
        disable_channels=disable_channels)
    masks = _mask_arrays(table)

    remaining = max_len - p_len
    chunk = chunk_size or remaining

    state = prefill(params, config, jnp.asarray(prompt), max_len,
                    kv_int8=kv_int8)
    key = jax.random.PRNGKey(seed)

    pieces = [head, prompt] if head.shape[1] else [prompt]
    produced = 0
    while produced < remaining:
        n = min(chunk, remaining - produced)
        key, sub = jax.random.split(key)
        state, rows, n_done = decode_events(
            params, config, state, masks, n, temp, top_p, top_k, sub,
            greedy=greedy)
        n_done = int(n_done)
        rows_np = np.asarray(rows[:, :n_done])
        if n_done:
            pieces.append(rows_np)
            if event_callback is not None:
                event_callback(rows_np)
        produced += n
        if bool(state.all_eos) or n_done < n:
            break
    return np.concatenate(pieces, axis=1)
