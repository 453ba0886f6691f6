"""Continuous-batch serving: per-slot request admission into a running batch.

The reference serves fixed aligned batches (all rows share one prompt and one
length).  Production serving wants slots: requests arrive at different times
with different prompts/budgets and leave when done, without ever stalling the
other slots.  This batcher keeps a fixed ``n_slots``-row decode batch on
device:

- the event-level KV cache is a PAGED POOL (ops/paged.py): per-slot page
  ranges, layer axis folded into the page axis, reads via the Pallas paged
  flash-decode kernel (traffic scales with actual slot lengths; idle slots
  are skipped entirely), writes via a one-page Pallas append kernel — this
  replaced round 1's dense one-hot blend, which rewrote a full cache slice
  per layer per token;
- prefill runs per request in a padded scratch cache and is spliced into the
  slot's page range with one dynamic-update-slice per layer;
- one jitted ``_step`` decodes a chunk of events for all slots; a device-side
  ``alive`` mask retires slots MID-CHUNK on their eos row or at cache
  capacity (no silent decode past either), and their attention reads stop;
- the host loop collects rows per slot, retires slots on an eos row or
  exhausted budget, and immediately reuses them for queued requests.

Grammar masking and sampling semantics match sampling/generate.py exactly.

Host/device discipline: per-slot bookkeeping must fetch device arrays to the
host ONCE per step — indexing a device array per slot costs a full transfer
round trip each time.  Measured steady-state throughput (tv2o-medium, one
v5e chip, streaming all-heads paged kernel with exact-page tail DMAs +
fused token-row kernel + Pallas sampler, chunk=32, full occupancy;
tools/bench_batcher.py --steady, 2026-08-17): **9.1k events/sec at 32
slots, 20.4k at 128** (round 2: 8.2k / 18.1k; the round-1 dense/blend
design: 2.3k / 3.3k). ``kv_int8`` stores int8 pages + per-token scales:
HALF the cache HBM — the capacity option for many slots x long contexts
(128 slots x 4096 events: 6.7 GB instead of 12.9 GB); since the round-4
scoped-vmem root-cause fix (utils/xla_opts.py) the fused token-row kernel
stays on in every tv2o-medium configuration — int8 at 32 slots measures
8.4k ev/s (was 8.2k via the round-3 token-scan fallback).  The one
remaining gate is physical: >16-layer nets keep the kernel only up to 32
slots (see __init__).

Sampling draws on TPU come from the Pallas Gumbel-argmax kernel: the same
distribution as the XLA inverse-CDF sampler, but a different realized draw
for a given PRNG key (see sampling/topk_topp.py ``use_kernel``).

"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, midinet
from ..models.config import MIDIModelConfig
from ..models.llama import KVCache
from ..sampling.generate import _mask_arrays, decode_token_row_any
from ..sampling.masks import build_allow_vector, build_mask_table

PREFILL_BUCKETS = (16, 64, 256, 1024, 4096)


@dataclass
class _Slot:
    request_id: int = -1
    active: bool = False
    budget: int = 0
    produced: int = 0
    rows: List[np.ndarray] = field(default_factory=list)
    # rows delivered to a streaming callback so far (serve/batcher_service)
    streamed: int = 0


@dataclass
class Finished:
    request_id: int
    rows: np.ndarray  # [n, T] generated rows (prompt excluded)
    reason: str  # "eos" | "budget"


def _prefill_impl(params, config: MIDIModelConfig, prompt: jax.Array,
                  p_len: jax.Array, bucket: int,
                  tp_axis: Optional[str] = None):
    """Run the event net over a GROUP of padded prompts in one forward.

    prompt [G, bucket, T], p_len [G]; returns (k, v [L, G, bucket, H, D],
    h_last [G, D]).  Positions >= p_len contain pad-garbage that the
    per-row valid length keeps unattended after splicing.  Same-bucket
    requests admitted in one wave share this single batched forward (G is
    padded to a power of two, so at most 4 program variants per bucket
    ever compile) instead of G serial B=1 dispatches.

    ``tp_axis``: Megatron shard pass — ``config`` is then the LOCAL view
    (this shard's heads/mlp slice, sampling/sharded.tp_local_config) and
    the returned k/v hold only this shard's heads.
    """
    dtype = params["lm_head"].dtype
    g = prompt.shape[0]
    cache = KVCache.zeros(config.net, g, bucket, dtype=dtype)
    # Embed in 16-event chunks: the fused pad+clamp+gather of a whole
    # [G, bucket>=64, 8] prompt exceeds the 16 MB scoped-VMEM budget on
    # this XLA (same family as the train-path convert+gather bug; see
    # trainer.loss_fn). lax.map serializes the gathers, which is noise next
    # to the transformer forward.
    t_max = prompt.shape[-1]
    emb = jax.lax.map(lambda c: midinet.embed_events(params, c),
                      prompt.reshape(g, -1, 16, t_max).swapaxes(0, 1))
    emb = emb.swapaxes(0, 1).reshape(g, bucket, -1)
    hidden, cache = llama.forward(params["net"], config.net, emb, cache=cache,
                                  prefill=True, tp_axis=tp_axis)
    h_last = jnp.take_along_axis(
        hidden, jnp.maximum(p_len - 1, 0)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0]
    return cache.k, cache.v, h_last


@functools.lru_cache(maxsize=4)
def _prefill_jitted(backend: str):
    """Jitted ``_prefill_impl`` with the scoped-VMEM raise on TPU: even with
    the 16-event embed chunking above, the fused pad+clamp+gather tips the
    16 MB default by ~60 KB at the (bucket=256, group=8) variant ("Scoped
    allocation with size 16.06M and limit 16.00M", 2026-08-19 — surfaced by
    tools/bench_batcher.py --churn, whose mixed prompt lengths exercise
    prefill buckets the steady-state bench never compiles)."""
    from ..utils.xla_opts import decode_step_compiler_options

    opts = decode_step_compiler_options() if backend == "tpu" else None
    return jax.jit(_prefill_impl, static_argnames=("config", "bucket"),
                   compiler_options=opts)


def _prefill_request(*args, **kwargs):
    return _prefill_jitted(jax.default_backend())(*args, **kwargs)


def _splice_impl(slot, mine, p_len, pools, hidden_all, index_all,
                 pre_k, pre_v, h_last, *, page_size: int, pages_per_slot: int,
                 n_slots: int):
    """Install a prefilled request into slot ``slot``'s page range.

    pre_k/pre_v: dense prefill cache [L, 1, bucket, Hkv, D] (bucket a multiple
    of page_size); packed to the all-heads flat page layout
    [L, bucket/ps, ps, Hkv*LANE] (quantized to int8 pages + scales when the
    pools are) and written with one dynamic-update-slice per layer at the
    slot's (layer-folded) page base.

    ``mine`` (traced bool): when False the update is a no-op — the sharded
    batcher runs this on every data shard with only the owning shard's
    ``mine`` true (``slot`` is then the shard-local slot index, already
    clamped into range).
    """
    from ..ops.paged_allheads import combine_scales, pack_heads, quantize_packed

    l_n, _, bucket, hkv, d = pre_k.shape
    n_pages = bucket // page_size

    def paged(x):  # [L, bucket, w] -> [L, n_pages, ps, w]
        return x.reshape(l_n, n_pages, page_size, x.shape[-1])

    if pools.quantized:
        kq, ks = quantize_packed(pre_k[:, 0], hkv, d)
        vq, vs = quantize_packed(pre_v[:, 0], hkv, d)
        planes = dict(k=paged(kq), v=paged(vq),
                      scales=paged(combine_scales(ks, vs, hkv)))
    else:
        planes = dict(k=paged(pack_heads(pre_k[:, 0], hkv, d)),
                      v=paged(pack_heads(pre_v[:, 0], hkv, d)))

    def body(carry, pre):
        pools, li = carry
        base = (li * n_slots + slot) * pages_per_slot
        updated = {}
        for name in planes:
            buf = getattr(pools, name)
            new = pre[name].astype(buf.dtype)
            cur = jax.lax.dynamic_slice(buf, (base, 0, 0), new.shape)
            new = jnp.where(mine, new, cur)
            updated[name] = jax.lax.dynamic_update_slice(buf, new, (base, 0, 0))
        return (pools._replace(**updated), li + 1), None

    (pools, _), _ = jax.lax.scan(
        body, (pools, jnp.zeros((), jnp.int32)), planes)
    hidden_all = hidden_all.at[slot].set(
        jnp.where(mine, h_last, hidden_all[slot]))
    index_all = index_all.at[slot].set(
        jnp.where(mine, p_len, index_all[slot]))
    return pools, hidden_all, index_all


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("page_size", "pages_per_slot", "n_slots"))
def _splice_slot(slot, p_len, pools, hidden_all, index_all,
                 pre_k, pre_v, h_last, *, page_size: int, pages_per_slot: int,
                 n_slots: int):
    """Single-chip splice (see :func:`_splice_impl`)."""
    return _splice_impl(slot, True, p_len, pools, hidden_all, index_all,
                        pre_k, pre_v, h_last, page_size=page_size,
                        pages_per_slot=pages_per_slot, n_slots=n_slots)


@functools.partial(jax.jit, donate_argnums=(3,),
                   static_argnames=("page_size", "pages_per_slot", "n_slots"))
def _splice_group(slots, p_lens, valid, pools, hidden_all, index_all,
                  pre_k, pre_v, h_last, *, page_size: int,
                  pages_per_slot: int, n_slots: int):
    """Install a whole admission group in ONE dispatch (single-chip).

    slots/p_lens/valid: [G]; pre_k/pre_v: [L, G, bucket, Hkv, D] (the
    batched-prefill output); h_last: [G, D].  Scans :func:`_splice_impl`
    over the group; padded members (``valid`` False) are no-ops via its
    ``mine`` plumbing.  One program caches per (bucket, G) pair — ``_admit``
    already pads G to a power of two capped at ``_MAX_PREFILL_GROUP``, so
    an admission wave of k same-bucket requests costs TWO dispatches
    (prefill + splice) instead of 1 + k; under churn the per-request splice
    chain was the measured admission-wave p99 driver (BASELINE.md round-5
    churn note)."""

    def body(carry, xs):
        pools, hidden_all, index_all = carry
        slot, p_len, ok, pk, pv, hl = xs
        pools, hidden_all, index_all = _splice_impl(
            slot, ok, p_len, pools, hidden_all, index_all,
            pk[:, None], pv[:, None], hl, page_size=page_size,
            pages_per_slot=pages_per_slot, n_slots=n_slots)
        return (pools, hidden_all, index_all), None

    (pools, hidden_all, index_all), _ = jax.lax.scan(
        body, (pools, hidden_all, index_all),
        (slots, p_lens, valid, jnp.moveaxis(pre_k, 1, 0),
         jnp.moveaxis(pre_v, 1, 0), h_last))
    return pools, hidden_all, index_all


def _step_impl(params, config: MIDIModelConfig, carry, masks, active, temp,
               top_p, top_k, slot_seed, chunk: int, greedy: bool = False,
               allow=None, fused=None, merged=None, *, page_size: int,
               pages_per_slot: int, token_kernel_ok: bool = True,
               token_stream_mlp: bool = False,
               tp_axis: Optional[str] = None):
    """Decode ``chunk`` events for all slots (one dispatch).

    ``merged`` (ops.event_loop.prepare_inputs output, built once by the
    batcher): the whole chunk runs as ONE ragged whole-event-loop kernel
    dispatch — token rows sampled AND event net advanced in-kernel, the
    token-net weights fetched once per CHUNK instead of once per event
    (~56 MB/event of HBM traffic deleted at tv2o-medium), the event-net
    weights streaming through a rotation that crosses event boundaries.
    Slot semantics (retirement, seeds, knobs, allow planes) are identical
    to the split scan below — asserted slot-for-slot in
    tests/test_batcher_merged.py.

    carry = (pools, index [B], hidden [B, D]); allow [B, V] 0/1 (optional):
    per-slot constraint plane (requests with different instrument/channel
    bans share the batch — masks.build_allow_vector).
    Returns (carry, rows [B, chunk, T]).

    ``fused`` (ops.fused_step.prepare_fused output, built ONCE by the
    batcher at construction — per-step concats would re-stream all layer
    weights every chunk) selects the whole-step event-net kernel: all
    layers in one dispatch with the per-layer weights double-buffered
    across the layer grid, ragged per-slot lengths and the ``alive`` mask
    handled in-kernel.

    A device-side ``alive`` mask retires a slot mid-chunk the moment it emits
    an eos row or reaches cache capacity: its later rows are pad, its index
    stops advancing, and the paged attention kernel skips it entirely —
    no wasted decode past retirement (round-1 weakness #3) and no silent
    writes past capacity (advisor finding #3).

    ``slot_seed`` [B] uint32: per-slot PRNG seeds.  Each event's per-row key
    is fold_in(PRNGKey(seed_b), index_b) — a slot's draw stream depends only
    on its request's seed and its own sequence position, NOT on the chunk
    boundary, the slot number, or which other requests share the batch, so
    a seeded request reproduces exactly under any batch composition
    (tests/test_batcher_seed.py).
    """
    dtype = params["lm_head"].dtype
    eos_id = config.tokenizer.eos_id
    pools, index, hidden = carry
    b = hidden.shape[0]
    capacity = page_size * pages_per_slot

    if merged is not None:
        from ..ops import event_loop

        t_max = config.tokenizer.max_token_seq
        if greedy:
            gumbel = jnp.zeros((chunk, t_max * b, event_loop.K_CAP),
                               jnp.float32)
        else:
            # per-slot per-position streams: EXACTLY the split path's
            # fold_in(PRNGKey(seed), index) keys fed through token_loop's
            # per-row gumbel layout, so a seeded request reproduces across
            # the merged/split paths and any batch composition
            def g_event(e):
                keys = jax.vmap(lambda s, ix: jax.random.fold_in(
                    jax.random.PRNGKey(s), ix + e))(slot_seed, index)
                return jnp.swapaxes(
                    jax.vmap(lambda k2: jax.random.gumbel(
                        k2, (t_max, event_loop.K_CAP), jnp.float32))(keys),
                    0, 1).reshape(t_max * b, event_loop.K_CAP)

            gumbel = jax.vmap(g_event)(jnp.arange(chunk))
        allow_in = (allow if allow is not None
                    else jnp.ones((b, config.tokenizer.vocab_size),
                                  jnp.float32))
        rows_e, xout, pools = event_loop.merged_decode_ragged(
            merged, config, hidden, pools, index, active, allow_in,
            temp, top_p, top_k, gumbel, page_size=page_size,
            pages_per_slot=pages_per_slot, n_events=chunk, greedy=greedy)
        hidden = llama.rms_norm(xout, merged["final_norm"],
                                config.net.rms_norm_eps)
        # a slot advanced once per non-pad row (the eos row advances, pad
        # rows after device-side retirement do not) — matches the split
        # scan's masked index updates exactly
        adv = jnp.sum(rows_e[:, :, 0] != config.tokenizer.pad_id,
                      axis=0).astype(jnp.int32)
        return ((pools, index + adv, hidden),
                jnp.transpose(rows_e, (1, 0, 2)))

    def one_event(carry, _):
        pools, index, hidden, alive = carry
        row_keys = jax.vmap(
            lambda s, ix: jax.random.fold_in(jax.random.PRNGKey(s), ix))(
                slot_seed, index)
        row, _ended = decode_token_row_any(
            params, config, hidden, masks, temp, top_p, top_k, row_keys,
            greedy, forced_pad=~alive, kernel_ok=token_kernel_ok,
            allow=allow, stream_mlp=token_stream_mlp)

        emb = midinet.embed_events(params, row[:, None, :])[:, 0]
        if fused is not None:
            from ..ops.fused_step import fused_decode_step

            h, pools = fused_decode_step(
                fused, config.net, emb.astype(dtype), pools, index, alive,
                page_size=page_size, pages_per_slot=pages_per_slot)
        else:
            h, pools = llama.decode_paged(
                params["net"], config.net, emb.astype(dtype), pools,
                index, alive, page_size=page_size,
                pages_per_slot=pages_per_slot, tp_axis=tp_axis)
        # only live slots advance / take the new hidden
        new_index = jnp.where(alive, jnp.minimum(index + 1, capacity), index)
        hidden_new = jnp.where(alive[:, None], h, hidden)
        # mid-chunk retirement: the eos row itself still went through the
        # event net (aligned-loop parity) but nothing after it does
        alive = alive & (row[:, 0] != eos_id) & (new_index < capacity)
        return (pools, new_index, hidden_new, alive), row

    (pools, index, hidden, _), rows = jax.lax.scan(
        one_event, (pools, index, hidden, active), None, length=chunk)
    return (pools, index, hidden), jnp.transpose(rows, (1, 0, 2))


@functools.lru_cache(maxsize=4)
def _step_jitted(backend: str):
    """Lazily jitted ``_step_impl`` with the scoped-VMEM raise on TPU —
    the serving chunk (32) is exactly the scan length at which XLA's
    custom-fusion cloning drops the Pallas kernels' explicit vmem limits
    (utils/xla_opts.py has the full story).  Keyed on the backend name:
    off-TPU backends reject the TPU-specific option, and a process that
    mixes backends (tests) must not inherit a stale jit."""
    from ..utils.xla_opts import decode_step_compiler_options

    opts = decode_step_compiler_options() if backend == "tpu" else None
    return jax.jit(_step_impl, donate_argnums=(2,),
                   static_argnames=("config", "chunk", "greedy",
                                    "page_size", "pages_per_slot",
                                    "token_kernel_ok",
                                    "token_stream_mlp"),
                   compiler_options=opts)


def _step(*args, **kwargs):
    return _step_jitted(jax.default_backend())(*args, **kwargs)


def _pool_specs(quantized: bool, tp: bool = False):
    from jax.sharding import PartitionSpec as P

    from ..ops.paged_allheads import PagedPools
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    m = MODEL_AXIS if tp else None
    return PagedPools(k=P(DATA_AXIS, None, m), v=P(DATA_AXIS, None, m),
                      scales=P(DATA_AXIS, None, m) if quantized else None)


def _make_dp_fns(mesh, quantized: bool, config: MIDIModelConfig, chunk: int,
                 greedy: bool, page_size: int, pages_per_slot: int,
                 token_kernel_ok: bool, local_slots: int, use_fused: bool,
                 tp: int = 1, token_stream_mlp: bool = False):
    """Build the jitted shard_map'd (step, splice, prefill) triple for a
    mesh-sharded batcher: slots are partitioned over the mesh's ``data``
    axis and every shard runs the full single-chip decode program on its
    local slots — zero cross-device traffic in the data direction (same
    scale-out story as sampling/sharded.py, which shard_maps only the
    *aligned* generate).

    ``tp > 1`` composes the Megatron model axis into the same programs:
    each model shard holds its heads/mlp slice of the event net (weights
    column/row-parallel, pools lane-sharded on the packed-head axis) and
    the per-layer o/down matmuls psum over ``model`` — tv2o-large bf16
    serves high slot counts without int8.  The token net + sampler stay
    replicated across the model axis (identical inputs -> bit-identical
    rows on every shard), so admission/retirement on the host is unchanged.

    PRNG: every slot carries its own seed (sharded over ``data`` with the
    other slot-indexed arrays), so draws are per-request streams — identical
    across mesh shapes AND to the single-chip batcher — while model shards
    stay in lockstep; greedy decode is bit-identical to the single-chip
    batcher slot-for-slot (tests/test_batcher_dp.py, test_batcher_tp.py).

    Returns (step, splice, prefill) — ``prefill`` is None when tp == 1
    (the single-chip ``_prefill_request`` works on replicated params).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    from ..sampling.sharded import shard_map, tp_local_config, tp_param_specs

    tp_on = tp > 1
    cfg_local = tp_local_config(config, tp) if tp_on else config
    tp_axis = MODEL_AXIS if tp_on else None
    pspec = tp_param_specs() if tp_on else P()
    pool_spec = _pool_specs(quantized, tp_on)
    carry_spec = (pool_spec, P(DATA_AXIS), P(DATA_AXIS))
    mask_spec = (P(), P(), P())

    def step_local(params, carry, masks, active, temp, top_p, top_k, allow,
                   slot_seed, fused):
        return _step_impl(params, cfg_local, carry, masks, active, temp,
                          top_p, top_k, slot_seed, chunk,
                          greedy, allow,
                          fused if use_fused and not tp_on else None,
                          page_size=page_size,
                          pages_per_slot=pages_per_slot,
                          token_kernel_ok=token_kernel_ok,
                          token_stream_mlp=token_stream_mlp, tp_axis=tp_axis)

    from ..utils.xla_opts import decode_step_compiler_options

    step_dp = jax.jit(
        shard_map(step_local, mesh=mesh,
                  in_specs=(pspec, carry_spec, mask_spec, P(DATA_AXIS),
                            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                            P(DATA_AXIS), P(DATA_AXIS), P()),
                  out_specs=(carry_spec, P(DATA_AXIS))),
        donate_argnums=(1,),
        compiler_options=decode_step_compiler_options())

    # prefill k/v come out holding only each model shard's heads
    pre_spec = P(None, None, None, MODEL_AXIS) if tp_on else P()

    def splice_local(slot, p_len, pools, hidden_all, index_all,
                     pre_k, pre_v, h_last):
        idx = jax.lax.axis_index(DATA_AXIS)
        rel = slot - idx * local_slots
        mine = (rel >= 0) & (rel < local_slots)
        rel = jnp.clip(rel, 0, local_slots - 1)
        return _splice_impl(rel, mine, p_len, pools, hidden_all, index_all,
                            pre_k, pre_v, h_last, page_size=page_size,
                            pages_per_slot=pages_per_slot,
                            n_slots=local_slots)

    splice_dp = jax.jit(
        shard_map(splice_local, mesh=mesh,
                  in_specs=(P(), P(), carry_spec[0], P(DATA_AXIS),
                            P(DATA_AXIS), pre_spec, pre_spec, P()),
                  out_specs=(carry_spec[0], P(DATA_AXIS), P(DATA_AXIS))),
        donate_argnums=(2,))

    prefill_tp = None
    if tp_on:
        @functools.partial(jax.jit, static_argnames=("bucket",))
        def prefill_tp(params, prompt, p_len, bucket):
            def inner(params, prompt, p_len):
                return _prefill_impl(params, cfg_local, prompt, p_len,
                                     bucket, tp_axis=MODEL_AXIS)

            return shard_map(inner, mesh=mesh,
                             in_specs=(pspec, P(), P()),
                             out_specs=(pre_spec, pre_spec, P()))(
                                 params, prompt, p_len)

    return step_dp, splice_dp, prefill_tp


class ContinuousBatcher:
    def __init__(self, params, config: MIDIModelConfig, n_slots: int = 8,
                 max_seq: int = 4096, chunk: int = 16, temp: float = 1.0,
                 top_p: float = 0.98, top_k: int = 20, seed: int = 0,
                 disable_eos: bool = False, greedy: bool = False,
                 page_size: int = 64, kv_int8: bool = False, mesh=None,
                 pipeline: Optional[bool] = None):
        """``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis shards the
        ``n_slots`` slots over its data dimension — every chip runs the full
        decode stack on its local slots with zero in-loop collectives, so
        throughput scales as chips × the single-chip numbers.  A ``model``
        axis of size > 1 additionally shards the event net Megatron-style
        (heads/mlp column- and row-parallel, pools lane-sharded, two psums
        per layer) — the tv2o-large bf16 capacity answer at high slot
        counts; ``kv_int8`` composes with it (each shard carries its own
        128-lane scale row — alloc_pools ``shards``) for maximum contexts
        per HBM byte.  The host-side API (submit/step/run_all) is
        unchanged; ``n_slots`` must divide by the data-axis size.

        ``pipeline``: dispatch chunk N+1 before fetching chunk N's rows so
        the host fetch round-trip and bookkeeping overlap device compute
        (see :meth:`step`).  Default: on when the backend is TPU (where the
        tunnel round-trip is the measured bottleneck at 32 slots), off
        elsewhere.  Per-request outputs are identical either way
        (tests/test_batcher_pipeline.py)."""
        import os

        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

        self.mesh = mesh
        dp = int(mesh.shape[DATA_AXIS]) if mesh is not None else 1
        tp = int(dict(mesh.shape).get(MODEL_AXIS, 1)) if mesh is not None else 1
        if n_slots % dp:
            raise ValueError(f"n_slots={n_slots} not divisible by the mesh's "
                             f"data axis size {dp}")
        self.tp = tp
        local_slots = n_slots // dp
        # Rounds 2-3 fenced n_slots=64 after the remote TPU compiler rejected
        # exactly-64-slot batcher programs.  Round 4 narrowed it (tools/
        # repro_64slot_crash.py): the embed_events gather fusion lands 60 KB
        # over the DEFAULT scoped-vmem budget at exactly 512 gather rows
        # (64 slots x 8 tokens); with the decode_step_compiler_options()
        # raise that _step_jitted() always applies, the full 64-slot program
        # compiles and runs (verified on the live v5e, 2026-08-19), so the
        # fence is gone.
        self.greedy = greedy
        self.params = params
        self.config = config
        self.tokenizer = config.tokenizer
        self.n_slots = n_slots
        self.local_slots = local_slots
        self.page_size = page_size
        # Round 3 fenced the token-row kernel off for int8-at-<=64-slots and
        # >16-layer nets after compile rejections that looked like the two
        # decode kernels' scoped-vmem limits "summing".  Round 4 root-caused
        # them: XLA's custom-fusion cloning DROPS a pallas_call's explicit
        # vmem limit at long scan lengths and the 16 MB program default
        # rejects it (utils/xla_opts.py) — _step_jitted() now compiles with
        # the program default raised, and every medium combination
        # co-compiles.  One PHYSICAL limit remains (measured 2026-08-19):
        # tv2o-large's 6-layer token net keeps ~98 MB of weights VMEM-
        # resident and the kernel's register spills scale with the slot
        # count — at 128 slots the program needs 141.7 MB of the chip's
        # 128 MB VMEM (bf16 and int8 alike) and the compiler rejects it
        # outright; 32 slots fit and measure 5,891 ev/s.  No raise can
        # create VMEM — but round 5 STREAMS the deep net's MLP weights
        # through a 2-slot rotation instead (ops/token_loop.py
        # ``stream_mlp``): residency drops ~59 MB for a ~19.7 MB double
        # buffer and large keeps its token kernel above 32 slots.  The
        # predicate lives in serve/capacity.py — the capacity matrix
        # documents exactly what this gate decides.
        from .capacity import token_kernel_layout
        layout = token_kernel_layout(
            config.net.num_layers, local_slots,
            config.net_token.intermediate_size
            <= config.net_token.hidden_size)
        self._token_kernel_ok = layout is not None
        self._token_stream_mlp = layout == "stream"
        # whole 4-page kernel compute blocks (a non-multiple forces one-page
        # DMAs in the paged kernel — measured 1.5-1.7x slower)
        block = 4 * page_size
        if max_seq % block:
            max_seq = ((max_seq + block - 1) // block) * block
        self.max_seq = max_seq
        self.pages_per_slot = max_seq // page_size
        self.chunk = chunk
        self.temp, self.top_p, self.top_k = temp, top_p, top_k
        self.masks = _mask_arrays(build_mask_table(config.tokenizer,
                                                   disable_eos=disable_eos))
        dtype = params["lm_head"].dtype
        net = config.net
        from ..ops.paged_allheads import alloc_pools

        n_pages = net.num_layers * n_slots * self.pages_per_slot
        self._pools = alloc_pools(
            net.kv_heads, n_pages, page_size, net.head_dim, dtype,
            quantized=kv_int8, shards=tp)
        # The whole-step event-net kernel stays OFF in the batcher even
        # though the round-4 scoped-vmem root-cause fix (see _step_jitted)
        # lets it co-compile with the token-row kernel: measured on the v5e
        # (2026-08-19), fused+token is SLOWER than the split streaming path
        # at 32 slots (8,400 vs 9,277 ev/s — the batcher's ragged per-slot
        # lengths defeat the layer-grid weight stream's amortization) and
        # identical at 128 slots (21.1k, cache-bandwidth-bound either way).
        # The round-4 int8@128 runtime FailedPrecondition with it on no
        # longer reproduces (2026-08-20: tools/repro_int8_fused.py runs the
        # forced combination clean at 28.2k ev/s — the production
        # scoped-VMEM raise, added later in round 4, also cleared it).
        # Aligned decode_events keeps the fused kernel — equal-length rows
        # are exactly the regime it wins in (13.9k vs 11.7k split).
        # tools/probe_both_kernels_real.py re-measures the combination.
        self._fused = None
        # Round 5: the RAGGED whole-event-loop kernel replaces the split
        # scan at <= 64 local slots (event_loop.merged_decode_ragged): the
        # whole chunk is ONE dispatch, token-net weights fetched once per
        # chunk instead of once per event — the round-4 gap between the
        # shipped 32-slot default (8-9k ev/s) and aligned decode (14.8k at
        # the same width) was exactly this re-staging.  Above 32 local
        # slots the kernel's slot-scaled VMEM stack outgrows the chip in
        # every layout (event_loop.plan_layout has the measured compile
        # reports), so 64/128 slots keep the split streaming path — which
        # the step pipeline still overlaps with the host.
        from ..ops import event_loop

        self._merged = None
        if (mesh is None
                and event_loop.usable(params, config, self._pools)):
            stream = event_loop.plan_layout(params, config, local_slots)
            if stream is not None:
                self._merged = event_loop.prepare_inputs(
                    params, config, self.masks, stream_tok_mlp=stream)
        self._index = jnp.zeros((n_slots,), jnp.int32)
        self._hidden = jnp.zeros((n_slots, config.n_embd), dtype)
        self._prefill_tp = None
        if mesh is not None:
            # shard every slot-indexed buffer over the data axis (and the
            # pools' packed-head lane axis over model when tp > 1); the pool
            # page axis is (layer*local_slots + local_slot)-major PER SHARD,
            # so the global page index means nothing off-device — only the
            # shard_map'd programs below ever index it.
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(mesh, P(DATA_AXIS))
            pool_sh = jax.tree.map(
                lambda s: NamedSharding(mesh, s), _pool_specs(kv_int8, tp > 1),
                is_leaf=lambda x: isinstance(x, P))
            self._pools = jax.tree.map(jax.device_put, self._pools, pool_sh)
            self._index = jax.device_put(self._index, shard)
            self._hidden = jax.device_put(self._hidden, shard)
            if tp > 1:
                from ..sampling.sharded import tp_shard_params
                self.params = params = tp_shard_params(params, mesh)
            self._step_dp, self._splice_dp, self._prefill_tp = _make_dp_fns(
                mesh, kv_int8, config, chunk, greedy, page_size,
                self.pages_per_slot, self._token_kernel_ok, local_slots,
                use_fused=self._fused is not None, tp=tp,
                token_stream_mlp=self._token_stream_mlp)
        self._active = np.zeros((n_slots,), bool)
        # host mirror of the device per-slot index (see step()): advanced
        # from the decoded rows, reset by _install — no per-step fetch
        self._index_host = np.zeros((n_slots,), np.int64)
        # per-slot sampling knobs (requests override batcher defaults)
        self._temp = np.full((n_slots,), temp, np.float32)
        self._top_p = np.full((n_slots,), top_p, np.float32)
        self._top_k = np.full((n_slots,), top_k, np.int32)
        # per-slot constraint plane (requests with instrument/channel bans
        # share the batch); all-ones slots keep the unconstrained program
        self._allow = np.ones((n_slots, config.tokenizer.vocab_size),
                              np.float32)
        # per-slot PRNG seeds: each request decodes from its own stream keyed
        # by (seed, position), so a seeded request reproduces exactly under
        # any batch composition; unseeded requests get a deterministic
        # per-request seed derived from (batcher seed, request id)
        self._seed = np.zeros((n_slots,), np.uint32)
        self._base_seed = seed
        self.slots = [_Slot() for _ in range(n_slots)]
        self.queue: List[tuple] = []
        self._next_id = 0
        self.pipeline = (jax.default_backend() == "tpu" if pipeline is None
                         else bool(pipeline))
        # pipelined mode: the not-yet-fetched (rows, snapshot) of the chunk
        # dispatched by the previous step() call
        self._inflight = None

    # ---- submission ------------------------------------------------------

    def submit(self, prompt_rows, max_events: int, temp: float = None,
               top_p: float = None, top_k: int = None, seed: int = None,
               disable_patch_change: bool = False,
               disable_control_change: bool = False,
               disable_channels=None) -> int:
        """Queue a request; returns its request id.

        ``temp``/``top_p``/``top_k`` override the batcher defaults FOR THIS
        REQUEST's slot — the decode kernels take per-row sampling knobs, so
        requests with different UI slider settings share one batch.  The
        ``disable_*`` grammar constraints are likewise per-request: they
        become the slot's row of the [B, V] allow plane
        (masks.build_allow_vector), so one batch serves requests with
        different instrument/channel bans.  ``seed`` pins this request's
        draw stream: resubmitting the same prompt with the same seed yields
        the same rows no matter which slot it lands in or what else shares
        the batch (the reference's per-run torch seed, app.py generator).
        """
        rid = self._next_id
        self._next_id += 1
        if seed is None:
            seed = int(np.random.SeedSequence(
                [self._base_seed, rid]).generate_state(1)[0])
        prompt = np.asarray(prompt_rows, dtype=np.int32)
        if prompt.ndim != 2:
            raise ValueError("prompt must be [events, max_token_seq]")
        knobs = (self.temp if temp is None else temp,
                 self.top_p if top_p is None else top_p,
                 self.top_k if top_k is None else top_k)
        if disable_patch_change or disable_control_change or disable_channels:
            allow = build_allow_vector(
                self.tokenizer, disable_patch_change=disable_patch_change,
                disable_control_change=disable_control_change,
                disable_channels=disable_channels).astype(np.float32)
        else:
            allow = None
        self.queue.append((rid, prompt, max_events, knobs, allow,
                           np.uint32(seed & 0xFFFFFFFF)))
        self._admit()
        return rid

    _MAX_PREFILL_GROUP = 8  # caps the batched-prefill scratch cache size

    def _admit(self):
        """Move queued requests into free slots.

        Same-bucket requests in the wave share ONE batched prefill forward
        (G padded to a power of two, capped at ``_MAX_PREFILL_GROUP``) —
        a flood of short requests previously paid one serial B=1 prefill
        dispatch each; splices stay per-request (cheap page writes).
        """
        free = [i for i, s in enumerate(self.slots) if not s.active]
        if not free or not self.queue:
            return
        take = self.queue[: len(free)]
        del self.queue[: len(take)]
        ps = self.page_size
        t_max = self.tokenizer.max_token_seq
        groups: Dict[int, list] = {}
        for item, slot in zip(take, free):
            p_len = item[1].shape[0]
            bucket = next(b for b in PREFILL_BUCKETS if b >= p_len)
            bucket = ((bucket + ps - 1) // ps) * ps  # whole pages
            groups.setdefault(bucket, []).append((slot, item))
        for bucket, members in groups.items():
            for at in range(0, len(members), self._MAX_PREFILL_GROUP):
                part = members[at: at + self._MAX_PREFILL_GROUP]
                g = len(part)
                gpad = 1 << (g - 1).bit_length()
                padded = np.full((gpad, bucket, t_max),
                                 self.tokenizer.pad_id, np.int32)
                p_lens = np.ones((gpad,), np.int32)
                for j, (_, (rid, prompt, *_rest)) in enumerate(part):
                    padded[j, : prompt.shape[0]] = prompt
                    p_lens[j] = prompt.shape[0]
                if self._prefill_tp is not None:
                    pre_k, pre_v, h_last = self._prefill_tp(
                        self.params, jnp.asarray(padded),
                        jnp.asarray(p_lens), bucket=bucket)
                else:
                    pre_k, pre_v, h_last = _prefill_request(
                        self.params, self.config, jnp.asarray(padded),
                        jnp.asarray(p_lens), bucket)
                if self.mesh is None:
                    # whole group in ONE splice dispatch (see _splice_group)
                    slots_arr = np.zeros((gpad,), np.int32)
                    valid = np.zeros((gpad,), bool)
                    for j, (slot, _item) in enumerate(part):
                        slots_arr[j] = slot
                        valid[j] = True
                    (self._pools, self._hidden, self._index) = _splice_group(
                        jnp.asarray(slots_arr), jnp.asarray(p_lens),
                        jnp.asarray(valid), self._pools, self._hidden,
                        self._index, pre_k, pre_v, h_last,
                        page_size=ps, pages_per_slot=self.pages_per_slot,
                        n_slots=self.n_slots)
                    for slot, item in part:
                        self._install_host(slot, item)
                else:
                    for j, (slot, item) in enumerate(part):
                        self._install(slot, item, pre_k[:, j: j + 1],
                                      pre_v[:, j: j + 1], h_last[j])

    def _install(self, slot: int, item, pre_k, pre_v, h_last):
        """Per-request splice + host install (sharded path; the single-chip
        path batches the splice across the group in ``_admit``)."""
        rid, prompt, *_rest = item
        p_len = prompt.shape[0]
        ps = self.page_size
        if self.mesh is not None:
            (self._pools, self._hidden, self._index) = self._splice_dp(
                jnp.asarray(slot, jnp.int32), jnp.asarray(p_len, jnp.int32),
                self._pools, self._hidden, self._index, pre_k, pre_v, h_last)
        else:
            (self._pools, self._hidden, self._index) = _splice_slot(
                jnp.asarray(slot, jnp.int32), jnp.asarray(p_len, jnp.int32),
                self._pools, self._hidden, self._index,
                pre_k, pre_v, h_last, page_size=ps,
                pages_per_slot=self.pages_per_slot, n_slots=self.n_slots)
        self._install_host(slot, item)

    def _install_host(self, slot: int, item):
        rid, prompt, budget, knobs, allow, seed = item
        p_len = prompt.shape[0]
        s = self.slots[slot]
        self._index_host[slot] = p_len
        s.request_id = rid
        s.active = True
        s.budget = budget
        s.produced = 0
        s.rows = []
        s.streamed = 0
        self._active[slot] = True
        t, p, k = knobs if knobs is not None else (self.temp, self.top_p,
                                                   self.top_k)
        self._temp[slot] = t
        self._top_p[slot] = p
        self._top_k[slot] = k
        self._seed[slot] = seed
        self._allow[slot] = 1.0 if allow is None else allow

    # ---- decoding --------------------------------------------------------

    @property
    def any_active(self) -> bool:
        return (bool(self._active.any()) or bool(self.queue)
                or self._inflight is not None)

    def step(self, on_rows=None) -> List[Finished]:
        """Decode one chunk for all active slots; returns finished requests.

        ``on_rows(request_id, rows [n, T])`` (optional) streams each live
        slot's freshly decoded rows as they land — the serving layer's
        per-request streaming hook (serve/batcher_service.py).

        With ``pipeline=True`` the next chunk is DISPATCHED before the
        previous chunk's rows are fetched, so the host fetch round-trip
        (~30 ms on the tunnel) and the bookkeeping overlap device compute —
        measured +~35%% steady-state at 32 slots.  Semantics shift by one
        chunk: admissions and host-side (budget) retirements take effect a
        chunk late (the overshoot rows are decoded deterministically and
        discarded; device-side eos/capacity retirement is unaffected), and
        each step() returns the PREVIOUS chunk's results.  Per-request
        output streams are identical — the seed streams are position-keyed.
        """
        if self._inflight is None and not self._active.any():
            self._admit()
            if not self._active.any():
                return []
        if not self.pipeline:
            rows, snap = self._dispatch()
            finished = self._process(np.asarray(rows), snap, on_rows)
            self._admit()
            return finished
        prev = self._inflight
        self._inflight = (self._dispatch() if self._active.any()
                          else None)
        finished = []
        if prev is not None:
            rows, snap = prev
            finished = self._process(np.asarray(rows), snap, on_rows)
        self._admit()
        return finished

    def _dispatch(self):
        """Enqueue one chunk; returns (rows device array, snapshot).

        The snapshot pins which request occupied each slot at dispatch time
        — pipelined processing must discard rows of slots reused since."""
        snap = (self._active.copy(),
                np.asarray([s.request_id for s in self.slots]))
        carry = (self._pools, self._index, self._hidden)
        temp = jnp.asarray(self._temp)
        top_p = jnp.asarray(self._top_p)
        top_k = jnp.asarray(self._top_k)
        seeds = jnp.asarray(self._seed)
        # the constraint plane only enters the program when some slot has a
        # ban (None keeps the unconstrained program; both variants cache)
        allow = (None if np.all(self._allow == 1.0)
                 else jnp.asarray(self._allow))
        if self.mesh is not None:
            allow_dp = (jnp.asarray(self._allow) if allow is None else allow)
            carry, rows = self._step_dp(self.params, carry, self.masks,
                                        jnp.asarray(self._active), temp,
                                        top_p, top_k, allow_dp, seeds,
                                        self._fused if self._fused is not None
                                        else {})
        else:
            carry, rows = _step(self.params, self.config, carry, self.masks,
                                jnp.asarray(self._active), temp,
                                top_p, top_k, seeds, self.chunk,
                                self.greedy, allow, self._fused,
                                self._merged,
                                page_size=self.page_size,
                                pages_per_slot=self.pages_per_slot,
                                token_kernel_ok=self._token_kernel_ok,
                                token_stream_mlp=self._token_stream_mlp)
        (self._pools, self._index, self._hidden) = carry
        return rows, snap  # rows NOT fetched here — step() decides when

    def _process(self, rows: np.ndarray, snap, on_rows) -> List[Finished]:
        """Host bookkeeping for one fetched chunk; returns finished requests.

        ``snap`` is the dispatch-time (active, request_id) snapshot.  A slot
        whose occupancy changed since dispatch (pipelined mode: retired
        host-side, possibly reused) has its rows DISCARDED — they belong to
        the previous occupant's deterministic overshoot, which the previous
        occupant already finished without.
        """
        snap_active, snap_rid = snap
        cur_rid = np.asarray([s.request_id for s in self.slots])
        own = (snap_active & self._active & (snap_rid == cur_rid))
        # HOST MIRROR of the device index — zero extra fetches.  The device
        # advances a slot exactly once per non-pad row it emits (the eos row
        # advances; pad rows after device-side retirement do not, and the
        # advance clamps at capacity because alive clears there), so the
        # mirror is exact.  A second per-step device fetch measured ~30 ms
        # of tunnel round-trip — at 32 slots the step was HOST-bound:
        # ~60 ms host+tunnel vs ~50 ms device (round-5 A/B probes).
        # Only still-owned slots advance the mirror: a reused slot's mirror
        # was reset to the new prompt length by _install (and the device
        # index by the splice, which is queued AFTER the overshoot chunk).
        nonpad = (rows[:, :, 0] != self.tokenizer.pad_id).sum(1)
        self._index_host[own] += nonpad[own]
        np.minimum(self._index_host, self.max_seq, out=self._index_host)
        index_host = self._index_host

        finished: List[Finished] = []
        eos_id = self.tokenizer.eos_id
        pad_id = self.tokenizer.pad_id
        for b, slot in enumerate(self.slots):
            if not own[b]:
                continue
            for n in range(rows.shape[1]):
                row = rows[b, n]
                done_reason = None
                if row[0] == eos_id:
                    done_reason = "eos"
                elif row[0] == pad_id:
                    # the device-side alive mask retired this slot earlier in
                    # the chunk (cache capacity); rows from there on are pad
                    done_reason = "budget"
                else:
                    slot.rows.append(row)
                    slot.produced += 1
                    if slot.produced >= slot.budget:
                        done_reason = "budget"
                # cache at capacity: the device clamps index at max_seq and
                # stops decoding this slot — retire it at CHUNK END only
                # (index_host is the end-of-chunk index; checking it on an
                # earlier row dropped the valid rows decoded between that
                # row and the capacity boundary — found by the merged-path
                # chunk-invariance test, tests/test_batcher_merged.py)
                if (done_reason is None and n == rows.shape[1] - 1
                        and int(index_host[b]) >= self.max_seq):
                    done_reason = "budget"
                if done_reason:
                    finished.append(Finished(
                        request_id=slot.request_id,
                        rows=(np.stack(slot.rows) if slot.rows
                              else np.zeros((0, rows.shape[2]), np.int32)),
                        reason=done_reason))
                    slot.active = False
                    self._active[b] = False
                    # retired slots drop their constraint row so an all-
                    # unconstrained batch returns to the plane-free program
                    self._allow[b] = 1.0
                    break
            if on_rows is not None and slot.streamed < len(slot.rows):
                on_rows(slot.request_id,
                        np.stack(slot.rows[slot.streamed:]))
                slot.streamed = len(slot.rows)
        return finished

    def run_all(self, max_steps: int = 10_000) -> Dict[int, Finished]:
        """Drive until every submitted request finishes."""
        results: Dict[int, Finished] = {}
        for _ in range(max_steps):
            if not self.any_active:
                break
            for fin in self.step():
                results[fin.request_id] = fin
        return results
