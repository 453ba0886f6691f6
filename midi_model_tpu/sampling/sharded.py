"""Multi-chip serving: data-parallel sharded generation over a device mesh.

Generation is embarrassingly parallel over the batch — the production
scale-out is to shard the batch over the ``data`` mesh axis and run the full
single-chip decode stack (paged pools, fused token-row kernel, Pallas
sampler) independently per device, with ZERO cross-device traffic in the
loop.  ``shard_map`` expresses exactly that: every device executes the local
program on its batch shard, so the Pallas kernels see ordinary local shapes
(the automatic SPMD partitioner would treat them as opaque).

Equivalent reference capability: serving is single-process CUDA
(/root/reference/app.py:369 ``batch_size``); multi-GPU serving does not
exist there.  Throughput scales as chips x the single-chip numbers in
BASELINE.md (no collectives to amortize).

Per-shard state divergence (a shard may hit all-eos or cache capacity while
others continue) is carried in ``GenState.cur_len`` / ``all_eos`` with one
entry per data shard; each shard sees its own scalar.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import functools as _ft

try:
    shard_map = _ft.partial(jax.shard_map, check_vma=False)
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map as _sm
    shard_map = _ft.partial(_sm, check_rep=False)
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import MIDIModelConfig
from ..parallel.mesh import DATA_AXIS
from .generate import (GenState, _mask_arrays, build_mask_table,
                       decode_events, normalize_prompt, prefill)


def _state_specs(quantized: bool):
    """PartitionSpecs for a GenState: pools/hidden sharded over data (the
    pool page axis is (layer*batch_local + slot)-major per shard), per-shard
    scalars as [dp] vectors."""
    from ..ops.paged_allheads import PagedPools

    pools = PagedPools(k=P(DATA_AXIS), v=P(DATA_AXIS),
                       scales=P(DATA_AXIS) if quantized else None)
    return GenState(pools=pools, hidden=P(DATA_AXIS), cur_len=P(DATA_AXIS),
                    all_eos=P(DATA_AXIS))


def prefill_dp(params, config: MIDIModelConfig, prompt: jax.Array,
               max_seq: int, mesh: Mesh, kv_int8: bool = False) -> GenState:
    """Sharded prefill: ``prompt [B, L, T]`` with B divisible by the mesh's
    ``data`` size.  Returns a GenState whose cur_len/all_eos are [dp]."""
    specs = _state_specs(kv_int8)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=specs)
    def run(params, prompt):
        st = prefill(params, config, prompt, max_seq, kv_int8=kv_int8)
        return st._replace(cur_len=st.cur_len[None],
                           all_eos=st.all_eos[None])

    return run(params, prompt)


def decode_events_dp(params, config: MIDIModelConfig, state: GenState, masks,
                     n_events_chunk: int, temp, top_p, top_k, key,
                     mesh: Mesh, greedy: bool = False):
    """Sharded decode chunk.  Each data shard folds its axis index into the
    PRNG key and runs the local fused decode loop; a shard whose rows all
    emitted eos (or whose cache filled) no-ops its remaining iterations.

    Returns (state, rows [B, n, T] data-sharded, n_done [dp]).
    """
    quantized = state.pools.quantized
    specs = _state_specs(quantized)
    from ..utils.xla_opts import decode_step_compiler_options

    # the nested decode_events jit inlines, so its scoped-vmem raise
    # (utils/xla_opts.py) must ride on THIS program's compile
    @functools.partial(jax.jit, donate_argnums=(1,),
                       compiler_options=decode_step_compiler_options())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), specs, (P(), P(), P()), P()),
        out_specs=(specs, P(DATA_AXIS), P(DATA_AXIS)))
    def run(params, state, masks, key):
        idx = jax.lax.axis_index(DATA_AXIS)
        local = state._replace(cur_len=state.cur_len[0],
                               all_eos=state.all_eos[0])
        st, rows, n_done = decode_events(
            params, config, local, masks, n_events_chunk, temp, top_p,
            top_k, jax.random.fold_in(key, idx), greedy=greedy)
        return (st._replace(cur_len=st.cur_len[None],
                            all_eos=st.all_eos[None]),
                rows, n_done[None])

    return run(params, state, tuple(masks), key)


def generate_dp(params, config: MIDIModelConfig, mesh: Mesh,
                prompt: Optional[np.ndarray] = None, batch_size: int = 32,
                max_len: int = 512, temp: float = 1.0, top_p: float = 0.98,
                top_k: int = 20, seed: int = 0, greedy: bool = False,
                disable_patch_change: bool = False,
                disable_control_change: bool = False,
                disable_channels: Optional[list] = None,
                chunk_size: Optional[int] = None, context_limit: int = 4096,
                kv_int8: bool = False, event_callback=None) -> np.ndarray:
    """Host-facing multi-chip generation (mirrors generate(); global
    ``batch_size`` must divide by the mesh's ``data`` size).

    Rows of shards that finish early are pad rows (skipped by detokenize);
    sampling streams are per-shard (``fold_in(key, shard_index)``), so
    outputs match single-chip generation shard by shard.
    """
    dp = mesh.shape[DATA_AXIS]
    if batch_size % dp:
        raise ValueError(f"batch_size {batch_size} not divisible by dp={dp}")
    tokenizer = config.tokenizer
    prompt = normalize_prompt(tokenizer, prompt, batch_size)
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
    state = prefill_dp(params, config, jnp.asarray(prompt), max_len, mesh,
                       kv_int8=kv_int8)
    key = jax.random.PRNGKey(seed)

    pieces = [head, prompt] if head.shape[1] else [prompt]
    produced = 0
    while produced < remaining:
        n = min(chunk, remaining - produced)
        key, sub = jax.random.split(key)
        state, rows, n_done = decode_events_dp(
            params, config, state, masks, n, temp, top_p, top_k, sub, mesh,
            greedy=greedy)
        n_done = np.asarray(n_done)
        n_max = int(n_done.max())
        rows_np = np.asarray(rows[:, :n_max])
        if n_max:
            pieces.append(rows_np)
            if event_callback is not None:
                event_callback(rows_np)
        produced += n
        if bool(np.asarray(state.all_eos).all()) or n_max < n:
            break
    return np.concatenate(pieces, axis=1)


# ---- tensor-parallel decode (model axis) --------------------------------
#
# Data-parallel serving replicates the weights and pools per chip; tv2o-large
# bf16 pools at high slot counts exceed one 16 GB chip (BASELINE.md config
# 5).  The model-axis path shards HEADS and the MLP intermediate across
# chips Megatron-style: qkv/gate/up column-parallel, o/down row-parallel
# with one psum each per layer ([B, D] messages over ICI), the paged pools
# lane-sharded so each chip stores and streams only its heads' pages.  The
# token net + sampler are replicated (identical inputs -> identical rows on
# every shard; they are ~15% of decode FLOPs).  Uses the split per-layer
# decode path: the whole-step fused kernel cannot psum between layers.

def tp_local_config(config: MIDIModelConfig, tp: int) -> MIDIModelConfig:
    """The per-shard view of the event net: heads / kv heads / intermediate
    divided by ``tp`` (hidden width and the token net stay global)."""
    import dataclasses

    net = config.net
    if net.num_heads % tp or net.kv_heads % tp or net.intermediate_size % tp:
        raise ValueError(f"tp={tp} must divide heads ({net.num_heads}), "
                         f"kv heads ({net.kv_heads}) and intermediate "
                         f"({net.intermediate_size})")
    local = dataclasses.replace(net, num_heads=net.num_heads // tp,
                                num_kv_heads=net.kv_heads // tp,
                                intermediate_size=net.intermediate_size // tp,
                                head_dim_override=net.head_dim)
    return dataclasses.replace(config, net=local)


def tp_param_specs() -> dict:
    """PartitionSpecs shard_map uses for the weight pytree (Megatron event
    net; token net + lm_head replicated)."""
    from ..parallel.mesh import MODEL_AXIS as M

    ev_layers = {
        "wq": P(None, None, M), "wk": P(None, None, M), "wv": P(None, None, M),
        "wo": P(None, M, None),
        "w_gate": P(None, None, M), "w_up": P(None, None, M),
        "w_down": P(None, M, None),
        "ln_attn": P(), "ln_mlp": P(),
    }
    rep_layers = {k: P() for k in ev_layers}
    return {
        "net": {"layers": ev_layers, "final_norm": P(), "embed": P()},
        "net_token": {"layers": rep_layers, "final_norm": P(), "embed": P()},
        "lm_head": P(),
    }


def tp_shard_params(params, mesh: Mesh):
    """Place the weight pytree on the mesh under :func:`tp_param_specs`."""
    from jax.sharding import NamedSharding

    specs = tp_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P))


def _tp_state_specs(quantized: bool = False):
    """Pools lane-sharded over the model axis.  int8 scale rows shard the
    same way: the global pool holds one 128-lane row PER SHARD
    (alloc_pools ``shards``), so each shard's local view is exactly the
    single-chip layout (lanes [0:Hkv_local] k, [Hkv_local:2·Hkv_local] v)."""
    from ..ops.paged_allheads import PagedPools
    from ..parallel.mesh import MODEL_AXIS as M

    pools = PagedPools(k=P(None, None, M), v=P(None, None, M),
                       scales=P(None, None, M) if quantized else None)
    return GenState(pools=pools, hidden=P(), cur_len=P(), all_eos=P())


def prefill_tp(params, config: MIDIModelConfig, prompt: jax.Array,
               max_seq: int, mesh: Mesh, kv_int8: bool = False) -> GenState:
    """Tensor-parallel prefill: every shard runs the event net on its head/
    mlp slices (two psums per layer) and packs pools holding only its heads."""
    from ..parallel.mesh import MODEL_AXIS

    tp = mesh.shape[MODEL_AXIS]
    local = tp_local_config(config, tp)
    specs = _tp_state_specs(kv_int8)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(tp_param_specs(), P()),
        out_specs=specs)
    def run(params, prompt):
        return prefill(params, local, prompt, max_seq, tp_axis=MODEL_AXIS,
                       kv_int8=kv_int8)

    return run(params, prompt)


def decode_events_tp(params, config: MIDIModelConfig, state: GenState, masks,
                     n_events_chunk: int, temp, top_p, top_k, key,
                     mesh: Mesh, greedy: bool = False):
    """Tensor-parallel decode chunk: per-layer Megatron step over the model
    axis; rows/sampling are replicated (bit-identical on every shard)."""
    from ..parallel.mesh import MODEL_AXIS

    tp = mesh.shape[MODEL_AXIS]
    local = tp_local_config(config, tp)
    specs = _tp_state_specs(state.pools.quantized)
    from ..utils.xla_opts import decode_step_compiler_options

    # nested decode_events inlines — carry the scoped-vmem raise here too
    @functools.partial(jax.jit, donate_argnums=(1,),
                       compiler_options=decode_step_compiler_options())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tp_param_specs(), specs, (P(), P(), P()), P()),
        out_specs=(specs, P(), P()))
    def run(params, state, masks, key):
        return decode_events(params, local, state, masks, n_events_chunk,
                             temp, top_p, top_k, key, greedy=greedy,
                             tp_axis=MODEL_AXIS)

    return run(params, state, tuple(masks), key)


def generate_tp(params, config: MIDIModelConfig, mesh: Mesh,
                prompt: Optional[np.ndarray] = None, batch_size: int = 32,
                max_len: int = 512, temp: float = 1.0, top_p: float = 0.98,
                top_k: int = 20, seed: int = 0, greedy: bool = False,
                chunk_size: Optional[int] = None,
                context_limit: int = 4096, kv_int8: bool = False) -> np.ndarray:
    """Host-facing tensor-parallel generation (params already placed by
    :func:`tp_shard_params`; batch replicated, pools lane-sharded; int8
    pools compose — per-shard scale rows, see :func:`_tp_state_specs`)."""
    tokenizer = config.tokenizer
    prompt = normalize_prompt(tokenizer, prompt, batch_size)
    head = prompt[:, : max(0, prompt.shape[1] - context_limit)]
    prompt = prompt[:, -context_limit:]
    b, p_len, t_max = prompt.shape
    if p_len >= max_len:
        return np.concatenate([head, prompt], axis=1) if head.shape[1] else prompt
    masks = _mask_arrays(build_mask_table(tokenizer))
    remaining = max_len - p_len
    chunk = chunk_size or remaining
    state = prefill_tp(params, config, jnp.asarray(prompt), max_len, mesh,
                       kv_int8=kv_int8)
    key = jax.random.PRNGKey(seed)
    pieces = [head, prompt] if head.shape[1] else [prompt]
    produced = 0
    while produced < remaining:
        n = min(chunk, remaining - produced)
        key, sub = jax.random.split(key)
        state, rows, n_done = decode_events_tp(
            params, config, state, masks, n, temp, top_p, top_k, sub, mesh,
            greedy=greedy)
        n_done = int(n_done)
        if n_done:
            pieces.append(np.asarray(rows[:, :n_done]))
        produced += n
        if bool(np.asarray(state.all_eos)) or n_done < n:
            break
    return np.concatenate(pieces, axis=1)
