"""pjit data-parallel (optionally tensor-parallel) training step.

Replaces the reference's Lightning/DDP trainer (/root/reference/train.py):

- AdamW (β 0.9/0.99, eps 1e-8) with no weight decay on norm scales
  (ref :121-138), linear warmup→decay schedule (ref :93-103), global-norm
  clipping (ref :463);
- gradient accumulation as a ``lax.scan`` over microbatches inside ONE jitted
  step (ref accumulate_grad_batches, :463) — no host round-trips between
  microbatches;
- bf16 compute with fp32 master params and optimizer state (a deliberate
  upgrade over the reference's bf16-true whole-model cast: same MXU throughput,
  none of the bf16 optimizer drift);
- cross-entropy ignoring pad and masked token accuracy (ref :153-188);
- sharding: batch over the ``data`` mesh axis, params replicated (or
  TP-sharded over ``model``); XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import midinet
from ..models.config import MIDIModelConfig
from ..parallel import mesh as pmesh
from .sched import linear_warmup_decay


class TrainState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: optax.OptState


def _decay_mask(params) -> dict:
    """Weight decay applies to matrices only — norm scales (and any 1-D leaf,
    i.e. biases if ever added) are exempt, like the reference's
    ``no_decay=['bias','norm']``."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup_steps: int = 100, total_steps: int = 1_000_000,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(lr, warmup_steps, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
        optax.add_decayed_weights(weight_decay, mask=_decay_mask),
        optax.scale_by_learning_rate(schedule),
    )


def loss_fn(params, config: MIDIModelConfig, batch: jax.Array,
            compute_dtype=jnp.bfloat16, sample_positions: Optional[jax.Array] = None,
            remat: bool = False, token_chunk: Optional[int] = None):
    """Next-event token cross-entropy (mean over non-pad targets) + accuracy.

    ``sample_positions [N]`` optionally restricts the token-net pass to a
    subset of event positions (the reference's --sample-seq VRAM saver,
    train.py:172-175).

    ``token_chunk`` bounds activation memory: the token-net + CE pass runs as
    a rematerialized scan over chunks of event positions, so the [N, 8, vocab]
    logits tensor never materializes whole (N = B·L can be 16k+; its fp32
    logits alone would be several GB — the reason the reference needs
    --sample-seq).  Backward recomputes per chunk.
    """
    pad_id = config.tokenizer.pad_id
    cparams = jax.tree.map(
        lambda p: p.astype(compute_dtype) if p.dtype == jnp.float32 else p, params)
    # Embedding tables stay in their master dtype: converting the whole table
    # feeds a convert+gather fusion that XLA tries to hold in scoped VMEM
    # (>16 MB); gathered rows are cast after lookup instead (midinet casts to
    # the lm_head dtype).
    cparams["net"] = dict(cparams["net"], embed=params["net"]["embed"])
    cparams["net_token"] = dict(cparams["net_token"],
                                embed=params["net_token"]["embed"])

    x = batch[:, :-1]
    y = batch[:, 1:]
    hidden, _ = midinet.forward(cparams, config, x, remat=remat)
    if sample_positions is not None:
        hidden = jnp.take(hidden, sample_positions, axis=1)
        y = jnp.take(y, sample_positions, axis=1)
    b, l, d = hidden.shape
    t = y.shape[-1]
    hidden = hidden.reshape(b * l, d)
    y = y.reshape(b * l, t)

    def chunk_stats(h_chunk, y_chunk):
        logits, _ = midinet.forward_token(cparams, config, h_chunk,
                                          y_chunk[:, :-1], remat=remat)
        mask = (y_chunk != pad_id).astype(jnp.float32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, y_chunk[..., None], axis=-1)[..., 0]
        hits = (jnp.argmax(logits, axis=-1) == y_chunk) * mask
        return (nll * mask).sum(), hits.sum(), mask.sum()

    n = b * l
    if token_chunk is None or token_chunk >= n:
        nll_sum, hit_sum, count = chunk_stats(hidden, y)
    else:
        chunk = token_chunk
        n_chunks = n // chunk
        main, tail = n_chunks * chunk, n - n_chunks * chunk

        def body(carry, hy):
            h_c, y_c = hy
            s = jax.checkpoint(chunk_stats)(h_c, y_c)
            return jax.tree.map(jnp.add, carry, s), None

        init = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        (nll_sum, hit_sum, count), _ = jax.lax.scan(
            body, init,
            (hidden[:main].reshape(n_chunks, chunk, d),
             y[:main].reshape(n_chunks, chunk, t)))
        if tail:
            s = chunk_stats(hidden[main:], y[main:])
            nll_sum, hit_sum, count = jax.tree.map(
                jnp.add, (nll_sum, hit_sum, count), s)

    denom = jnp.maximum(count, 1.0)
    loss = nll_sum / denom
    acc = hit_sum / denom
    return loss, {"loss": loss, "acc": acc}


def make_train_step(config: MIDIModelConfig, optimizer: optax.GradientTransformation,
                    accum_steps: int = 1, compute_dtype=jnp.bfloat16,
                    mesh=None, tp: bool = False, remat: bool = False,
                    token_chunk: Optional[int] = None):
    """Build the jitted train step.

    ``batch`` is ``[accum_steps, B, L, T]``; gradients are averaged over
    microbatches with a lax.scan before one optimizer update.
    """

    def grads_one(params, mb):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, config, mb, compute_dtype, remat=remat,
            token_chunk=token_chunk)
        return grads, metrics

    def train_step(state: TrainState, batch: jax.Array):
        def scan_body(carry, mb):
            acc_grads, acc_metrics = carry
            grads, metrics = grads_one(state.params, mb)
            acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
            acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
            return (acc_grads, acc_metrics), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        zero_metrics = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
        (grads, metrics), _ = jax.lax.scan(
            scan_body, (zero_grads, zero_metrics), batch)
        scale = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * scale, grads)
        metrics = jax.tree.map(lambda m: m * scale, metrics)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    # Sharded variant: constrain the microbatch axis over `data` and params
    # over their TP specs; XLA propagates shardings into the optimizer state
    # and inserts the gradient all-reduce over ICI.
    from jax.sharding import NamedSharding, PartitionSpec as P

    pspecs = pmesh.param_shardings(mesh, config, tp)
    batch_sharding = NamedSharding(mesh, P(None, pmesh.DATA_AXIS))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sharded_step(state: TrainState, batch: jax.Array):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        params = jax.tree.map(
            jax.lax.with_sharding_constraint, state.params, pspecs)
        state = TrainState(state.step, params, state.opt_state)
        return train_step(state, batch)

    return sharded_step


def make_lora_train_step(config: MIDIModelConfig,
                         optimizer: optax.GradientTransformation,
                         lora_alpha: float = 128.0, accum_steps: int = 1,
                         compute_dtype=jnp.bfloat16, mesh=None, tp: bool = False,
                         remat: bool = False, token_chunk: Optional[int] = None):
    """LoRA fine-tune step: ``step(state, base_params, batch)``.

    The reference runs peft with the base model frozen
    (/root/reference/train.py:439-449).  Here the adapters are the ONLY
    leaves in ``state.params`` (and hence the only leaves the optimizer ever
    sees), while the frozen base weights are a separate, non-donated argument
    — base immutability holds by construction, not by a gradient mask.
    Each microbatch differentiates through ``apply_lora`` (W + (α/r)·AᵀBᵀ),
    so gradients exist only for the (A, B) factors.
    """
    from ..models.lora import apply_lora

    def grads_one(lora, base_params, mb):
        def lora_loss(lora):
            effective = apply_lora(base_params, lora, alpha=lora_alpha)
            return loss_fn(effective, config, mb, compute_dtype, remat=remat,
                           token_chunk=token_chunk)

        (_, metrics), grads = jax.value_and_grad(lora_loss, has_aux=True)(lora)
        return grads, metrics

    def train_step(state: TrainState, base_params, batch: jax.Array):
        def scan_body(carry, mb):
            acc_grads, acc_metrics = carry
            grads, metrics = grads_one(state.params, base_params, mb)
            return (jax.tree.map(jnp.add, acc_grads, grads),
                    jax.tree.map(jnp.add, acc_metrics, metrics)), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        zero_metrics = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
        (grads, metrics), _ = jax.lax.scan(
            scan_body, (zero_grads, zero_metrics), batch)
        scale = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * scale, grads)
        metrics = jax.tree.map(lambda m: m * scale, metrics)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, lora, opt_state), metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    pspecs = pmesh.param_shardings(mesh, config, tp)
    batch_sharding = NamedSharding(mesh, P(None, pmesh.DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sharded_step(state: TrainState, base_params, batch: jax.Array):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        base_params = jax.tree.map(
            jax.lax.with_sharding_constraint, base_params, pspecs)
        # adapters are tiny: replicate them (their gradient all-reduce is the
        # only cross-device traffic of the update)
        lora = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, replicated),
            state.params)
        state = TrainState(state.step, lora, state.opt_state)
        return train_step(state, base_params, batch)

    return sharded_step


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


@functools.partial(jax.jit, static_argnames=("config", "token_chunk"))
def eval_step(params, config: MIDIModelConfig, batch: jax.Array,
              token_chunk: int = 256):
    """Validation loss + masked accuracy (ref validation_step, train.py:190-206).

    Runs the token-net pass chunked: at full validation lengths the fused
    embedding gather of all B·L·(T-1) rows can exceed the 16 MB VMEM scope.
    """
    _, metrics = loss_fn(params, config, batch, token_chunk=token_chunk)
    return metrics
