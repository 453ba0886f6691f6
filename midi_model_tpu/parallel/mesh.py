"""Device mesh construction and parameter sharding rules.

The reference scales only by data parallelism (Lightning DDP over NCCL,
/root/reference/train.py:461-474).  Here scaling is mesh-native: a 2-D
``(data, model)`` mesh over ICI; batch is sharded over ``data``, and the
``model`` axis (tensor parallelism, useful for tv2o-large and beyond) shards
attention heads and MLP width Megatron-style so each layer needs exactly one
all-reduce per block, inserted automatically by XLA from the sharding
annotations (the scaling-book recipe: annotate, let XLA place collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import MIDIModelConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, dp: Optional[int] = None,
              tp: int = 1) -> Mesh:
    """Build a (data, model) mesh.  ``dp`` defaults to n_devices // tp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        devices = devices[: dp * tp]
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _transformer_specs(tp: bool) -> dict:
    """PartitionSpecs for one stacked transformer stack (leading layer axis)."""
    m = MODEL_AXIS if tp else None
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": {
            # [L, D, H*Dh]: shard heads (output features) over the model axis.
            "wq": P(None, None, m),
            "wk": P(None, None, m),
            "wv": P(None, None, m),
            # [L, H*Dh, D]: shard the contraction dim -> psum after o_proj.
            "wo": P(None, m, None),
            "w_gate": P(None, None, m),
            "w_up": P(None, None, m),
            "w_down": P(None, m, None),
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
        },
    }


def param_specs(config: MIDIModelConfig, tp: bool = True) -> dict:
    """PartitionSpec pytree matching midinet.init_params' structure."""
    return {
        "net": _transformer_specs(tp),
        "net_token": _transformer_specs(tp),
        # [D, V]: shard the vocab dim; loss gathers logits.
        "lm_head": P(None, MODEL_AXIS if tp else None),
    }


def param_shardings(mesh: Mesh, config: MIDIModelConfig, tp: bool = True):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(config, tp),
                        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_shard(seq: Sequence) -> list:
    """This host's shard of a dataset file list: ``seq[pid::pcount]``.

    Every process must hold a DISJOINT slice of the corpus — the reference
    gets this from Lightning's DistributedSampler (train.py:461-474); here
    the round-robin split plays that role (callers shuffle first with a
    seed shared by all processes, so the slices partition the corpus).
    """
    return list(seq)[jax.process_index()::jax.process_count()]


def host_local_batch_to_global(batch, mesh: Mesh,
                               spec: Optional[P] = None) -> jax.Array:
    """Assemble the global batch from each process's local rows.

    ``batch`` is this host's rows only (global_batch / process_count of
    them along the sharded axis).  Under multihost it builds a global
    jax.Array whose addressable shards are this host's data —
    ``jnp.asarray`` alone would make a process-local array that cannot
    satisfy a global ``data``-axis sharding.
    """
    if spec is None:
        spec = P(None, DATA_AXIS)  # [accum, batch, ...] microbatch layout
    local = np.asarray(batch)
    if jax.process_count() == 1:
        # single process: the train step's with_sharding_constraint places
        # it (and tolerates batch < mesh size, unlike an explicit device_put)
        return jnp.asarray(local)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local)


def replicated_from_local(batch, mesh: Mesh) -> jax.Array:
    """A fully-replicated global array from identical per-host data (used for
    validation batches, which every process loads identically)."""
    local = np.asarray(batch)
    if jax.process_count() == 1:
        return jnp.asarray(local)
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, local)


def shard_params(params, mesh: Mesh, config: MIDIModelConfig, tp: bool = True):
    """Place a parameter pytree onto the mesh with TP shardings."""
    shardings = param_shardings(mesh, config, tp)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_train_state(state, mesh: Mesh, config: MIDIModelConfig,
                      tp: bool = True):
    """Place a TrainState onto the mesh: params by their TP specs, optimizer
    state / step replicated.  Keeps every leaf's committed devices consistent
    so jit never sees mixed placements (e.g. after a checkpoint restore)."""
    pshard = param_shardings(mesh, config, tp)
    rep = replicated(mesh)

    params = jax.tree.map(jax.device_put, state.params, pshard)

    def put_opt(leaf):
        # Adam moments mirror param shapes; match them to param shardings by
        # shape when possible, otherwise replicate.
        return jax.device_put(leaf, rep)

    opt_state = jax.tree.map(put_opt, state.opt_state)
    step = jax.device_put(state.step, rep)
    return type(state)(step=step, params=params, opt_state=opt_state)
