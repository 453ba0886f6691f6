"""Worker for the 2-process multihost data-feeding test.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu and 2 virtual CPU
devices per process (4 global). Each process feeds ONLY its own rows of every
global batch through ``host_local_batch_to_global``; the final loss printed by
each process must match the other and a single-process run on the same data.

Usage: python _multihost_worker.py <coordinator_port> <process_id>
"""

import sys
from pathlib import Path

port, pid = sys.argv[1], int(sys.argv[2])

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from midi_model_tpu.models import MIDIModelConfig, midinet  # noqa: E402
from midi_model_tpu.parallel import (host_local_batch_to_global,  # noqa: E402
                                     make_mesh, shard_train_state)
from midi_model_tpu.train import (init_train_state, make_optimizer,  # noqa: E402
                                  make_train_step)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                 n_embd=32, n_inner=64)
mesh = make_mesh(jax.devices(), dp=4, tp=1)

params = midinet.init_params(jax.random.PRNGKey(0), cfg)
opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
step_fn = make_train_step(cfg, opt, accum_steps=2,
                          compute_dtype=jnp.float32, mesh=mesh, tp=False)
state = init_train_state(params, opt)
state = shard_train_state(state, mesh, cfg, tp=False)

# Deterministic "dataset": every process derives the same global batches,
# then feeds ONLY its slice (its devices hold mesh rows [2*pid, 2*pid+1]).
rng = np.random.default_rng(42)
loss = None
for _ in range(3):
    global_batch = rng.integers(
        3, cfg.tokenizer.vocab_size, (2, 4, 8, cfg.tokenizer.max_token_seq)
    ).astype(np.int32)
    local = global_batch[:, 2 * pid: 2 * pid + 2]
    batch = host_local_batch_to_global(local, mesh)
    assert batch.shape == global_batch.shape, batch.shape
    state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])

print(f"FINAL_LOSS {loss:.8f}", flush=True)

# --- sharded validation: each process feeds DIFFERENT local eval items; the
# data-axis-sharded global batch makes eval_step's jitted masked mean the
# exact GLOBAL metric, identical on every host (train/cli.py run_validation).
from jax.sharding import PartitionSpec as P  # noqa: E402

from midi_model_tpu.parallel import replicated_from_local  # noqa: E402
from midi_model_tpu.train.trainer import eval_step  # noqa: E402

val_global = rng.integers(
    3, cfg.tokenizer.vocab_size, (4, 8, cfg.tokenizer.max_token_seq)
).astype(np.int32)
val_local = val_global[2 * pid: 2 * pid + 2]
val_batch = host_local_batch_to_global(val_local, mesh, spec=P("data"))
assert val_batch.shape == val_global.shape, val_batch.shape
# params must be GLOBAL (replicated) arrays to mix with the sharded batch
# (the originals were donated into the train state above, so re-init)
eval_params = midinet.init_params(jax.random.PRNGKey(0), cfg)
gparams = jax.tree.map(lambda x: replicated_from_local(np.asarray(x), mesh),
                       eval_params)
vm = eval_step(gparams, cfg, val_batch)
print(f"VAL_LOSS {float(vm['loss']):.8f}", flush=True)
