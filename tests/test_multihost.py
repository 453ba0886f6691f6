"""Multihost data feeding: 2 local jax.distributed processes on CPU.

VERDICT r1 item 6: the global batch must be the concatenation of DISJOINT
per-process shards (``process_shard`` + ``host_local_batch_to_global``), and
the resulting loss must match a single-process run on the same global data.
Reference equivalent: Lightning's DistributedSampler under ``--nodes``
(/root/reference/train.py:373, 461-474).
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.parallel import process_shard
from midi_model_tpu.train import init_train_state, make_optimizer, make_train_step

REPO = Path(__file__).resolve().parent.parent


def test_process_shard_partitions():
    files = [f"f{i}" for i in range(11)]
    # single-process: identity
    assert process_shard(files) == files


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference() -> float:
    """The same 3 steps on the same data, unsharded single-device."""
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=32, n_inner=64)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
    step_fn = make_train_step(cfg, opt, accum_steps=2,
                              compute_dtype=jnp.float32)
    state = init_train_state(params, opt)
    rng = np.random.default_rng(42)
    loss = None
    for _ in range(3):
        batch = rng.integers(
            3, cfg.tokenizer.vocab_size, (2, 4, 8, cfg.tokenizer.max_token_seq)
        ).astype(np.int32)
        state, metrics = step_fn(state, jnp.asarray(batch))
        loss = float(metrics["loss"])
    return loss


def test_two_process_data_feeding():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])

    worker = str(REPO / "tests" / "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i)],
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        m = re.search(r"FINAL_LOSS ([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))

    # both processes agree on the (replicated) global loss
    assert losses[0] == losses[1], losses
    # and it matches the single-process run on the identical global data
    ref = _single_process_reference()
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)

    # sharded validation: per-process DISJOINT eval items, one global metric
    val_losses = []
    for out in outs:
        m = re.search(r"VAL_LOSS ([0-9.]+)", out)
        assert m, out[-3000:]
        val_losses.append(float(m.group(1)))
    assert val_losses[0] == val_losses[1], val_losses
    np.testing.assert_allclose(val_losses[0], _single_process_val(),
                               rtol=2e-4)


def _single_process_val() -> float:
    """eval_step over the same 4-row global val batch, unsharded."""
    from midi_model_tpu.train.trainer import eval_step

    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=32, n_inner=64)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(42)
    for _ in range(3):  # consume the train batches to reach the val draw
        rng.integers(3, cfg.tokenizer.vocab_size,
                     (2, 4, 8, cfg.tokenizer.max_token_seq))
    val_global = rng.integers(
        3, cfg.tokenizer.vocab_size, (4, 8, cfg.tokenizer.max_token_seq)
    ).astype(np.int32)
    m = eval_step(params, cfg, jnp.asarray(val_global))
    return float(m["loss"])
