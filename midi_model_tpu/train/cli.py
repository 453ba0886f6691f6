"""Training CLI — the reference ``train.py`` rebuilt for TPU.

    python -m midi_model_tpu.train.cli --data /path/to/midis --config tv2o-medium

Flag surface mirrors /root/reference/train.py:285-384 (same names where the
concept carries over); Lightning-specific knobs are replaced by mesh ones
(``--dp/--tp`` instead of ``--devices/--nodes``).
"""

from __future__ import annotations

import argparse
import os
import random
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="train the hierarchical MIDI model")
    p.add_argument("--resume", type=str, default="", help="resume from checkpoint dir")
    p.add_argument("--ckpt", type=str, default="", help="warm-start weights (.safetensors/.ckpt)")
    p.add_argument("--config", type=str, default="tv2o-medium",
                   help="model config name or config.json path")
    p.add_argument("--task", type=str, default="train", choices=["train", "lora"])
    p.add_argument("--lora-r", type=int, default=64,
                   help="LoRA rank (ref train.py:441)")
    p.add_argument("--lora-alpha", type=float, default=128.0,
                   help="LoRA alpha (ref train.py:442)")

    p.add_argument("--data", type=str, default="data", help="dataset path")
    p.add_argument("--data-val-split", type=int, default=128)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--quality", action="store_true", default=False)

    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--warmup-step", type=int, default=100)
    p.add_argument("--max-step", type=int, default=1_000_000)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--sample-seq", action="store_true", default=False,
                   help="bound token-net memory (runs the token-net+CE pass "
                        "in rematerialized chunks — the exact-loss analogue "
                        "of the reference's position subsampling)")
    p.add_argument("--token-chunk", type=int, default=0,
                   help="explicit token-net CE chunk size (0 = auto)")
    p.add_argument("--gen-example-interval", type=int, default=1)
    p.add_argument("--batch-size-train", type=int, default=2)
    p.add_argument("--batch-size-val", type=int, default=2)
    p.add_argument("--batch-size-gen-example", type=int, default=8)
    p.add_argument("--workers-train", type=int, default=4)
    p.add_argument("--acc-grad", type=int, default=2)
    p.add_argument("--fp32", action="store_true", default=False,
                   help="fp32 compute (default bf16 compute, fp32 master)")
    p.add_argument("--remat", nargs="?", const="full", default="",
                   choices=["", "full", "dots", "dots_all"],
                   help="activation checkpointing: 'full' (bare --remat; "
                        "whole layers recomputed, least memory), 'dots' "
                        "(selective dots_with_no_batch_dims_saveable: matmul "
                        "outputs saved, only elementwise chains recomputed — "
                        "near no-remat speed, the right choice for "
                        "tv2o-large on a 16 GB chip), or 'dots_all' "
                        "(dots_saveable: every matmul output incl. attention "
                        "saved — least recompute, most memory)")
    p.add_argument("--dp", type=int, default=0, help="data-parallel size (0 = all devices)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel size")
    p.add_argument("--multihost", action="store_true", default=False,
                   help="initialize jax.distributed (multi-host DCN training; "
                        "coordinator/process env via TPU metadata or JAX_* vars)")
    p.add_argument("--log-step", type=int, default=1)
    p.add_argument("--val-step", type=int, default=1600)
    p.add_argument("--out-dir", type=str, default="runs")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ..models import MIDIModelConfig, midinet
    from ..models.config import CONFIG_NAMES
    from ..parallel import (host_local_batch_to_global, make_mesh,
                            process_shard, replicated_from_local, shard_params,
                            shard_train_state)
    from .checkpoint import CheckpointManager
    from .data import DataLoader, MidiDataset, find_midi_files
    from .metrics import MetricsWriter
    from .trainer import (eval_step, init_train_state, loss_fn, make_optimizer,
                          make_train_step)

    if args.multihost:
        # Multi-host data parallelism over DCN: every host runs this same
        # process; jax.distributed wires the global device view, and the
        # (data, model) mesh then spans all hosts (XLA routes the gradient
        # all-reduce hierarchically: ICI within a slice, DCN across).
        jax.distributed.initialize()
        print(f"process {jax.process_index()}/{jax.process_count()}")

    random.seed(args.seed)
    np.random.seed(args.seed)

    config = (MIDIModelConfig.from_name(args.config)
              if args.config in CONFIG_NAMES
              else MIDIModelConfig.from_json_file(args.config))
    tokenizer = config.tokenizer

    midi_files = find_midi_files(args.data)
    random.shuffle(midi_files)  # same seed on every process -> same order
    split = len(midi_files) - args.data_val_split
    train_files, val_files = midi_files[:split], midi_files[split:]

    # Multihost data feeding: each process loads a DISJOINT slice of the
    # corpus and only its share of every global batch; the global batch is
    # assembled via jax.make_array_from_process_local_data in the step loop.
    # The val FILE LIST stays identical on every process (run_validation
    # strides ITEMS per process and shards each eval batch over the data
    # axis, so the jitted global mean is one collective away and checkpoint
    # decisions agree across hosts without replicated compute).
    process_count = jax.process_count()
    if process_count > 1:
        train_files = process_shard(train_files)
    if args.batch_size_train % process_count:
        raise ValueError(
            f"--batch-size-train={args.batch_size_train} (global) not "
            f"divisible by process_count={process_count}")
    local_bs = args.batch_size_train // process_count
    local_rows = local_bs * args.acc_grad
    print(f"train: {len(train_files)} (this process)  val: {len(val_files)}")

    train_ds = MidiDataset(train_files, tokenizer, max_len=args.max_len,
                           aug=True, check_quality=args.quality, rand_start=True)
    val_ds = MidiDataset(val_files, tokenizer, max_len=args.max_len,
                         aug=False, check_quality=args.quality, rand_start=False)
    loader = iter(DataLoader(train_ds, local_rows,
                             workers=args.workers_train,
                             seed=args.seed + jax.process_index()))

    devices = jax.devices()
    tp = args.tp
    dp = args.dp or max(1, len(devices) // tp)
    mesh = make_mesh(devices[: dp * tp], dp=dp, tp=tp) if dp * tp > 1 else None
    print(f"devices: {len(devices)}  mesh: data={dp} model={tp}")

    params = midinet.init_params(jax.random.PRNGKey(args.seed), config)
    if args.ckpt:
        from ..interop import load_state_dict, params_from_state_dict

        params = params_from_state_dict(load_state_dict(args.ckpt), config)
        params = jax.tree.map(jnp.asarray, params)
    elif args.task == "lora":
        raise ValueError("--ckpt must be set to train lora")
    if mesh is not None:
        params = shard_params(params, mesh, config, tp=tp > 1)

    optimizer = make_optimizer(lr=args.lr, weight_decay=args.weight_decay,
                               warmup_steps=args.warmup_step,
                               total_steps=args.max_step,
                               grad_clip=args.grad_clip)
    compute_dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    token_chunk = args.token_chunk or (2048 if args.sample_seq else None)

    if args.task == "lora":
        # Adapter-only fine-tune (ref train.py:439-449): the train state holds
        # ONLY the (A, B) factors; the frozen base is a separate step argument
        # that the optimizer never touches. merged_params() materializes
        # W + (α/r)·AᵀBᵀ for validation/sampling.
        from ..models import lora as lora_mod
        from .trainer import make_lora_train_step

        lora = lora_mod.init_lora(jax.random.PRNGKey(args.seed + 1), params,
                                  rank=args.lora_r)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            lora = jax.device_put(lora, NamedSharding(mesh, PartitionSpec()))
        print(f"lora adapters initialized (r={args.lora_r}, "
              f"alpha={args.lora_alpha})")
        lora_step = make_lora_train_step(
            config, optimizer, lora_alpha=args.lora_alpha,
            accum_steps=args.acc_grad, compute_dtype=compute_dtype, mesh=mesh,
            tp=tp > 1, remat=args.remat, token_chunk=token_chunk)
        step_fn = lambda state, batch: lora_step(state, params, batch)  # noqa: E731
        state = init_train_state(lora, optimizer)

        def merged_params(state):
            return lora_mod.merge_lora(params, state.params,
                                       alpha=args.lora_alpha)
    else:
        step_fn = make_train_step(config, optimizer, accum_steps=args.acc_grad,
                                  compute_dtype=compute_dtype, mesh=mesh,
                                  tp=tp > 1, remat=args.remat,
                                  token_chunk=token_chunk)
        state = init_train_state(params, optimizer)
        if mesh is not None:
            state = shard_train_state(state, mesh, config, tp=tp > 1)

        def merged_params(state):
            return state.params

    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    mgr = CheckpointManager(ckpt_dir, config)
    if args.resume:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    writer = MetricsWriter(os.path.join(args.out_dir, "logs"))

    from .sched import linear_warmup_decay

    schedule = linear_warmup_decay(args.lr, args.warmup_step, args.max_step)

    # Preemption resilience (standard on TPU): SIGTERM/SIGINT request a
    # checkpoint at the next step boundary, then exit cleanly; --resume
    # restarts from it.  (The reference has no preemption handling.)
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        print(f"signal {signum}: checkpointing and stopping")
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    best_val = float("inf")
    t0 = time.time()
    tokens_per_batch = (args.batch_size_train * args.acc_grad * args.max_len
                        * tokenizer.max_token_seq)
    while int(state.step) < args.max_step:
        batch = next(loader)
        batch = batch.reshape(args.acc_grad, local_bs, *batch.shape[1:])
        if mesh is not None:
            batch = host_local_batch_to_global(batch, mesh)
        else:
            batch = jnp.asarray(batch)
        state, metrics = step_fn(state, batch)
        step = int(state.step)
        if step % args.log_step == 0:
            dt = time.time() - t0
            t0 = time.time()
            writer.log(step, {
                "train/loss": float(metrics["loss"]),
                "train/lr": float(schedule(step)),
                "train/tokens_per_sec": tokens_per_batch / max(dt, 1e-9),
            })
        if args.val_step and step % args.val_step == 0:
            eval_params = merged_params(state)
            globalize = ((lambda b: replicated_from_local(b, mesh))
                         if mesh is not None else jnp.asarray)
            val_metrics = run_validation(
                eval_step, eval_params, config, val_ds, args.batch_size_val,
                args.max_len, globalize=globalize, mesh=mesh)
            writer.log(step, {f"val/{k}": v for k, v in val_metrics.items()})
            mgr.save(step, state, metrics=val_metrics)  # all processes join
            if val_metrics["loss"] < best_val:
                best_val = val_metrics["loss"]
                if jax.process_index() == 0:
                    if args.task == "lora":
                        mgr.export_peft_adapter(state.params, rank=args.lora_r,
                                                alpha=args.lora_alpha)
                    else:
                        mgr.export_safetensors(state.params)
            if jax.process_index() == 0:
                gen_examples(eval_params, config, val_ds, args, step)
        if stop_requested["flag"]:
            mgr.save(step, state)
            print(f"checkpointed at step {step}; exiting on signal")
            break
    mgr.wait()  # flush async checkpoint writes before returning
    writer.close()


def run_validation(eval_step, params, config, val_ds, batch_size, max_len,
                   max_batches: int = 16, globalize=None, mesh=None):
    """Validation over up to ``max_batches`` eval batches.

    Multihost (``mesh`` spans >1 process): each process loads a DISJOINT
    stride of the shared val list (``batch_size`` items per round) and the
    round's global batch is sharded over the ``data`` axis — the jitted
    masked-token mean inside ``eval_step`` is then the exact GLOBAL metric
    (one psum, replicated output), so every host sees identical values and
    checkpoint decisions agree with 1/process_count of the compute the old
    replicated scheme burned.  Falls back to replicated batches when the
    geometry doesn't divide (global batch % data-axis size) or the val set
    is smaller than one global batch.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS, host_local_batch_to_global

    globalize = globalize or jnp.asarray
    pcount = jax.process_count()
    if mesh is not None and pcount > 1:
        bg = batch_size * pcount  # global items per round
        dp = mesh.shape.get(DATA_AXIS, 1)
        if bg % dp == 0 and len(val_ds) >= bg:
            pid = jax.process_index()
            n_rounds = min(max_batches, len(val_ds) // bg)
            losses, accs = [], []
            for r in range(n_rounds):
                base = r * bg + pid * batch_size
                items = [val_ds[base + j] for j in range(batch_size)]
                batch = val_ds.collate(items, pad_to=max_len)
                gbatch = host_local_batch_to_global(batch, mesh,
                                                    spec=P(DATA_AXIS))
                m = eval_step(params, config, gbatch)
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
            return {"loss": float(np.mean(losses)),
                    "acc": float(np.mean(accs))}

    losses, accs = [], []
    idx = 0
    for _ in range(max_batches):
        items = []
        for _ in range(batch_size):
            if idx >= len(val_ds):
                break
            items.append(val_ds[idx])
            idx += 1
        if not items:
            break
        batch = val_ds.collate(items, pad_to=max_len)
        m = eval_step(params, config, globalize(batch))
        losses.append(float(m["loss"]))
        accs.append(float(m["acc"]))
    if not losses:
        return {"loss": float("nan"), "acc": float("nan")}
    return {"loss": float(np.mean(losses)), "acc": float(np.mean(accs))}


def gen_examples(params, config, val_ds, args, step):
    """Sample + piano-roll dump at each checkpoint (ref gen_example,
    train.py:208-232). Failures are non-fatal, like the reference."""
    try:
        from ..midi import score2midi
        from ..sampling import generate

        if args.gen_example_interval <= 0:
            return
        out_dir = os.path.join(args.out_dir, "sample", str(step))
        os.makedirs(out_dir, exist_ok=True)
        tokenizer = config.tokenizer
        outs = generate(params, config, batch_size=args.batch_size_gen_example,
                        max_len=256, seed=step)
        for i, seq in enumerate(outs):
            score = tokenizer.detokenize([list(r) for r in seq])
            with open(os.path.join(out_dir, f"0_{i}.mid"), "wb") as f:
                f.write(score2midi(score))
            tokenizer.midi2img(score).save(os.path.join(out_dir, f"0_{i}.png"))
        if len(val_ds):
            prompt = np.asarray(val_ds.load_midi(
                random.randint(0, len(val_ds) - 1)), dtype=np.int64)[:256]
            outs = generate(params, config, prompt=prompt,
                            batch_size=args.batch_size_gen_example,
                            max_len=512, seed=step)
            for i, seq in enumerate(outs):
                score = tokenizer.detokenize([list(r) for r in seq])
                with open(os.path.join(out_dir, f"1_{i}.mid"), "wb") as f:
                    f.write(score2midi(score))
                # piano-roll PNG for prompted continuations too
                # (ref train.py:208-232 renders both sets)
                tokenizer.midi2img(score).save(
                    os.path.join(out_dir, f"1_{i}.png"))
    except Exception as e:  # sampling problems must not kill training
        print(f"gen_example failed: {e}")


if __name__ == "__main__":
    main()
