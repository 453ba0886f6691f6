"""Trainer, data pipeline, sharding and checkpoint tests (8-dev CPU mesh)."""

import pickle
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.parallel import make_mesh
from midi_model_tpu.train import (
    DataLoader,
    MidiDataset,
    eval_step,
    init_train_state,
    linear_warmup_decay,
    loss_fn,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def cfg():
    return MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                      n_embd=64, n_inner=128)


def fresh_params(cfg):
    return midinet.init_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.default_rng(0)
    b = rng.integers(3, cfg.tokenizer.vocab_size, (2, 4, 16, 8)).astype(np.int32)
    b[:, :, -2:, :] = cfg.tokenizer.pad_id  # some pad rows
    return jnp.asarray(b)


def test_loss_matches_torch_cross_entropy(cfg, batch):
    torch = pytest.importorskip("torch")
    params = fresh_params(cfg)
    loss, metrics = loss_fn(params, cfg, batch[0], compute_dtype=jnp.float32)

    out = midinet.train_logits(params, cfg, batch[0])
    t_logits = torch.from_numpy(np.asarray(out.logits)).reshape(-1, cfg.tokenizer.vocab_size)
    t_targets = torch.from_numpy(np.asarray(out.targets)).reshape(-1).long()
    ref = torch.nn.functional.cross_entropy(
        t_logits, t_targets, ignore_index=cfg.tokenizer.pad_id)
    assert abs(float(loss) - float(ref)) < 1e-4


def test_loss_decreases(cfg, batch):
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=1000)
    step = make_train_step(cfg, opt, accum_steps=2)
    state = init_train_state(fresh_params(cfg), opt)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_schedule():
    sched = linear_warmup_decay(1.0, 10, 110)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(60)) - 0.5) < 1e-6
    assert float(sched(110)) == 0.0


def test_sharded_matches_unsharded(cfg, batch):
    """dp/tp sharding must not change the math (fp32 compute; small tolerance
    for cross-device reduction order feeding through Adam)."""
    opt = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=1000)
    kw = dict(accum_steps=2, compute_dtype=jnp.float32)

    plain = make_train_step(cfg, opt, **kw)
    s_plain, _ = plain(init_train_state(fresh_params(cfg), opt), batch)

    mesh = make_mesh(jax.devices("cpu")[:8], tp=1)
    dp = make_train_step(cfg, opt, mesh=mesh, tp=False, **kw)
    s_dp, _ = dp(init_train_state(fresh_params(cfg), opt), batch)

    mesh2 = make_mesh(jax.devices("cpu")[:8], tp=2)
    tp = make_train_step(cfg, opt, mesh=mesh2, tp=True, **kw)
    s_tp, _ = tp(init_train_state(fresh_params(cfg), opt), batch)

    for other in (s_dp, s_tp):
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             s_plain.params, other.params)
        assert max(jax.tree.leaves(diffs)) < 1e-4


def test_eval_step(cfg, batch):
    m = eval_step(fresh_params(cfg), cfg, batch[0])
    assert 0.0 <= float(m["acc"]) <= 1.0
    assert float(m["loss"]) > 0


@pytest.fixture(scope="module")
def midi_dir(tmp_path_factory):
    """Write golden midi bytes to disk as a toy corpus."""
    d = tmp_path_factory.mktemp("corpus")
    with open(Path(__file__).parent / "golden" / "codec.pkl", "rb") as f:
        goldens = pickle.load(f)
    n = 0
    for name, g in goldens.items():
        if name.startswith("bad_"):
            continue
        (d / f"{name}.mid").write_bytes(g["bytes"])
        n += 1
    (d / "garbage.mid").write_bytes(b"not a midi file at all")
    assert n >= 10
    return d


def test_dataset_loading(cfg, midi_dir):
    from midi_model_tpu.train import find_midi_files

    files = find_midi_files(str(midi_dir))
    assert len(files) >= 10
    ds = MidiDataset(files, cfg.tokenizer, max_len=64, min_file_size=10,
                     max_file_size=10**6, aug=True, seed=0)
    item = ds[0]
    assert item.ndim == 2 and item.shape[1] == cfg.tokenizer.max_token_seq
    assert item.shape[0] <= 64
    batch = ds.collate([ds[i] for i in range(4)], pad_to=64)
    assert batch.shape == (4, 64, cfg.tokenizer.max_token_seq)
    # the garbage file must be silently resampled
    bad_idx = files.index(str(midi_dir / "garbage.mid"))
    item = ds[bad_idx]
    assert item.shape[0] > 0


def test_dataloader_inline(cfg, midi_dir):
    from midi_model_tpu.train import find_midi_files

    files = find_midi_files(str(midi_dir))
    ds = MidiDataset(files, cfg.tokenizer, max_len=32, min_file_size=10,
                     max_file_size=10**6, seed=1)
    loader = iter(DataLoader(ds, batch_size=2, workers=0))
    b = next(loader)
    assert b.shape == (2, 32, cfg.tokenizer.max_token_seq)
    assert b.dtype == np.int32


def test_checkpoint_roundtrip(cfg, batch, tmp_path):
    from midi_model_tpu.train.checkpoint import CheckpointManager

    opt = make_optimizer(lr=1e-3)
    step = make_train_step(cfg, opt)
    state = init_train_state(fresh_params(cfg), opt)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg)
    mgr.save(1, state, metrics={"val/loss": 1.23})
    mgr.wait()
    assert mgr.latest_step() == 1

    template = jax.tree.map(np.asarray, state)
    restored = mgr.restore(template)
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                         state.params, restored.params)
    assert max(jax.tree.leaves(diffs)) == 0.0
    assert (tmp_path / "ckpt" / "config.json").exists()

    # safetensors export is loadable through the torch-interop path
    path = mgr.export_safetensors(state.params)
    from midi_model_tpu.interop import load_state_dict, params_from_state_dict

    sd = load_state_dict(path)
    params2 = params_from_state_dict(sd, cfg)
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                     jax.tree.map(np.asarray, state.params), params2)
    assert max(jax.tree.leaves(d)) == 0.0


def test_dataloader_process_pool(cfg, midi_dir):
    """workers>0: batches come from the process pool (native modules must
    import cleanly in workers)."""
    from midi_model_tpu.train import find_midi_files

    files = find_midi_files(str(midi_dir))
    ds = MidiDataset(files, cfg.tokenizer, max_len=32, min_file_size=10,
                     max_file_size=10**6, seed=2)
    loader = iter(DataLoader(ds, batch_size=2, workers=2, prefetch=2))
    b1 = next(loader)
    b2 = next(loader)
    assert b1.shape == b2.shape == (2, 32, cfg.tokenizer.max_token_seq)


def test_lora_training_freezes_base(cfg, batch, tmp_path):
    """End-to-end LoRA fine-tune (VERDICT r1 item 2): after N steps the base
    params are bit-unchanged, the loss decreases, and the exported
    adapter_model.safetensors round-trips through the peft loader into a
    merged model that differs from base. (Ref: train.py:439-449, 234-244.)"""
    from midi_model_tpu.models.lora import (
        init_lora, load_peft_adapter, merge_lora)
    from midi_model_tpu.train.checkpoint import CheckpointManager
    from midi_model_tpu.train.trainer import make_lora_train_step

    base = fresh_params(cfg)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), base)
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    opt = make_optimizer(lr=1e-2, warmup_steps=1, total_steps=1000)
    step = make_lora_train_step(cfg, opt, lora_alpha=8.0, accum_steps=2,
                                compute_dtype=jnp.float32)
    state = init_train_state(lora, opt)
    losses = []
    for _ in range(8):
        state, m = step(state, base, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    # base params bit-identical after training
    flat_before = jax.tree_util.tree_flatten_with_path(base_before)[0]
    flat_after = {jax.tree_util.keystr(p): np.asarray(v)
                  for p, v in jax.tree_util.tree_flatten_with_path(base)[0]}
    for p, v in flat_before:
        np.testing.assert_array_equal(v, flat_after[jax.tree_util.keystr(p)],
                                      err_msg=jax.tree_util.keystr(p))

    # adapters actually moved
    b_leaf = np.asarray(state.params["net"]["wq"]["b"])
    assert np.abs(b_leaf).max() > 0

    # peft export -> load -> merge parity with in-memory merge
    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg)
    adapter_dir = mgr.export_peft_adapter(state.params, rank=4, alpha=8.0)
    loaded = load_peft_adapter(
        str(Path(adapter_dir) / "adapter_model.safetensors"), cfg)
    merged_a = merge_lora(base, state.params, alpha=8.0)
    merged_b = merge_lora(base, loaded, alpha=8.0)
    for t in ("wq", "w_down"):
        np.testing.assert_allclose(
            np.asarray(merged_a["net"]["layers"][t]),
            np.asarray(merged_b["net"]["layers"][t]), atol=1e-6)
        assert np.abs(np.asarray(merged_a["net"]["layers"][t])
                      - np.asarray(base["net"]["layers"][t])).max() > 0
    import json as _json
    acfg = _json.loads((Path(adapter_dir) / "adapter_config.json").read_text())
    assert acfg["r"] == 4 and "q_proj" in acfg["target_modules"]
