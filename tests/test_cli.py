"""Smoke tests: train CLI end-to-end on a tiny model + toy corpus, demo script."""

import json
import pickle
import subprocess
import sys
from pathlib import Path

import pytest

from midi_model_tpu.models import MIDIModelConfig

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    with open(Path(__file__).parent / "golden" / "codec.pkl", "rb") as f:
        goldens = pickle.load(f)
    for name, g in goldens.items():
        if not name.startswith("bad_"):
            (d / f"{name}.mid").write_bytes(g["bytes"])
    return d


def tiny_config_file(tmp_path) -> str:
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    path = tmp_path / "tiny_config.json"
    path.write_text(json.dumps(cfg.to_dict()))
    return str(path)


def test_train_cli_smoke(corpus, tmp_path):
    """3 optimizer steps + validation + checkpoint on the toy corpus."""
    from midi_model_tpu.train.cli import main

    out_dir = tmp_path / "run"
    main([
        "--data", str(corpus), "--config", tiny_config_file(tmp_path),
        "--data-val-split", "2", "--max-len", "64", "--max-step", "3",
        "--val-step", "3", "--batch-size-train", "2", "--batch-size-val", "1",
        "--acc-grad", "2", "--workers-train", "0", "--warmup-step", "1",
        "--gen-example-interval", "0", "--out-dir", str(out_dir), "--fp32",
    ])
    assert (out_dir / "checkpoints" / "config.json").exists()
    assert (out_dir / "logs" / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in
             (out_dir / "logs" / "metrics.jsonl").read_text().splitlines()]
    assert any("train/loss" in l for l in lines)
    assert any("val/loss" in l for l in lines)
    # best-val safetensors export happened
    assert (out_dir / "checkpoints" / "model.safetensors").exists()


def test_train_cli_resume(corpus, tmp_path):
    from midi_model_tpu.train.cli import main

    out_dir = tmp_path / "run2"
    args = [
        "--data", str(corpus), "--config", tiny_config_file(tmp_path),
        "--data-val-split", "2", "--max-len", "32", "--max-step", "2",
        "--val-step", "2", "--batch-size-train", "1", "--batch-size-val", "1",
        "--acc-grad", "1", "--workers-train", "0", "--warmup-step", "1",
        "--gen-example-interval", "0", "--out-dir", str(out_dir), "--fp32",
    ]
    main(args)
    # resume for 2 more steps
    args[args.index("--max-step") + 1] = "4"
    main(args + ["--resume", "1"])


def test_demo_script(tmp_path):
    """Demo runs end-to-end on a tiny config file."""
    import os

    env = dict(os.environ)
    env.update({"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"})
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the demo off the TPU claim
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "demo.py"),
         "--config", tiny_config_file(tmp_path), "--events", "8",
         "--batch", "1", "--out", str(tmp_path / "demo_out")],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    outs = list((tmp_path / "demo_out").glob("*.mid"))
    assert outs, proc.stdout
