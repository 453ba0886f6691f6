"""Coverage for utils (profiling), preprocess, publish and metrics modules."""

import json
import pickle
from pathlib import Path

import numpy as np


def test_stage_timer():
    from midi_model_tpu.utils import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a:" in rep and "ms each" in rep
    t.reset()
    assert not t.totals


def test_trace_noop():
    from midi_model_tpu.utils import trace

    with trace(None):
        x = 1 + 1
    assert x == 2


def test_metrics_writer(tmp_path):
    from midi_model_tpu.train.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.log(1, {"train/loss": 1.5})
    w.log(2, {"train/loss": 1.25, "val/acc": 0.5})
    w.close()
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[1]["val/acc"] == 0.5


def test_preprocess_process_file(tmp_path):
    from midi_model_tpu.train.preprocess import process_file

    with open(Path(__file__).parent / "golden" / "codec.pkl", "rb") as f:
        goldens = pickle.load(f)
    good = tmp_path / "g.mid"
    good.write_bytes(goldens["rand_03"]["bytes"])
    path, reason = process_file((str(good), "v2", True))
    assert path == str(good)
    assert reason is None or isinstance(reason, str)  # quality verdict

    small = tmp_path / "small.mid"
    small.write_bytes(b"tiny")
    assert process_file((str(small), "v2", True))[1] == "too_small"

    bad = tmp_path / "bad.mid"
    bad.write_bytes(b"x" * 5000)
    assert process_file((str(bad), "v2", True))[1] in ("parse_error", "empty")


def test_publish_from_safetensors(tmp_path):
    import jax

    from midi_model_tpu.interop.publish import publish
    from midi_model_tpu.interop import save_safetensors
    from midi_model_tpu.models import MIDIModelConfig, midinet

    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=64, n_inner=128)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg)
    src = tmp_path / "model.safetensors"
    save_safetensors(jax.tree.map(np.asarray, params), cfg, str(src))

    cfg_file = tmp_path / "config.json"
    cfg_file.write_text(json.dumps(cfg.to_dict()))
    out = publish(str(src), str(cfg_file), str(tmp_path / "pub"), dtype="fp32")
    assert (Path(out) / "model.safetensors").exists()
    assert (Path(out) / "config.json").exists()
    # loadable back through the torch interop path
    from midi_model_tpu.interop import load_state_dict, params_from_state_dict

    sd = load_state_dict(str(Path(out) / "model.safetensors"))
    params2 = params_from_state_dict(sd, cfg)
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                     jax.tree.map(np.asarray, params), params2)
    assert max(jax.tree.leaves(d)) == 0.0
