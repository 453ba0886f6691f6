"""BASELINE config 4: training throughput on the real TPU chip.

tv2o-medium, seq 2048 events x 8 tokens, bf16 compute / fp32 master.
Reports tokens/sec (= B * 2048 * 8 / step time) for a few batch sizes and
both attention backends.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import set_backend
from midi_model_tpu.train import init_train_state, make_optimizer, make_train_step

SEQ = 2048
STEPS = 8


def measure(batch_size: int, backend: str, sample_seq=None) -> float:
    set_backend(backend)
    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    opt = make_optimizer()
    step = make_train_step(config, opt, accum_steps=1)
    state = init_train_state(params, opt)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        3, config.tokenizer.vocab_size, (1, batch_size, SEQ, 8)), jnp.int32)

    state, m = step(state, batch)  # compile
    float(m["loss"])
    t0 = time.time()
    for _ in range(STEPS):
        state, m = step(state, batch)
    float(m["loss"])  # host sync
    dt = (time.time() - t0) / STEPS
    tokens = batch_size * SEQ * 8
    print(f"bs={batch_size} attn={backend}: {dt*1000:.0f} ms/step, "
          f"{tokens/dt:,.0f} tokens/sec")
    return tokens / dt


def main():
    for backend in ("auto", "xla"):
        for bs in (2, 4, 8):
            try:
                measure(bs, backend)
            except Exception as e:
                print(f"bs={bs} attn={backend}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
