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


def measure(batch_size: int, backend: str, token_chunk=None, remat=False,
            name="tv2o-medium") -> float:
    set_backend(backend)
    config = MIDIModelConfig.from_name(name)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    opt = make_optimizer()
    step = make_train_step(config, opt, accum_steps=1, token_chunk=token_chunk,
                           remat=remat)
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
    print(f"{name} bs={batch_size} attn={backend} chunk={token_chunk} "
          f"remat={remat}: {dt*1000:.0f} ms/step, {tokens/dt:,.0f} tokens/sec")
    return tokens / dt


def main():
    jobs = [
        dict(batch_size=2, backend="auto"),
        dict(batch_size=4, backend="auto", token_chunk=2048),
        dict(batch_size=8, backend="auto", token_chunk=2048, remat=True),
        dict(batch_size=16, backend="auto", token_chunk=2048, remat=True),
        dict(batch_size=2, backend="auto", token_chunk=2048, remat=True,
             name="tv2o-large"),
        dict(batch_size=4, backend="auto", token_chunk=2048, remat=True,
             name="tv2o-large"),
    ]
    for job in jobs:
        try:
            measure(**job)
        except Exception as e:
            print(f"{job}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
