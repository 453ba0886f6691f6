"""Isolate the continuous batcher's slowness: time compile vs steady steps,
with and without admissions, at two slot counts."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher


def probe(n_slots, chunk):
    config = MIDIModelConfig.from_name("tv2o-medium")
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(params, config, n_slots=n_slots, max_seq=512,
                                chunk=chunk, disable_eos=True)
    prompt = np.full((1, tok.max_token_seq), tok.pad_id, np.int32)
    prompt[0, 0] = tok.bos_id
    t0 = time.time()
    for _ in range(n_slots):
        batcher.submit(prompt, max_events=10**9)  # never finish by budget
    print(f"[slots={n_slots} chunk={chunk}] submit+prefill: "
          f"{time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    batcher.step()
    print(f"  first step (compile): {time.time()-t0:.1f}s", flush=True)
    for i in range(3):
        t0 = time.time()
        batcher.step()
        dt = time.time() - t0
        print(f"  steady step {i}: {dt:.2f}s -> "
              f"{n_slots*chunk/dt:,.0f} events/sec", flush=True)


if __name__ == "__main__":
    probe(32, 16)
    probe(128, 16)
