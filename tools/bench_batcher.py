"""Continuous-batch serving throughput on one chip (tv2o-medium)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher


def main(n_slots=128, max_seq=512, budget=128, n_requests=160):
    config = MIDIModelConfig.from_name("tv2o-medium")
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(params, config, n_slots=n_slots,
                                max_seq=max_seq, chunk=32, disable_eos=True)
    prompt = np.full((1, tok.max_token_seq), tok.pad_id, np.int32)
    prompt[0, 0] = tok.bos_id

    for _ in range(n_slots):
        batcher.submit(prompt, max_events=budget)
    batcher.step()  # compile + first chunk

    t0 = time.time()
    total_rows = 0
    submitted = n_slots
    while batcher.any_active:
        for fin in batcher.step():
            total_rows += len(fin.rows)
            if submitted < n_requests:
                batcher.submit(prompt, max_events=budget)
                submitted += 1
    dt = time.time() - t0
    print(f"slots={n_slots} requests={n_requests} budget={budget}: "
          f"{total_rows} rows in {dt:.1f}s -> {total_rows/dt:,.0f} events/sec",
          flush=True)


if __name__ == "__main__":
    main()
