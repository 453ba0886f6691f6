"""Continuous-batch serving throughput on one chip (tv2o-medium).

Two modes:
- default: end-to-end (admission + prefill + ramp + tail) over a request
  stream — the number a short bursty workload sees;
- --steady: per-step timing at full occupancy with unbounded budgets — the
  sustained decode throughput (what capacity planning wants). This is the
  number quoted in BASELINE.md config 5.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher


def _setup(n_slots, max_seq, chunk, kv_int8, model="tv2o-medium"):
    if "--split" in sys.argv:  # force the split scan (A/B vs merged kernel)
        from midi_model_tpu.ops import event_loop

        event_loop.set_enabled(False)
    config = MIDIModelConfig.from_name(model)
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(params, config, n_slots=n_slots,
                                max_seq=max_seq, chunk=chunk,
                                disable_eos=True, kv_int8=kv_int8)
    prompt = np.full((1, tok.max_token_seq), tok.pad_id, np.int32)
    prompt[0, 0] = tok.bos_id
    return batcher, prompt


def main(n_slots=128, max_seq=512, budget=128, n_requests=160,
         kv_int8=False, chunk=32, model="tv2o-medium"):
    batcher, prompt = _setup(n_slots, max_seq, chunk, kv_int8, model)
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
    print(f"slots={n_slots} requests={n_requests} budget={budget}"
          f"{' int8' if kv_int8 else ''}: {total_rows} rows in {dt:.1f}s "
          f"-> {total_rows/dt:,.0f} events/sec", flush=True)


def steady(n_slots=128, max_seq=512, kv_int8=False, chunk=32,
           model="tv2o-medium"):
    batcher, prompt = _setup(n_slots, max_seq, chunk, kv_int8, model)
    for _ in range(n_slots):
        batcher.submit(prompt, max_events=10**9)  # never retire
    batcher.step()  # compile
    batcher.step()  # fill the pipeline (pipelined mode keeps 1 in flight)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        batcher.step()
        times.append(time.perf_counter() - t0)
    # SUSTAINED time, not min: with pipeline=True a step that fetches an
    # already-finished chunk looks artificially fast — min() would overstate
    sus = sum(times) / len(times)
    print(f"steady model={model} slots={n_slots} chunk={chunk}"
          f"{' int8' if kv_int8 else ''}: "
          f"{sus*1e3:.1f} ms/step sustained (min {min(times)*1e3:.1f}) -> "
          f"{n_slots*chunk/sus:,.0f} events/sec", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    kv_int8 = "--int8" in args
    slots = next((int(a.split("=")[1]) for a in args
                  if a.startswith("--slots=")), 128)
    model = next((a.split("=")[1] for a in args
                  if a.startswith("--model=")), "tv2o-medium")
    if "--steady" in args:
        steady(n_slots=slots, kv_int8=kv_int8, model=model)
    else:
        main(n_slots=slots, kv_int8=kv_int8, model=model)
