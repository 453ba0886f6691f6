"""Interleaved A/B: the STREAMED-MLP token-row kernel vs the XLA token scan
for deep nets (tv2o-large) above 32 batcher slots.

Round 4 gated tv2o-large's token-row kernel OFF above 32 slots: its 6-layer
token net keeps ~98 MB of weights VMEM-resident and the kernel's slot-scaled
spills pushed the large/128 program to 141.7 MB of the chip's 128 MB VMEM
(physical rejection, not the round-3 accounting bug).  Round 5 ports the
whole-event-loop kernel's stream_tok_mlp layout to ops/token_loop.py:
gate|up|down leave residency (-36 MB) and double-buffer through a 2-chunk
VMEM rotation (+12 MB), re-streamed every token step.  This probe measures
both paths in ONE process, interleaved (tunnel drift cancels), at full
occupancy — the same protocol as tools/bench_batcher.py --steady.

The two arms are two batchers whose ``_token_kernel_ok`` statics differ, so
each owns its compiled step program (the step jit is keyed on that static;
flipping ops.token_loop._ENABLED after the first trace would not retrace).

Usage:  python tools/probe_token_stream.py [--slots=64] [--model=tv2o-large]
        [--int8] [--reps=3]
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

CHUNK = 32
STEPS = 4


def make(params, config, n_slots, kv_int8, kernel: bool):
    b = ContinuousBatcher(params, config, n_slots=n_slots, max_seq=512,
                          chunk=CHUNK, disable_eos=True, kv_int8=kv_int8)
    if not kernel:  # force this arm onto the XLA token scan
        b._token_kernel_ok = False
        b._token_stream_mlp = False
    tok = config.tokenizer
    prompt = np.full((1, tok.max_token_seq), tok.pad_id, np.int32)
    prompt[0, 0] = tok.bos_id
    for _ in range(n_slots):
        b.submit(prompt, max_events=10**9)
    b.step()  # compile
    b.step()  # fill the pipeline
    return b


def measure(b, n_slots):
    times = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        b.step()
        times.append(time.perf_counter() - t0)
    return n_slots * CHUNK * STEPS / sum(times)


def main():
    args = sys.argv[1:]
    n_slots = next((int(a.split("=")[1]) for a in args
                    if a.startswith("--slots=")), 64)
    model = next((a.split("=")[1] for a in args
                  if a.startswith("--model=")), "tv2o-large")
    reps = next((int(a.split("=")[1]) for a in args
                 if a.startswith("--reps=")), 3)
    kv_int8 = "--int8" in args
    config = MIDIModelConfig.from_name(model)
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)

    kern = make(params, config, n_slots, kv_int8, True)
    layout = ("stream" if kern._token_stream_mlp
              else "resident" if kern._token_kernel_ok else "scan")
    scan = make(params, config, n_slots, kv_int8, False)
    a, bb = [], []
    for _ in range(reps):
        a.append(measure(kern, n_slots))
        bb.append(measure(scan, n_slots))
    print(f"model={model} slots={n_slots}{' int8' if kv_int8 else ''} "
          f"chunk={CHUNK} interleaved medians of {reps}:", flush=True)
    print(f"  token kernel ({layout}): {np.median(a):,.0f} ev/s  "
          f"runs={[round(x) for x in a]}", flush=True)
    print(f"  XLA token scan:          {np.median(bb):,.0f} ev/s  "
          f"runs={[round(x) for x in bb]}", flush=True)


if __name__ == "__main__":
    main()
