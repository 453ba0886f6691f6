"""Repro: fused whole-step event kernel + int8 KV pools @ 128 slots.

Round 4 observed a runtime ``FailedPrecondition`` when the batcher ran the
fused event-net kernel (ops/fused_step.py) over int8-quantized pools at 128
slots, and simply left the combination off (serve/batcher.py keeps
``_fused = None`` in all configurations — the fused kernel measured slower
than the split streaming path under ragged lengths anyway).  VERDICT round 4
asked for the error to be root-caused or at least pinned with a verbatim
repro.  This script forces the combination exactly as round 4 ran it:

    python tools/repro_int8_fused.py            # int8 @ 128 slots + fused
    python tools/repro_int8_fused.py --slots=32 # control: small slot count
    python tools/repro_int8_fused.py --bf16     # control: bf16 pools

and prints either the verbatim failure (plus the scoped-vmem/HLO context
that usually accompanies it) or a steady-state throughput if the current
JAX/XLA stack has stopped rejecting it.

Result (2026-08-20, live v5e, round-5 stack): the FailedPrecondition NO
LONGER REPRODUCES.  ``int8 @ 128 slots + fused`` compiles (196 s) and runs
clean at **28,151 ev/s sustained** (145.5 ms/step) — vs 26,262 ev/s for the
shipped default (split streaming event net) in the same session
(tools/bench_batcher.py --steady --int8 --slots=128).  The round-4 failure
predated the production scoped-VMEM raise (utils/xla_opts.py, added later
that round for the chunk-32 compile rejections); the raise evidently also
cleared this runtime precondition.  The fused net stays OFF by default in
the batcher: the +7%% here is a uniform-length full-occupancy number, and
the fused kernel measured slower than the split streaming path under the
ragged lengths real serving produces (serve/batcher.py module docstring).
"""

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.ops import fused_step as fs
    from midi_model_tpu.serve import batcher as bt

    slots = next((int(a.split("=")[1]) for a in sys.argv[1:]
                  if a.startswith("--slots=")), 128)
    kv_int8 = "--bf16" not in sys.argv[1:]

    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    b = bt.ContinuousBatcher(params, config, n_slots=slots, max_seq=1024,
                             chunk=32, disable_eos=True, kv_int8=kv_int8)
    assert b._fused is None, "batcher must default to the split event net"
    b._fused = fs.prepare_fused(params["net"])  # force the combination
    # (single-chip _dispatch passes self._fused straight into the jitted
    # step, so forcing the attribute is the whole override; int8 pools keep
    # the merged ragged kernel off — event_loop.usable() requires bf16 —
    # so this runs exactly the round-4 fused+token-row configuration)
    assert b._merged is None or not kv_int8
    bos = [[config.tokenizer.bos_id] + [config.tokenizer.pad_id] * 7]
    for _ in range(slots):
        b.submit(bos, max_events=10_000)
    tag = f"int8={kv_int8} slots={slots} fused=forced"
    print(f"[{tag}] compiling/stepping ...", flush=True)
    try:
        t0 = time.time()
        b.step()
        print(f"[{tag}] first step ok ({time.time() - t0:.0f}s)", flush=True)
        for _ in range(2):
            b.step()
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            b.step()
            times.append(time.perf_counter() - t0)
        sus = sum(times) / len(times)
        print(f"[{tag}] steady {slots * b.chunk / sus:,.0f} ev/s "
              f"({sus * 1e3:.1f} ms/step sustained)", flush=True)
    except Exception:
        print(f"[{tag}] FAILED — verbatim error:", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
