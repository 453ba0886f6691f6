"""Try the REAL flagship programs with the fused whole-step kernel AND the
token-row kernel co-compiled — the combination round 3 fenced off after
compile failures (serve/batcher.py token-scan gating;
generate._decode_one_event's 24-layer gate).

  batcher   — real ContinuousBatcher (medium, 32 slots) with _fused forced
              on next to _token_kernel_ok=True; steps through admission +
              steady chunks and prints steady-state throughput.
  batcher128 — same at 128 slots.
  large     — aligned tv2o-large decode_events (token kernel + 24-layer
              fused kernel co-compiled natively since the scoped-vmem fix),
              timed.

Run on the real TPU: python tools/probe_both_kernels_real.py [stage ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def batcher_stage(slots):
    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.serve import batcher as bt
    from midi_model_tpu.ops import fused_step as fs

    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    b = bt.ContinuousBatcher(params, config, n_slots=slots, max_seq=1024,
                             chunk=32, disable_eos=True)
    assert b._token_kernel_ok, "expected the token kernel on for medium bf16"
    assert b._fused is None, "batcher defaults to the split event net"
    b._fused = fs.prepare_fused(params["net"])  # force the combination
    bos = [[config.tokenizer.bos_id] + [config.tokenizer.pad_id] * 7]
    for _ in range(slots):
        b.submit(bos, max_events=10_000)
    print(f"[batcher{slots}] compiling/stepping both-kernel program ...",
          flush=True)
    t0 = time.time()
    b.step()
    print(f"[batcher{slots}] first step ok ({time.time() - t0:.0f}s)",
          flush=True)
    # steady-state: timed steps at full occupancy
    for _ in range(2):
        b.step()
    rates = []
    for _ in range(4):
        t0 = time.time()
        b.step()
        dt = time.time() - t0
        rates.append(slots * b.chunk / dt)
    print(f"[batcher{slots}] steady-state: best {max(rates):.0f} ev/s, "
          f"runs {[f'{r:.0f}' for r in rates]}", flush=True)


def large_stage():
    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.sampling import build_mask_table, prefill
    from midi_model_tpu.sampling.generate import (_mask_arrays, decode_events,
                                                  normalize_prompt)

    # the 24-layer token-kernel gate is gone since the round-4 scoped-vmem
    # fix — decode_events runs both kernels at tv2o-large natively now
    config = MIDIModelConfig.from_name("tv2o-large")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, 32))
    masks = _mask_arrays(build_mask_table(config.tokenizer, disable_eos=True))
    key = jax.random.PRNGKey(42)

    def run():
        state = prefill(params, config, prompt, 1 + 512)
        state, rows, n = decode_events(params, config, state, masks, 512,
                                       1.0, 0.98, 20, key)
        return int(n)

    print("[large] compiling token-kernel-forced program ...", flush=True)
    t0 = time.time()
    run()
    print(f"[large] compile+first run ok ({time.time() - t0:.0f}s)",
          flush=True)
    rates = []
    for _ in range(4):
        t0 = time.time()
        n = run()
        rates.append(n * 32 / (time.time() - t0))
    print(f"[large] best {max(rates):.0f} ev/s, "
          f"runs {[f'{r:.0f}' for r in rates]}", flush=True)


def main():
    stages = sys.argv[1:] or ["batcher32", "large"]
    for s in stages:
        jax.clear_caches()
        if s.startswith("batcher"):
            batcher_stage(int(s[len("batcher"):] or "32"))
        elif s == "large":
            large_stage()
        else:
            print(f"unknown stage {s}")


if __name__ == "__main__":
    main()
