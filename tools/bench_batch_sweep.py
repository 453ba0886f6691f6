"""Generation throughput vs batch size (serving scaling on one chip)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.sampling import build_mask_table, decode_events, prefill
from midi_model_tpu.sampling.generate import _mask_arrays, normalize_prompt

EVENTS = 512


def run(batch, name="tv2o-medium", kv_int8=False):
    config = MIDIModelConfig.from_name(name)
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(tok, None, batch))
    masks = _mask_arrays(build_mask_table(tok, disable_eos=True))
    key = jax.random.PRNGKey(42)

    # warm up with the SAME chunk size: the chunk is a static arg, so a
    # different warmup chunk would leave the compile inside the timed region
    state = prefill(params, config, prompt, 1 + EVENTS, kv_int8=kv_int8)
    state, rows, n = decode_events(params, config, state, masks, EVENTS, 1.0,
                                   0.98, 20, key)
    int(n)  # sync after compile/warmup
    best = 0.0
    for _ in range(2):
        state2 = prefill(params, config, prompt, 1 + EVENTS, kv_int8=kv_int8)
        t0 = time.time()
        state2, rows, n = decode_events(params, config, state2, masks, EVENTS,
                                        1.0, 0.98, 20, key)
        n = int(n)
        best = max(best, n / (time.time() - t0))
    dt = n / best
    print(f"{name}{' int8' if kv_int8 else ''} bs={batch}: {n} events in {dt:.1f}s -> "
          f"{n * batch / dt:,.0f} events/sec", flush=True)


if __name__ == "__main__":
    name = next((a.split("=")[1] for a in sys.argv[1:]
                 if a.startswith("--config=")), "tv2o-medium")
    batches = next((a.split("=")[1] for a in sys.argv[1:]
                    if a.startswith("--batches=")), "32,128")
    kv_int8 = "--int8" in sys.argv[1:]
    for batch in (int(b) for b in batches.split(",")):
        try:
            run(batch, name, kv_int8)
        except Exception as e:
            print(f"bs={batch}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)
