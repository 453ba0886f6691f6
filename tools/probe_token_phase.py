"""Measure the merged kernel's SERIAL token-phase cost by depth variation.

The round-4 structural-floor accounting for aligned decode (BASELINE.md)
estimated the token phase at ~0.25 ms/event and declared a 1.80 ms/event
floor (17.8k ev/s at bs=32); round 5's grouped flash loop + cross-phase
prefetch reached 2.10 ms (15.3k) and attributed the remaining 0.30 ms to
"the serial token phase's real cost exceeding the floor's estimate".  This
probe turns that attribution into a measurement (VERDICT r4 task 3's
"probe that revises the floor" arm).

Method: decode with the whole-event-loop kernel (ops/event_loop.py) on
tv2o-medium and on variants identical except ``net_token.num_layers``
(3 -> 2 -> 1).  The event net, cache stream, weight rotation, sampler
count, grammar masks, and the embed/lm_head matmuls are all unchanged
across variants, so the fitted slope b of T(tl) = a + b*tl is exactly one
token-net layer's serial cost x 8 steps per event.  At 32 rows one token
layer (~0.46 GFLOP/step-event) ~= the one-hot embed (~0.45) ~= lm_head
(~0.45), so the full serial token phase is ~ (tl + 2)*b + sampler, and the
revised floor is

    floor = weight stream (0.49 ms) + cache stream (1.06 ms @ avg len 512)
            + measured token phase

instead of the round-4 0.25 ms guess.  Run:

    python tools/probe_token_phase.py            # tl = 3, 2, 1 on the chip
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

BATCH = 32
MAX_EVENTS = 1024


def measure_tl(tl: int):
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.models.config import MIDIModelConfig as Cfg
    from midi_model_tpu.sampling import build_mask_table, prefill
    from midi_model_tpu.sampling.generate import (_decode_events_jitted,
                                                  _mask_arrays, decode_events,
                                                  normalize_prompt)

    base = MIDIModelConfig.from_name("tv2o-medium")
    config = Cfg(base.tokenizer, base.net,
                 dataclasses.replace(base.net_token, num_layers=tl))
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, BATCH))
    masks = _mask_arrays(build_mask_table(config.tokenizer, disable_eos=True))
    key = jax.random.PRNGKey(42)

    def run():
        state = prefill(params, config, prompt, 1 + MAX_EVENTS)
        state, rows, n = decode_events(params, config, state, masks,
                                       MAX_EVENTS, 1.0, 0.98, 20, key)
        return int(n)

    _decode_events_jitted.cache_clear()
    t0 = time.time()
    run()
    print(f"[tl={tl}] compile+warmup {time.time() - t0:.0f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        n = run()
        times.append((time.time() - t0) / n)
    _decode_events_jitted.cache_clear()
    ms = float(np.median(times)) * 1e3
    print(f"[tl={tl}] {ms:.3f} ms/event median "
          f"({BATCH / np.median(times):,.0f} ev/s)", flush=True)
    return ms


def main():
    tls = [3, 2, 1]
    ms = {tl: measure_tl(tl) for tl in tls}
    # least-squares slope of T(tl): one token layer's serial cost per event
    x = np.asarray(tls, float)
    y = np.asarray([ms[tl] for tl in tls])
    b, a = np.polyfit(x, y, 1)
    token_net = 3 * b             # the 3-layer net's serial cost
    embed_lm = 2 * b              # embed + lm_head ~= one layer each (FLOPs)
    phase = token_net + embed_lm  # excl. sampler (+~0.06 ms: 8 x ~8 us)
    floor_ms = 0.49 + 1.06 + phase + 0.064
    print(f"\nfit: T = {a:.3f} + {b:.3f}*tl ms/event "
          f"(r3-layer token net {token_net:.3f} ms, "
          f"embed+lm_head ~{embed_lm:.3f} ms by FLOP parity)")
    print(f"measured serial token phase ~{phase + 0.064:.3f} ms/event "
          f"(incl. 8 sampler calls @ ~8 us)")
    print(f"revised structural floor: 0.49 (weights) + 1.06 (cache @ avg "
          f"512) + {phase + 0.064:.3f} = {floor_ms:.3f} ms/event "
          f"= {BATCH / floor_ms * 1e3:,.0f} ev/s at bs=32", flush=True)


if __name__ == "__main__":
    main()
