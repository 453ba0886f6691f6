"""A/B the whole-event-loop kernel (ops/event_loop.py) on the real chip.

Measures aligned decode (tv2o-medium, bs=32, 1024 events, top-p/top-k —
the bench.py configuration) three ways:

    python tools/probe_event_loop.py           # merged E=8 vs split (r3 path)
    python tools/probe_event_loop.py --e=16    # one merged config only
    python tools/probe_event_loop.py --model=tv2o-large
    python tools/probe_event_loop.py --parity [--ckpt=path/model.safetensors]
        on-device greedy-parity A/B: full merged decode stream vs the split
        path, token-for-token, on real weights when --ckpt points at a
        reference checkpoint (the acceptance check the advisor asked for:
        the merged kernel's two sub-sampling numeric deltas — f32 event-
        embedding sum, chunk-ordered down-proj partials — could in
        principle flip a near-tie greedy token on an untested checkpoint)

The split baseline is the round-3 kernel pair (fused whole-step event net +
token-row kernel), i.e. what bench.py shipped before the merge.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

BATCH = 32
MAX_EVENTS = 1024


def measure(tag, model="tv2o-medium", max_events=None):
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.sampling import build_mask_table, prefill
    from midi_model_tpu.sampling.generate import (_decode_events_jitted,
                                                  _mask_arrays, decode_events,
                                                  normalize_prompt)

    _decode_events_jitted.cache_clear()  # re-trace under the current toggles
    max_events = max_events or MAX_EVENTS
    config = MIDIModelConfig.from_name(model)
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, BATCH))
    masks = _mask_arrays(build_mask_table(config.tokenizer, disable_eos=True))
    key = jax.random.PRNGKey(42)

    def run():
        state = prefill(params, config, prompt, 1 + max_events)
        state, rows, n = decode_events(params, config, state, masks,
                                       max_events, 1.0, 0.98, 20, key)
        return int(n)

    t0 = time.time()
    run()
    print(f"[{tag}] compile+warmup {time.time() - t0:.0f}s", flush=True)
    rates = []
    for _ in range(3):
        t0 = time.time()
        n = run()
        rates.append(n * BATCH / (time.time() - t0))
    print(f"[{tag}] best {max(rates):,.0f} ev/s  "
          f"median {float(np.median(rates)):,.0f}  runs "
          + " ".join(f"{r:,.0f}" for r in rates), flush=True)
    _decode_events_jitted.cache_clear()


def parity(model="tv2o-medium", ckpt=None, max_events=256):
    """Greedy decode A/B on device: merged whole-event-loop kernel vs the
    split round-3 path, full stream compared token-for-token."""
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.ops import event_loop
    from midi_model_tpu.sampling import build_mask_table, prefill
    from midi_model_tpu.sampling.generate import (_decode_events_jitted,
                                                  _mask_arrays, decode_events,
                                                  normalize_prompt)

    config = MIDIModelConfig.from_name(model)
    if ckpt:
        from midi_model_tpu.interop.publish import load_any_checkpoint

        params = load_any_checkpoint(ckpt, config)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        params = midinet.init_params(jax.random.PRNGKey(0), config,
                                     dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, BATCH))
    masks = _mask_arrays(build_mask_table(config.tokenizer, disable_eos=True))
    key = jax.random.PRNGKey(7)

    def run():
        _decode_events_jitted.cache_clear()
        state = prefill(params, config, prompt, 1 + max_events)
        _, rows, n = decode_events(params, config, state, masks, max_events,
                                   1.0, 0.98, 20, key, greedy=True)
        return np.asarray(rows[:, :int(n)])

    event_loop.set_enabled(True)
    merged = run()
    event_loop.set_enabled(False)
    split = run()
    event_loop.set_enabled(True)
    n = min(merged.shape[1], split.shape[1])
    same = np.array_equal(merged[:, :n], split[:, :n])
    diff = (np.argwhere(merged[:, :n] != split[:, :n])[:3].tolist()
            if not same else [])
    print(f"parity model={model} ckpt={ckpt or 'random'} events={n}: "
          f"{'IDENTICAL' if same and merged.shape == split.shape else 'DIFF'}"
          f"{'' if same else f' first diffs (b, ev, tok)={diff}'}",
          flush=True)
    return same


def main():
    from midi_model_tpu.ops import event_loop

    args = sys.argv[1:]
    model = next((a.split("=")[1] for a in args
                  if a.startswith("--model=")), "tv2o-medium")
    n_ev = next((int(a.split("=")[1]) for a in args
                 if a.startswith("--events=")), None)
    e_only = next((int(a.split("=")[1]) for a in args
                   if a.startswith("--e=")), None)
    rot = next((int(a.split("=")[1]) for a in args
                if a.startswith("--rot=")), None)
    if "--parity" in args:
        ckpt = next((a.split("=", 1)[1] for a in args
                     if a.startswith("--ckpt=")), None)
        ok = parity(model, ckpt)
        sys.exit(0 if ok else 1)
    if rot is not None:
        import functools

        orig = event_loop.merged_decode_events
        event_loop.merged_decode_events = functools.partial(orig, n_rot=rot)
    if e_only is not None or rot is not None:
        if e_only is not None:
            event_loop.EVENTS_PER_DISPATCH = e_only
        measure(f"merged-E{e_only or 8}-R{rot or 8}", model, n_ev)
        return
    measure("merged-E8", model, n_ev)
    event_loop.set_enabled(False)
    measure("split-r3", model, n_ev)


if __name__ == "__main__":
    main()
