"""Prefill attribution at serving shape (default bs=32 x 2048-event prompts).

Round 3 measured the full prefill at 5.0 s — ~3% of the MXU peak for its
~30 TFLOP of event-net work.  This splits it:

  emb        — the chunked 16-event lax.map embedding gather alone
  fwd        — llama.forward (no cache): pure transformer math on the emb
  paged      — llama.prefill_paged: fwd + packed page writes into the pools
  full       — sampling.generate.prefill end to end (emb + paged + alloc)

Seconds-scale timings, so the tunnel's ~31 ms dispatch overhead is noise;
each timed call syncs via a device->host scalar readback (the only wait the
axon tunnel honors — see tools/probe_attn_bwd.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.models import llama
import importlib

gen = importlib.import_module("midi_model_tpu.sampling.generate")


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def timeit(fn, *args, label="", n=3):
    _sync(fn(*args))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms", flush=True)
    return best


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    p_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    name = sys.argv[3] if len(sys.argv) > 3 else "tv2o-medium"
    config = MIDIModelConfig.from_name(name)
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(
        3, config.tokenizer.vocab_size, (bs, p_len, 8)), jnp.int32)
    net = config.net
    print(f"{name} bs={bs} p_len={p_len}")

    # --- emb only (the chunked gather) ---
    @jax.jit
    def emb_only(prompt):
        t_max = prompt.shape[-1]
        pad16 = (-p_len) % 16
        padded = (jnp.pad(prompt, ((0, 0), (0, pad16), (0, 0)))
                  if pad16 else prompt)
        emb = jax.lax.map(
            lambda c: midinet.embed_events(params, c),
            padded.reshape(bs, -1, 16, t_max).swapaxes(0, 1))
        return emb.swapaxes(0, 1).reshape(bs, -1, emb.shape[-1])[:, :p_len]

    timeit(emb_only, prompt, label="emb (chunked lax.map)")

    @jax.jit
    def emb_flat(prompt):
        return midinet.embed_events(params, prompt)

    try:
        timeit(emb_flat, prompt, label="emb (one fused gather)")
    except Exception as e:
        print(f"emb (one fused gather): FAILED {type(e).__name__}: "
              f"{str(e)[:120]}")

    emb = emb_only(prompt)

    # --- plain forward (no cache, no writes) ---
    # params must be ARGUMENTS: closed-over weights become HLO constants
    # and the ~410 MB program body blows the tunnel's remote-compile
    # request limit (HTTP 413)
    @jax.jit
    def fwd(params, emb):
        h, _ = llama.forward(params["net"], net, emb)
        return h

    timeit(fwd, params, emb, label="fwd (no pool writes)")

    # --- prefill_paged (fwd + packed page writes) ---
    from midi_model_tpu.ops.paged_allheads import alloc_pools

    ps = gen.PAGE_SIZE
    pps = -(-(-(-p_len // ps)) // 4) * 4
    l_n, hkv, dh = net.num_layers, net.kv_heads, net.head_dim

    @jax.jit
    def paged(params, emb):
        pools = alloc_pools(hkv, l_n * bs * pps, ps, dh, jnp.bfloat16)
        h, pools = llama.prefill_paged(params["net"], net, emb, pools,
                                       page_size=ps, pages_per_slot=pps)
        return h

    timeit(paged, params, emb, label="prefill_paged (fwd + writes)")

    # --- full prefill ---
    def full(params, prompt):
        return gen.prefill(params, config, prompt, p_len + 1)

    timeit(full, params, prompt, label="full sampling.prefill")


if __name__ == "__main__":
    main()
