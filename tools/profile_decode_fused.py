"""Component attribution for the decode path, measured INSIDE one dispatch.

Each probe chains N iterations of one component inside a single jitted
program (lax.fori_loop with data dependencies), so the axon tunnel's
multi-ms per-dispatch overhead and run-to-run variance cannot pollute the
attribution. Reports device ms per iteration.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, llama, midinet
from midi_model_tpu.models.llama import KVCache
from midi_model_tpu.sampling.generate import _decode_one_event, _mask_arrays
from midi_model_tpu.sampling.masks import build_mask_table
from midi_model_tpu.sampling.topk_topp import sample_top_p_k

B = 32
N = 64
_FLOOR = [0.0]  # measured dispatch+sync floor of the axon tunnel (seconds)


def _measure_floor():
    """One dispatch + scalar fetch of a trivial program: everything below
    this is tunnel overhead, not device time — subtract it from every probe
    (it used to be ~31 ms and polluted all round-1 attributions)."""
    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(())
    float(nop(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(x))
        best = min(best, time.perf_counter() - t0)
    _FLOOR[0] = best
    print(f"tunnel floor (dispatch+sync): {best*1e3:.1f} ms — subtracted")


def timeit(fn, *args, label=""):
    # fn must return a SCALAR: fetching big arrays over the axon tunnel is
    # ~seconds and would swamp the measurement
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0))
    dev = best - _FLOOR[0]
    print(f"{label}: {dev / N * 1000:.3f} ms/iter  ({dev*1000:.1f} ms / {N})")


def main():
    config = MIDIModelConfig.from_name("tv2o-medium")
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    masks = _mask_arrays(build_mask_table(tok, disable_eos=True))
    key = jax.random.PRNGKey(0)
    _measure_floor()

    # 1. full event (token scan + sampling + event-net cached step), cache 513
    @jax.jit
    def full_events(params, state):
        def body(i, st):
            st, _row = _decode_one_event(params, config, st, masks, 1.0,
                                         0.98, 20, jax.random.fold_in(key, i),
                                         False)
            return st
        st = jax.lax.fori_loop(0, N, body, state)
        return st.hidden.astype(jnp.float32).sum()

    from midi_model_tpu.sampling.generate import prefill, normalize_prompt
    prompt = jnp.asarray(normalize_prompt(tok, None, B))
    state0 = prefill(params, config, prompt, 513)
    timeit(full_events, params, state0, label="full event (cache 513)")

    # 2. token-row decode (8 steps incl. sampling): XLA scan vs fused kernel
    from midi_model_tpu.ops import token_loop
    from midi_model_tpu.sampling.generate import token_row_scan
    hidden = jnp.zeros((B, config.n_embd), jnp.bfloat16)

    def row_probe(fn):
        @jax.jit
        def run(params, hidden):
            def one_loop(i, h):
                row, _ = fn(params, h, jax.random.fold_in(key, i))
                return h + row.sum().astype(h.dtype) * 1e-9
            return jax.lax.fori_loop(0, N, one_loop, hidden
                                     ).astype(jnp.float32).sum()
        return run

    timeit(row_probe(lambda p, h, k: token_row_scan(
        p, config, h, masks, 1.0, 0.98, 20, k, False)),
        params, hidden, label="token row: XLA scan (8 steps+sample)")
    timeit(row_probe(lambda p, h, k: token_loop.decode_token_row(
        p, config, h, masks, 1.0, 0.98, 20, k)),
        params, hidden, label="token row: fused kernel")

    # 3. sampling alone (8 per iter)
    logits0 = jnp.zeros((B, tok.vocab_size), jnp.float32)

    @jax.jit
    def samples(logits):
        def body(i, lg):
            probs = jax.nn.softmax(lg, axis=-1)
            t = sample_top_p_k(probs, 0.98, 20, jax.random.fold_in(key, i))
            return lg + t[:, None].astype(lg.dtype) * 1e-9
        return jax.lax.fori_loop(0, 8 * N, body, logits).sum()

    timeit(samples, logits0, label="sampling x8")

    # 4. event-net cached step: the LIVE paged path vs the dense XLA path
    emb1 = jnp.zeros((B, config.n_embd), jnp.bfloat16)
    net = config.net
    ps, pps = 64, 12  # capacity 768, whole 4-page blocks
    from midi_model_tpu.ops.paged_allheads import alloc_pools
    pools = alloc_pools(net.kv_heads, net.num_layers * B * pps, ps,
                        net.head_dim, jnp.bfloat16)
    index = jnp.full((B,), 513, jnp.int32)

    @jax.jit
    def paged_steps(params, emb1, pools):
        def body(i, carry):
            e, pl_ = carry
            h, pl_ = llama.decode_paged(params["net"], net, e, pl_, index,
                                        page_size=ps, pages_per_slot=pps)
            return (e + h * 1e-9, pl_)
        e, _ = jax.lax.fori_loop(0, N, body, (emb1, pools))
        return e.astype(jnp.float32).sum()

    timeit(paged_steps, params, emb1, pools,
           label="event-net paged step (cache 513)")

    # 4b. the fused WHOLE-STEP kernel (the live aligned path on TPU)
    from midi_model_tpu.ops import fused_step as _fs
    fused = _fs.prepare_fused(params["net"])

    @jax.jit
    def fused_steps(fused, emb1, pools):
        def body(i, carry):
            e, pl_ = carry
            h, pl_ = _fs.fused_decode_step(fused, net, e, pl_, index,
                                           page_size=ps, pages_per_slot=pps)
            return (e + h * 1e-9, pl_)
        e, _ = jax.lax.fori_loop(0, N, body, (emb1, pools))
        return e.astype(jnp.float32).sum()

    if jax.default_backend() == "tpu":
        timeit(fused_steps, fused, emb1, pools,
               label="event-net FUSED whole-step (cache 513)")

    emb = jnp.zeros((B, 1, config.n_embd), jnp.bfloat16)
    cache = KVCache.zeros(config.net, B, 513, dtype=jnp.bfloat16)

    @jax.jit
    def event_steps(params, emb, cache):
        def body(i, carry):
            e, c = carry
            h, c2 = llama.forward(params["net"], config.net, e, cache=c)
            c2 = c2._replace(index=c.index)  # keep static-ish length
            return (e + h * 1e-9, c2)
        e, _ = jax.lax.fori_loop(0, N, body, (emb, cache))
        return e.astype(jnp.float32).sum()

    timeit(event_steps, params, emb, cache,
           label="event-net dense step (cache 513)")


if __name__ == "__main__":
    main()
