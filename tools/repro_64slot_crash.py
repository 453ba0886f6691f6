"""Minimal repro: the remote TPU compiler crashes on exactly-64-slot programs.

Observed (round 2, this container's axon-tunneled v5e): compiling the
continuous batcher's ``_step`` program with ``n_slots=64`` crashes the remote
compiler service (the call never returns / the backend dies); the identical
program at 32, 96 or 128 slots compiles and runs.  ``ContinuousBatcher``
fences n_slots=64 at construction and points here
(tests/test_batcher.py covers the fence via a backend monkeypatch).

Round-4 narrowing (measured 2026-08-19 on the live v5e): at 64 slots the
three Pallas kernels each compile AND RUN standalone (``--component token``
prints ok 590915, ``paged`` ok, ``event`` ok) — the crash is NOT a Mosaic
kernel bug.  Only the composed scan body (``--component step``, jitted
WITHOUT the batcher's raised scoped-vmem default) fails, and it fails
cleanly in an XLA *fusion*, not a kernel; verbatim:

    Ran out of memory in memory space vmem while allocating on stack for
    %fusion.4 = bf16[512,1024]{1,0:T(8,128)(2,1)S(1)} fusion(%copy-done,
    %pad_clamp_fusion.2), kind=kCustom, ...,
    metadata={op_name="jit(<unknown>)/while/body/closed_call/jit(_take)
    /gather" source_file=".../models/midinet.py" source_line=51}.
    Scoped allocation with size 22.84M and limit 22.78M exceeded scoped
    vmem limit by 60.0K. It should not be possible to run out of scoped
    vmem - please file a bug against XLA.

i.e. the embed_events token-id gather's fusion lands 60 KB over whatever
scoped budget remains next to the kernels' reservations at exactly 512
gather rows (64 slots x 8 tokens).  The ``step`` component now compiles
with the same ``decode_step_compiler_options()`` raise the real batcher
program uses, to test whether the production configuration clears it.

Run the program's pieces one at a time at 64 slots to
find the smallest failing program:

    python tools/repro_64slot_crash.py --component token   # token-row kernel
    python tools/repro_64slot_crash.py --component paged   # streaming paged
    python tools/repro_64slot_crash.py --component event   # split event step
    python tools/repro_64slot_crash.py --component step    # scan body, chunk=1
    python tools/repro_64slot_crash.py                     # full batcher step
    python tools/repro_64slot_crash.py --slots 96          # control: expect ok

RESOLVED 2026-08-19: the full 64-slot batcher (which always compiles with
``decode_step_compiler_options()``) printed "ok" on the live v5e — the
construction fence in serve/batcher.py is deleted.  This script stays as
the regression probe: if ``--component step`` or the full run ever fails
again, re-fence and start from the verbatim error above.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PS = 64
PPS = 16  # 1024-event capacity, matching the full-batcher repro


def _setup(slots):
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.ops.paged_allheads import alloc_pools

    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    net = config.net
    pools = alloc_pools(net.kv_heads, net.num_layers * slots * PPS, PS,
                        net.head_dim, jnp.bfloat16)
    return config, params, net, pools


def run_component(component, slots):
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.models import llama
    from midi_model_tpu.sampling import build_mask_table
    from midi_model_tpu.sampling.generate import _mask_arrays

    config, params, net, pools = _setup(slots)
    b = slots
    hidden = jnp.zeros((b, config.n_embd), jnp.bfloat16)
    index = jnp.full((b,), 100, jnp.int32)
    print(f"compiling component={component} at {slots} slots ...", flush=True)

    if component == "token":
        from midi_model_tpu.ops import token_loop

        masks = _mask_arrays(build_mask_table(config.tokenizer,
                                              disable_eos=True))

        def f(params, hidden):
            return token_loop.decode_token_row(
                params, config, hidden, masks, 1.0, 0.98, 20,
                jax.random.PRNGKey(0))

        row, _ = jax.jit(f)(params, hidden)
        print("ok", int(row.sum()), flush=True)
    elif component == "paged":
        from midi_model_tpu.ops.paged_allheads import paged_attention_stats

        q = jnp.zeros((b, net.num_heads, net.head_dim), jnp.bfloat16)
        w = net.kv_heads * net.head_dim
        write = (jnp.zeros((b, w), jnp.bfloat16),
                 jnp.zeros((b, w), jnp.bfloat16), None,
                 index // PS, index % PS)

        def f(q, pools):
            return paged_attention_stats(
                q, pools, index, jnp.arange(b, dtype=jnp.int32) * PPS,
                write, page_size=PS, pages_per_slot=PPS,
                kv_heads=net.kv_heads, head_dim=net.head_dim,
                streaming=True)

        o = jax.jit(f)(q, pools)[0]
        print("ok", float(o.astype(jnp.float32).sum()), flush=True)
    elif component == "event":
        def f(params, hidden, pools):
            return llama.decode_paged(
                params["net"], net, hidden, pools, index,
                jnp.ones((b,), bool), page_size=PS, pages_per_slot=PPS)

        h, _ = jax.jit(f)(params, hidden, pools)
        print("ok", float(h.astype(jnp.float32).sum()), flush=True)
    elif component == "step":
        from midi_model_tpu.serve import batcher as bt
        from midi_model_tpu.utils.xla_opts import decode_step_compiler_options
        import functools

        masks = _mask_arrays(build_mask_table(config.tokenizer,
                                              disable_eos=True))
        seed = jnp.zeros((b,), jnp.uint32)
        carry = (pools, index, hidden)
        f = functools.partial(bt._step_impl, chunk=1, page_size=PS,
                              pages_per_slot=PPS, token_kernel_ok=True)
        carry, rows = jax.jit(
            f, donate_argnums=(2,), static_argnames=("config", "greedy"),
            compiler_options=decode_step_compiler_options(),
        )(params, config, carry, masks, jnp.ones((b,), bool),
          1.0, 0.98, 20, seed, greedy=False)
        print("ok", int(rows.sum()), flush=True)
    else:
        raise SystemExit(f"unknown component {component}")


def run_full(slots):
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.serve.batcher import ContinuousBatcher

    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(params, config, n_slots=slots, max_seq=1024,
                                chunk=4, disable_eos=True)
    bos = [[config.tokenizer.bos_id] + [config.tokenizer.pad_id] * 7]
    for _ in range(slots):
        batcher.submit(bos, max_events=4)
    print(f"compiling/stepping the {slots}-slot program ...", flush=True)
    batcher.step()  # <- at 64 slots the remote compiler crashes here
    print("ok", flush=True)


def main():
    slots, component = 64, None
    for i, a in enumerate(sys.argv):
        if a == "--slots":
            slots = int(sys.argv[i + 1])
        elif a == "--component":
            component = sys.argv[i + 1]
    if component:
        run_component(component, slots)
    else:
        run_full(slots)


if __name__ == "__main__":
    main()
