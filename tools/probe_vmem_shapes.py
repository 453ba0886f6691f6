"""Bisect WHICH program shapes make the two decode kernels' scoped-VMEM
limits SUM in XLA's accounting.

Known facts (round 3): the aligned tv2o-medium ``decode_events`` program
co-compiles the fused whole-step event-net kernel (~80 MB explicit limit)
with the token-row kernel (112 MB explicit limit) — 192 MB of limits in a
128 MB VMEM — so their live ranges are normally DISJOINT.  But (a) the
medium batcher program and (b) the 24-layer tv2o-large program reject with
the limits summed.  This probe compiles minimal loop bodies that differ in
ONE axis at a time and records the verbatim compiler error:

  axes: layer count (12 vs 24) x loop construct (scan vs while) x
        donation x alive-masking (batcher extras)

Run: python tools/probe_vmem_shapes.py [stage ...]   (REAL TPU)
Stages: med24 / med12 / while12 / while24 / batcher / all
Full error text is written to /tmp/probe_vmem_<stage>.err.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import fused_step as fs
from midi_model_tpu.ops import token_loop
from midi_model_tpu.ops.paged_allheads import alloc_pools
from midi_model_tpu.sampling.generate import _mask_arrays
from midi_model_tpu.sampling import build_mask_table

B = 32
PS = 64
CHUNK = 4


def report(tag, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[{tag}] OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        Path(f"/tmp/probe_vmem_{tag}.err").write_text(msg)
        picked = [ln for ln in msg.splitlines()
                  if any(s in ln.lower() for s in
                         ("vmem", "scoped", "exceed", "bug", "alloc"))]
        print(f"[{tag}] FAIL ({time.time() - t0:.0f}s):", flush=True)
        for ln in picked[:8] or msg.splitlines()[:8]:
            print(f"    {ln.strip()[:240]}", flush=True)
        print(f"    (full text: /tmp/probe_vmem_{tag}.err)", flush=True)
        return False


def build(name):
    config = MIDIModelConfig.from_name(name)
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    net = config.net
    pps = 12
    pools = alloc_pools(net.kv_heads, net.num_layers * B * pps, PS,
                        net.head_dim, jnp.bfloat16)
    fused = fs.prepare_fused(params["net"])
    masks = _mask_arrays(build_mask_table(config.tokenizer,
                                          disable_eos=True))
    return config, params, net, pools, fused, masks, pps


def loop_program(name, *, use_while: bool, donate: bool, tag: str):
    """Aligned-shaped body: token-row kernel -> embed -> fused step.

    Weights are jit ARGUMENTS — closed-over weights become HLO constants
    and blow the tunnel's remote-compile request limit (HTTP 413)."""
    config, params, net, pools, fused, masks, pps = build(name)
    dtype = jnp.bfloat16
    hidden0 = jnp.zeros((B, config.n_embd), dtype)
    key = jax.random.PRNGKey(0)

    def body_step(params, fused, pools, hidden, cur):
        row, _ended = token_loop.decode_token_row(
            params, config, hidden, masks, 1.0, 0.98, 20,
            jax.random.fold_in(key, cur))
        emb = midinet.embed_events(params, row[:, None, :])[:, 0]
        index = jnp.broadcast_to(cur, (B,))
        h, pools = fs.fused_decode_step(
            fused, net, emb.astype(dtype), pools, index,
            page_size=PS, pages_per_slot=pps, uniform_append=True)
        return pools, h, cur + 1

    if use_while:
        def prog(params, fused, pools, hidden):
            def cond(c):
                return c[2] < CHUNK
            def wbody(c):
                return body_step(params, fused, *c)
            pools, hidden, _ = jax.lax.while_loop(
                cond, wbody, (pools, hidden, jnp.zeros((), jnp.int32)))
            return pools, hidden
    else:
        def prog(params, fused, pools, hidden):
            def sbody(c, _):
                return body_step(params, fused, *c), None
            (pools, hidden, _), _ = jax.lax.scan(
                sbody, (pools, hidden, jnp.zeros((), jnp.int32)), None,
                length=CHUNK)
            return pools, hidden

    jitted = jax.jit(prog, donate_argnums=(2,) if donate else ())

    def go():
        jitted.lower(params, fused, pools, hidden0).compile()

    report(tag, go)


def batcher_program(tag, name="tv2o-medium", *, chunk=CHUNK,
                    array_knobs=False, scoped_kib=None):
    """The real batcher step with BOTH kernels forced on.

    ``array_knobs`` passes per-request temp/top_p/top_k as [B] arrays (the
    real batcher always does); ``scoped_kib`` raises the program's
    --xla_tpu_scoped_vmem_limit_kib via per-compile compiler options."""
    from midi_model_tpu.serve import batcher as bt

    config, params, net, pools, fused, masks, pps = build(name)
    hidden0 = jnp.zeros((B, config.n_embd), jnp.bfloat16)
    index0 = jnp.zeros((B,), jnp.int32)
    active = jnp.ones((B,), bool)
    seed = jnp.zeros((B,), jnp.uint32)
    if array_knobs:
        temp, top_p, top_k = (jnp.full((B,), 1.0, jnp.float32),
                              jnp.full((B,), 0.98, jnp.float32),
                              jnp.full((B,), 20, jnp.int32))
    else:
        temp, top_p, top_k = 1.0, 0.98, 20
    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(scoped_kib)}
            if scoped_kib else None)

    def go():
        jax.jit(
            functools.partial(bt._step_impl, chunk=chunk,
                              page_size=PS, pages_per_slot=pps,
                              token_kernel_ok=True),
            donate_argnums=(2,),
            static_argnames=("config", "greedy"),
        ).lower(params, config, (pools, index0, hidden0), masks, active,
                temp, top_p, top_k, seed, greedy=False,
                fused=fused).compile(compiler_options=opts)

    report(tag, go)


def main():
    stages = sys.argv[1:] or ["med12", "med24", "batcher"]
    for s in stages:
        jax.clear_caches()
        if s == "med12":
            loop_program("tv2o-medium", use_while=True, donate=True,
                         tag="med12-while-donate")
        elif s == "med24":
            loop_program("tv2o-large", use_while=True, donate=True,
                         tag="large24-while-donate")
        elif s == "scan12":
            loop_program("tv2o-medium", use_while=False, donate=True,
                         tag="med12-scan-donate")
        elif s == "scan24":
            loop_program("tv2o-large", use_while=False, donate=True,
                         tag="large24-scan-donate")
        elif s == "nodonate24":
            loop_program("tv2o-large", use_while=True, donate=False,
                         tag="large24-while-nodonate")
        elif s == "batcher":
            batcher_program("batcher-med-both-kernels")
        elif s == "batcher-c32":
            batcher_program("batcher-c32-scalar", chunk=32)
        elif s == "batcher-knobs":
            batcher_program("batcher-c4-arrayknobs", array_knobs=True)
        elif s == "batcher-real":
            batcher_program("batcher-c32-arrayknobs", chunk=32,
                            array_knobs=True)
        elif s == "batcher-real-flag":
            batcher_program("batcher-c32-arrayknobs-48M", chunk=32,
                            array_knobs=True, scoped_kib=49152)
        elif s == "batcher-large":
            batcher_program("batcher-large-both-kernels", "tv2o-large")
        else:
            print(f"unknown stage {s}")


if __name__ == "__main__":
    main()
