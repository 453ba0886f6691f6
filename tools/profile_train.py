"""Component attribution for the train step, measured on the real chip.

Chains N iterations of each component inside one jitted program (data
dependencies threaded) so the axon tunnel's per-dispatch overhead can't
pollute the split. Reports device ms per iteration and the implied MFU of
each stage against its own matmul FLOPs.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.train import init_train_state, make_optimizer, make_train_step
from midi_model_tpu.train.trainer import loss_fn

SEQ = 2048
N = 4
_FLOOR = [0.0]


def _measure_floor():
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
    print(f"tunnel floor: {best*1e3:.1f} ms — subtracted")


def timeit(fn, *args, label=""):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    dev = (best - _FLOOR[0]) / N * 1000
    print(f"{label}: {dev:.1f} ms/iter")
    return dev


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "tv2o-medium"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    config = MIDIModelConfig.from_name(name)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        3, config.tokenizer.vocab_size, (bs, SEQ, 8)), jnp.int32)
    _measure_floor()

    # 1. full train step (fwd+bwd+optimizer) — its state is DONATED, so it
    # gets its own params copy (the probes below keep the original)
    opt = make_optimizer()
    step = make_train_step(config, opt, accum_steps=1)
    state = init_train_state(
        midinet.init_params(jax.random.PRNGKey(0), config), opt)

    # full step: python loop of the jitted step (N dispatches; floor*N off)
    state, m = step(state, batch[None])
    float(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            state, m = step(state, batch[None])
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    full = (best - N * _FLOOR[0]) / N * 1000
    print(f"full train step: {full:.1f} ms/iter")

    def vary(batch, i):
        # defeat loop-invariant hoisting: the body must really re-run N times
        return batch.at[0, 0, 0].set(3 + jax.lax.rem(i, 3))

    # 2. forward loss only (chained)
    @jax.jit
    def fwd_only(params, batch):
        def body(i, acc):
            loss, _ = loss_fn(params, config, vary(batch, i))
            return acc + loss
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))

    fwd = timeit(fwd_only, params, batch, label="forward loss")

    # 3. value_and_grad only (no optimizer); EVERY grad leaf is consumed —
    # summing just one leaf lets XLA dead-code-eliminate most of backward
    @jax.jit
    def grad_only(params, batch):
        def body(i, acc):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, config, vary(batch, i))
            gsum = sum(g.astype(jnp.float32).sum()
                       for g in jax.tree.leaves(grads))
            return acc + loss + gsum * 1e-12
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))

    fb = timeit(grad_only, params, batch, label="forward+backward")

    # 3b. optimizer update alone (varied grads defeat hoisting)
    opt_state0 = opt.init(params)

    @jax.jit
    def opt_only(params, opt_state, batch):
        def body(i, carry):
            p, s = carry
            grads = jax.tree.map(
                lambda x: x * (1e-9 * (i + 1).astype(jnp.float32)), p)
            updates, s = opt.update(grads, s, p)
            import optax
            p = optax.apply_updates(p, updates)
            return (p, s)
        p, _ = jax.lax.fori_loop(0, N, body, (params, opt_state))
        return p["lm_head"].astype(jnp.float32).sum()

    timeit(opt_only, params, opt_state0, batch, label="optimizer update")

    # 4. event-net forward only (embed + 12/24-layer stack)
    @jax.jit
    def event_only(params, batch):
        def body(i, acc):
            cparams = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
            cparams["net"] = dict(cparams["net"], embed=params["net"]["embed"])
            hidden, _ = midinet.forward(cparams, config, vary(batch, i)[:, :-1])
            return acc + hidden.astype(jnp.float32).sum() * 1e-9
        return jax.lax.fori_loop(0, N, body, jnp.zeros(()))

    ev = timeit(event_only, params, batch, label="event-net fwd")

    print(f"-> token-net+CE fwd ~= {fwd - ev:.1f} ms; backward+opt ~= "
          f"{full - fwd:.1f} ms (bwd {fb - fwd:.1f} + opt {full - fb:.1f})")


if __name__ == "__main__":
    main()
