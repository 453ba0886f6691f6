"""Decompose the fused whole-step kernel's cost: fixed + per-row + per-block.

Sweeps the (uniform) cache length and the compute-block size (ppcb) and fits
nothing — just prints device ms/iter per point so the marginal cache-row cost
and the per-block overhead can be read off.  Run on the real chip.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import fused_step as fs
from midi_model_tpu.ops.paged_allheads import alloc_pools

B = 32
N = 64
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


def main():
    config = MIDIModelConfig.from_name("tv2o-medium")
    net = config.net
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    fused = fs.prepare_fused(params["net"])
    _measure_floor()

    ps, pps = 64, 20  # capacity 1280 (the bench geometry)
    pools = alloc_pools(net.kv_heads, net.num_layers * B * pps, ps,
                        net.head_dim, jnp.bfloat16)
    emb1 = jnp.zeros((B, config.n_embd), jnp.bfloat16)

    for ppcb in (4, 2):
        for length in (1, 64, 256, 512, 768, 1024):
            index = jnp.full((B,), length, jnp.int32)

            @jax.jit
            def run(fused, emb1, pools, index=index, ppcb=ppcb):
                def body(i, carry):
                    e, pl_ = carry
                    h, pl_ = fs.fused_decode_step(
                        fused, net, e, pl_, index, page_size=ps,
                        pages_per_slot=pps, ppcb=ppcb)
                    return (e + h * 1e-9, pl_)
                e, _ = jax.lax.fori_loop(0, N, body, (emb1, pools))
                return e.astype(jnp.float32).sum()

            float(run(fused, emb1, pools))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(fused, emb1, pools))
                best = min(best, time.perf_counter() - t0)
            dev = best - _FLOOR[0]
            print(f"ppcb={ppcb} len={length:5d}: {dev/N*1000:.3f} ms/iter")


if __name__ == "__main__":
    main()
