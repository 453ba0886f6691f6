"""Bisect the tv2o-large decode compile crash (remote compiler HTTP 500).

Compiles the decode path's pieces one at a time on the real chip:
  1. fused whole-step kernel alone (24 layers)
  2. fused token-row kernel alone
  3. the combined decode_events program (what the bench runs)
Run: python tools/repro_large_compile.py [stage]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import fused_step as fs
from midi_model_tpu.ops.paged_allheads import alloc_pools

B = 32


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    config = MIDIModelConfig.from_name("tv2o-large")
    net = config.net
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)

    if stage in ("all", "1", "1b"):
        ps, pps = 64, 12
        pools = alloc_pools(net.kv_heads, net.num_layers * B * pps, ps,
                            net.head_dim, jnp.bfloat16)
        fused = fs.prepare_fused(params["net"])
        emb1 = jnp.zeros((B, config.n_embd), jnp.bfloat16)
        index = jnp.full((B,), 500, jnp.int32)
        exact = stage == "1b"
        h, pools = fs.fused_decode_step(fused, net, emb1, pools, index,
                                        page_size=ps, pages_per_slot=pps,
                                        uniform_append=True,
                                        exact_tail=exact)
        print("fused step (large, exact_tail=%s): %.3f" % (
            exact, float(h.astype(jnp.float32).sum())), flush=True)

    if stage in ("all", "2"):
        from midi_model_tpu.ops import token_loop
        from midi_model_tpu.sampling.generate import _mask_arrays
        from midi_model_tpu.sampling.masks import build_mask_table

        masks = _mask_arrays(build_mask_table(config.tokenizer))
        hidden = jnp.zeros((B, config.n_embd), jnp.bfloat16)
        row, ended = token_loop.decode_token_row(
            params, config, hidden, masks, 1.0, 0.98, 20,
            jax.random.PRNGKey(0))
        print("token row (large):", int(row.sum()), flush=True)

    if stage in ("all", "3", "4", "5"):
        from midi_model_tpu.sampling import build_mask_table, decode_events, prefill
        from midi_model_tpu.sampling.generate import _mask_arrays, normalize_prompt

        # stage 3: tiny shapes; 4: bench shapes (513 capacity, 512 chunk);
        # 5: bench capacity, small chunk
        max_seq, chunk = {"3": (64, 4), "4": (513, 512),
                          "5": (513, 4)}.get(stage, (64, 4))
        prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, B))
        masks = _mask_arrays(build_mask_table(config.tokenizer,
                                              disable_eos=True))
        state = prefill(params, config, prompt, max_seq)
        print("prefill ok", flush=True)
        state, rows, n = decode_events(params, config, state, masks, chunk,
                                       1.0, 0.98, 20, jax.random.PRNGKey(0))
        print("decode_events (large):", int(n), flush=True)


if __name__ == "__main__":
    main()
