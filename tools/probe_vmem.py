"""Probe the scoped-VMEM interplay of the co-compiled decode kernels.

Compiles the full ``decode_events`` program (fused step kernel + token-row
kernel in one while-loop body) under different per-kernel vmem_limit knobs
and reports fit/overflow — the two kernels' explicit limits share one
scoped-VMEM pool, and the accounting is only observable by compiling.

Usage: python tools/probe_vmem.py [variant ...]
Variants: split fused fused_slack8 token104 (default: all)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def try_compile(tag):
    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.sampling import build_mask_table, prefill
    from midi_model_tpu.sampling.generate import (_decode_events_jitted,
                                                  _mask_arrays,
                                                  normalize_prompt)

    config = MIDIModelConfig.from_name("tv2o-medium")
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    prompt = jnp.asarray(normalize_prompt(config.tokenizer, None, 32))
    masks = _mask_arrays(build_mask_table(config.tokenizer, disable_eos=True))
    state = prefill(params, config, prompt, 1 + 1024)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    try:
        _decode_events_jitted().lower(params, config, state, masks, 1024,
                                      1.0, 0.98, 20, key).compile()
        print(f"[{tag}] OK ({time.time() - t0:.0f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        for line in msg.splitlines():
            if "Scoped allocation" in line or "exceeded" in line:
                print(f"[{tag}] FAIL: ...{line[-200:]} ({time.time() - t0:.0f}s)",
                      flush=True)
                break
        else:
            print(f"[{tag}] FAIL: {msg[:300]} ({time.time() - t0:.0f}s)",
                  flush=True)
        return False


def main():
    variants = sys.argv[1:] or ["split", "fused"]
    from midi_model_tpu.ops import fused_step

    for v in variants:
        jax.clear_caches()
        if v == "split":
            fused_step.set_enabled(False)
            try_compile("split (no fused kernel)")
            fused_step.set_enabled(True)
        elif v == "fused":
            try_compile("fused (current limits)")
        elif v.startswith("slack"):
            mb = int(v[len("slack"):])
            fused_step._SLACK_BYTES = mb << 20
            try_compile(f"fused slack={mb}MB")
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
