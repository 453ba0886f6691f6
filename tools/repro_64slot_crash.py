"""Minimal repro: the remote TPU compiler crashes on exactly-64-slot programs.

Observed (round 2, this container's axon-tunneled v5e): compiling the
continuous batcher's ``_step`` program with ``n_slots=64`` crashes the remote
compiler service (the call never returns / the backend dies); the identical
program at 32, 96 or 128 slots compiles and runs.  ``ContinuousBatcher``
fences n_slots=64 at construction and points here.

Run me on the TPU to (re)confirm:

    python tools/repro_64slot_crash.py            # 64 slots: expect a crash
    python tools/repro_64slot_crash.py --slots 96 # control: expect ok

If this script ever prints "ok" at 64 slots, the toolchain fixed it — delete
the fence in serve/batcher.py (and this script).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["MIDI_TPU_ALLOW_64_SLOTS"] = "1"


def main():
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.serve.batcher import ContinuousBatcher

    slots = 64
    for i, a in enumerate(sys.argv):
        if a == "--slots":
            slots = int(sys.argv[i + 1])

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


if __name__ == "__main__":
    main()
