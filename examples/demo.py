"""End-to-end demo (the reference demo.ipynb equivalent, scriptable).

    python examples/demo.py [--ckpt model.safetensors] [--config tv2o-medium]
                            [--events 256] [--batch 2] [--out outputs/]

Without a checkpoint it runs a randomly initialized model — useful for
smoke-testing the pipeline; with a reference checkpoint
(e.g. skytnt/midi-model-tv2o-medium's model.safetensors) it produces music.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--config", default="tv2o-medium")
    ap.add_argument("--events", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--prompt-midi", default="", help="optional .mid prompt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from midi_model_tpu.midi import midi2score, score2midi
    from midi_model_tpu.models import MIDIModelConfig, midinet
    from midi_model_tpu.sampling import generate

    if os.path.exists(args.config):
        config = MIDIModelConfig.from_json_file(args.config)
    else:
        config = MIDIModelConfig.from_name(args.config)
    tokenizer = config.tokenizer
    if args.ckpt:
        from midi_model_tpu.interop import load_state_dict, params_from_state_dict

        params = params_from_state_dict(load_state_dict(args.ckpt), config)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        print(f"loaded {args.ckpt}")
    else:
        params = midinet.init_params(jax.random.PRNGKey(0), config,
                                     dtype=jnp.bfloat16)
        print("random weights (no --ckpt): output will be noise, but the "
              "pipeline is exercised end to end")

    prompt = None
    if args.prompt_midi:
        with open(args.prompt_midi, "rb") as f:
            seq = tokenizer.tokenize(midi2score(f.read()))
        prompt = np.asarray(seq[:256], dtype=np.int64)
        print(f"prompt: {len(seq)} events from {args.prompt_midi}")

    rows = generate(params, config, prompt=prompt, batch_size=args.batch,
                    max_len=args.events, temp=1.0, top_p=0.94, top_k=20,
                    seed=args.seed)
    print(f"generated {rows.shape[1]} events x {rows.shape[0]} samples")

    os.makedirs(args.out, exist_ok=True)
    for i, seq in enumerate(rows):
        score = tokenizer.detokenize([list(r) for r in seq])
        path = os.path.join(args.out, f"demo_{i}.mid")
        with open(path, "wb") as f:
            f.write(score2midi(score))
        n_notes = sum(1 for tr in score[1:] for e in tr if e[0] == "note")
        print(f"  {path}: {n_notes} notes")


if __name__ == "__main__":
    main()
