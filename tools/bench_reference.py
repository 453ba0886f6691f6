"""Measure the REFERENCE implementation's generation throughput.

Runs the reference's generation loop (/root/reference, torch CPU in this
container — no CUDA available) with random tv2o-medium weights; throughput is
weight-independent.  Results go into BASELINE.md by hand.

    python tools/bench_reference.py [--events 128] [--batch 1]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    from midi_model import MIDIModel, MIDIModelConfig  # reference

    config = MIDIModelConfig.from_name("tv2o-medium")
    torch.manual_seed(0)
    model = MIDIModel(config).eval().float()

    # Random weights emit eos early; zero its probability so the run covers
    # the full event budget (throughput measurement only).
    eos = config.tokenizer.eos_id
    orig_sample = model.sample_top_p_k

    def sample_no_eos(probs, p, k, generator=None):
        probs = probs.clone()
        probs[..., eos] = 0.0
        return orig_sample(probs, p, k, generator=generator)

    model.sample_top_p_k = sample_no_eos

    gen = torch.Generator("cpu").manual_seed(42)
    # warmup a few events
    model.generate(batch_size=args.batch, max_len=9, temp=1.0, top_p=0.98,
                   top_k=20, generator=gen)
    t0 = time.time()
    out = model.generate(batch_size=args.batch, max_len=args.events + 1,
                         temp=1.0, top_p=0.98, top_k=20, generator=gen)
    dt = time.time() - t0
    n_rows = (out.shape[1] - 1) * args.batch
    print(f"reference torch-cpu tv2o-medium: batch={args.batch} "
          f"events={out.shape[1]-1} wall={dt:.1f}s "
          f"events/sec={n_rows/dt:.3f}")


if __name__ == "__main__":
    main()
