"""BASELINE config 2: preprocessing throughput (bytes -> tokens -> quality).

Compares the reference pipeline (reference MIDI.py + midi_tokenizer.py) with
ours (native C++ decoder + our tokenizer) over the golden corpus, single
process.  Run on CPU: JAX not involved.
"""

import pickle
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_REPEAT = 30


def bench(label, fn, blobs):
    fn(blobs[0])  # warm
    t0 = time.perf_counter()
    n_bytes = 0
    for _ in range(N_REPEAT):
        for b in blobs:
            fn(b)
            n_bytes += len(b)
    dt = time.perf_counter() - t0
    per_file = dt / (N_REPEAT * len(blobs)) * 1000
    mbps = n_bytes / dt / 1e6
    print(f"{label}: {per_file:.2f} ms/file, {mbps:.1f} MB/s")
    return per_file


def main():
    with open(REPO / "tests" / "golden" / "codec.pkl", "rb") as f:
        goldens = pickle.load(f)
    blobs = [g["bytes"] for k, g in goldens.items() if not k.startswith("bad_")]
    print(f"{len(blobs)} files, {sum(map(len, blobs))/1e3:.0f} kB total")

    # ours
    from midi_model_tpu.midi import midi2score
    from midi_model_tpu.tokenizer import MIDITokenizer

    tok = MIDITokenizer("v2")
    tok.set_optimise_midi(True)

    def ours(b):
        seq = tok.tokenize(midi2score(b))
        tok.check_quality(seq)

    t_ours = bench("ours (native codec + tokenizer)", ours, blobs)

    # reference
    sys.path.insert(0, "/root/reference")
    import MIDI as ref_midi  # noqa
    from midi_tokenizer import MIDITokenizer as RefTok  # noqa

    rtok = RefTok("v2")
    rtok.set_optimise_midi(True)

    def ref(b):
        seq = rtok.tokenize(ref_midi.midi2score(b))
        rtok.check_quality(seq)

    t_ref = bench("reference (pure python)", ref, blobs)
    print(f"speedup: {t_ref / t_ours:.2f}x")


if __name__ == "__main__":
    main()
