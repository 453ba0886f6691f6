"""Generate golden parity fixtures by running the reference implementation.

Run once (offline, during development):

    python tools/make_goldens.py

It synthesizes a corpus of MIDI byte-streams covering the tricky codec paths
(running status, velocity-0 note-offs, overlapping notes, unterminated notes,
meta events, sysex, multi-track tempo maps), then records the REFERENCE
implementation's outputs (midi2opus / midi2score / tokenize / detokenize /
check_quality / event2tokens round-trips) into pickled fixtures under
tests/golden/.  The test-suite compares OUR implementation against these
fixtures without ever importing the reference.
"""

import pickle
import random
import sys
from pathlib import Path

REFERENCE = "/root/reference"
OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"

sys.path.insert(0, REFERENCE)

import MIDI  # noqa: E402  (reference)
from midi_tokenizer import MIDITokenizer  # noqa: E402  (reference)


def rand_note_cluster(rng, t, channel, n):
    """A cluster of possibly-overlapping notes starting near tick t."""
    events = []
    for _ in range(n):
        start = t + rng.randint(0, 400)
        dur = rng.randint(1, 960)
        pitch = rng.randint(20, 110)
        vel = rng.randint(1, 127)
        events.append(["note", start, dur, channel, pitch, vel])
    return events


def make_random_score(rng, ntracks=3, length=200, tpq=None):
    tpq = tpq or rng.choice([96, 120, 384, 480, 960])
    score = [tpq]
    for ti in range(ntracks):
        track = []
        channel = rng.choice([0, 1, 2, 9, 10, 15])
        track.append(["track_name", 0, bytes(f"trk{ti}", "ascii")])
        track.append(["patch_change", 0, channel, rng.randint(0, 127)])
        if ti == 0:
            track.append(["set_tempo", 0, rng.randint(200000, 1500000)])
            track.append(["time_signature", 0, rng.choice([2, 3, 4, 6]),
                          rng.choice([1, 2, 3]), 24, 8])
            track.append(["key_signature", 0, rng.randint(-7, 7), rng.randint(0, 1)])
        t = 0
        for _ in range(length):
            t += rng.randint(0, 300)
            kind = rng.random()
            if kind < 0.75:
                track.extend(rand_note_cluster(rng, t, channel, rng.randint(1, 3)))
            elif kind < 0.85:
                track.append(["control_change", t, channel, rng.choice([1, 7, 10, 11, 64]),
                              rng.randint(0, 127)])
            elif kind < 0.92:
                track.append(["set_tempo", t, rng.randint(200000, 1500000)])
            elif kind < 0.96:
                track.append(["patch_change", t, channel, rng.randint(0, 127)])
            else:
                track.append(["pitch_wheel_change", t, channel, rng.randint(-8192, 8191)])
        score.append(track)
    return score


def make_handcrafted_bytes():
    """Byte streams exercising decoder edge cases, built via the reference encoder."""
    cases = {}

    # Velocity-0 note-on used as note-off + running status (encoder emits it).
    opus = [480, [
        ["patch_change", 0, 0, 5],
        ["note_on", 0, 0, 60, 100],
        ["note_on", 10, 0, 64, 100],
        ["note_on", 120, 0, 60, 0],      # vel-0 off
        ["note_off", 50, 0, 64, 64],
        ["text_event", 5, b"hello"],
        ["lyric", 0, b"la"],
        ["sysex_f0", 0, b"\x7e\x7f\x09\x01\xf7"],
        ["control_change", 3, 0, 7, 99],
        ["end_track", 77],
    ]]
    cases["edge_vel0_running"] = MIDI.opus2midi(opus)

    # Unterminated notes + overlapping same-pitch notes (FIFO matching).
    opus = [96, [
        ["note_on", 0, 1, 70, 90],
        ["note_on", 5, 1, 70, 91],       # second note same pitch
        ["note_off", 5, 1, 70, 0],       # closes the FIRST one
        ["note_on", 20, 1, 72, 80],      # never closed
    ]]
    cases["edge_fifo_unterminated"] = MIDI.opus2midi(opus)

    # Multi-track with meta events everywhere + smpte + sequence number.
    opus = [384,
            [["set_sequence_number", 0, 7], ["smpte_offset", 0, 1, 2, 3, 4, 5],
             ["set_tempo", 0, 600000], ["time_signature", 0, 3, 2, 24, 8],
             ["key_signature", 0, -3, 1], ["marker", 10, b"m1"],
             ["sequencer_specific", 0, b"\x00\x01"], ["song_position", 0, 1000],
             ["song_select", 0, 12], ["tune_request", 4]],
            [["note_on", 0, 9, 35, 120], ["note_off", 48, 9, 35, 0],
             ["channel_after_touch", 0, 9, 55], ["key_after_touch", 2, 9, 35, 66],
             ["note_on", 0, 9, 42, 100], ["note_on", 24, 9, 42, 0]]]
    cases["edge_meta_all"] = MIDI.opus2midi(opus)

    # Empty track + raw meta.
    opus = [1000, [], [["raw_meta_event", 0, 0x60, b"\x01\x02"], ["note_on", 1, 3, 50, 50],
                       ["note_off", 100, 3, 50, 0]]]
    cases["edge_empty_and_rawmeta"] = MIDI.opus2midi(opus)

    # Truncated / garbage inputs (decoder robustness parity).
    good = cases["edge_vel0_running"]
    cases["bad_truncated"] = good[: len(good) - 7]
    cases["bad_not_midi"] = b"RIFFxxxxWAVE" + b"\x00" * 32
    cases["bad_short"] = b"MT"
    return cases


def make_tonal_score(rng, key_sig=None, drum_only=False, n=300):
    """Strongly tonal content exercising key-signature detect/repair paths."""
    tpq = 480
    c_major = [60, 62, 64, 65, 67, 69, 71, 72]
    score = [tpq]
    track = [["set_tempo", 0, 500000]]
    if key_sig is not None:
        track.append(["key_signature", 0, key_sig[0], key_sig[1]])
    t = 0
    channel = 9 if drum_only else 0
    for i in range(n):
        t += rng.choice([120, 240, 480])
        pitch = (rng.choice([35, 38, 42]) if drum_only
                 else rng.choice(c_major) + 12 * rng.randint(-1, 1))
        track.append(["note", t, rng.choice([120, 240]), channel, pitch,
                      rng.randint(60, 120)])
    score.append(track)
    if drum_only:
        # second melodic track so remap keeps multiple channels
        tr2 = [["patch_change", 0, 3, 48]]
        t = 0
        for _ in range(40):
            t += 240
            tr2.append(["note", t, 240, 3, rng.choice(c_major), 90])
        score.append(tr2)
    return score


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    rng = random.Random(0xC0FFEE)

    corpus = {}
    # Random scores of varying shape -> bytes via the reference encoder.
    for i in range(14):
        ntracks = rng.randint(1, 6)
        length = rng.choice([30, 80, 200, 400])
        score = make_random_score(rng, ntracks=ntracks, length=length)
        corpus[f"rand_{i:02d}"] = MIDI.score2midi(score)
    corpus.update(make_handcrafted_bytes())
    # Targeted key-signature paths (detect / repair-default / drum forcing).
    corpus["tonal_no_keysig"] = MIDI.score2midi(make_tonal_score(rng))
    corpus["tonal_default_keysig"] = MIDI.score2midi(
        make_tonal_score(rng, key_sig=(0, 0)))
    corpus["tonal_real_keysig"] = MIDI.score2midi(
        make_tonal_score(rng, key_sig=(3, 1)))
    corpus["drums_with_keysig"] = MIDI.score2midi(
        make_tonal_score(rng, key_sig=(0, 0), drum_only=True))

    codec_goldens = {}
    for name, data in corpus.items():
        codec_goldens[name] = {
            "bytes": data,
            "opus": MIDI.midi2opus(data),
            "score": MIDI.midi2score(data),
            "ms_score": None,
            "score2midi": None,
            "stats": None,
        }
        try:
            codec_goldens[name]["ms_score"] = MIDI.midi2ms_score(data)
        except Exception:
            pass
        score = codec_goldens[name]["score"]
        # Re-encode the decoded score (canonicalized round trip).
        codec_goldens[name]["score2midi"] = MIDI.score2midi(score)
        stats = MIDI.score2stats(score)
        stats = dict(stats)
        codec_goldens[name]["stats"] = stats

    with open(OUT_DIR / "codec.pkl", "wb") as f:
        pickle.dump(codec_goldens, f)

    # Tokenizer goldens: tokenize each decoded score under all 4 configs.
    tok_goldens = {}
    for version in ("v1", "v2"):
        for optimise in (False, True):
            tok = MIDITokenizer(version)
            tok.set_optimise_midi(optimise)
            key = f"{version}_{'opt' if optimise else 'raw'}"
            per_file = {}
            for name, g in codec_goldens.items():
                if name.startswith("bad_"):
                    continue
                try:
                    seq = tok.tokenize(g["score"])
                except Exception as e:  # record exceptions as strings for parity
                    per_file[name] = {"error": repr(e)}
                    continue
                detok = tok.detokenize(seq)
                quality = tok.check_quality(seq)
                per_file[name] = {
                    "tokens": seq,
                    "detok": detok,
                    "detok_midi": MIDI.score2midi(detok),
                    "quality": quality,
                }
                # Second-pass stability: tokenize(detokenize(tokens))
                per_file[name]["tokens2"] = tok.tokenize(detok)
            tok_goldens[key] = {
                "vocab_size": tok.vocab_size,
                "max_token_seq": tok.max_token_seq,
                "events": tok.events,
                "event_parameters": tok.event_parameters,
                "event_ids": tok.event_ids,
                "parameter_ids": tok.parameter_ids,
                "to_dict": tok.to_dict(),
                "files": per_file,
            }

    # Augment determinism goldens: seed python RNG, augment, record.
    tok = MIDITokenizer("v2")
    aug_goldens = {}
    for name, g in codec_goldens.items():
        if name.startswith("bad_"):
            continue
        try:
            seq = tok.tokenize(g["score"])
        except Exception:
            continue
        random.seed(1234)
        aug_goldens[name] = tok.augment(seq)
    tok_goldens["v2_augment_seed1234"] = aug_goldens

    with open(OUT_DIR / "tokenizer.pkl", "wb") as f:
        pickle.dump(tok_goldens, f)

    total = sum(len(v["bytes"]) for v in codec_goldens.values())
    # midi2img geometry golden: colors are np.random (unseeded) in the
    # reference, so the stable invariant is WHICH pixels are painted and the
    # image size, captured per tokenizer version.
    img_goldens = {}
    for ver in ("v1", "v2"):
        tok = MIDITokenizer(ver)
        score = MIDI.midi2score(corpus["rand_03"])
        seq = tok.tokenize(score)
        deco = tok.detokenize(seq)
        img = tok.midi2img(deco)
        import numpy as _np
        arr = _np.asarray(img)
        img_goldens[ver] = {
            "size": img.size,
            "mask": (arr.sum(axis=-1) > 0),
        }
    with open(OUT_DIR / "midi2img.pkl", "wb") as f:
        pickle.dump(img_goldens, f)

    print(f"wrote {len(codec_goldens)} codec goldens ({total} bytes of midi), "
          f"{len(tok_goldens)} tokenizer configs -> {OUT_DIR}")


def make_checkpoint_golden(ckpt: str):
    """Capture pretrained-checkpoint goldens (north-star parity).

    Requires hub access or a local checkpoint path — this container has zero
    egress, so this mode is documented-blocked until run elsewhere
    (BASELINE.md).  Writes tests/golden/checkpoint_parity.pkl with the fp32
    state dict, fp32 logits on a fixed prompt, and a 64-event greedy decode
    captured from the reference implementation (midi_model.py:167-250).
    """
    import numpy as np
    import torch
    from midi_model import MIDIModel, MIDIModelConfig  # reference

    config = MIDIModelConfig.from_name("tv2o-medium")
    model = MIDIModel(config)
    if ckpt.endswith(".safetensors") or "/" not in ckpt or Path(ckpt).exists():
        try:
            from safetensors.torch import load_file

            model.load_state_dict(load_file(ckpt), strict=False)
        except Exception:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(ckpt, "model.safetensors")
            from safetensors.torch import load_file

            model.load_state_dict(load_file(path), strict=False)
    model = model.float().eval()

    tokenizer = model.tokenizer
    prompt = np.full((1, 1, tokenizer.max_token_seq), tokenizer.pad_id,
                     dtype=np.int64)
    prompt[0, 0, 0] = tokenizer.bos_id
    with torch.no_grad():
        hidden = model.forward(torch.from_numpy(prompt))
        logits = model.forward_token(hidden[:, -1:].squeeze(1))
        decode = model.generate(prompt[0], batch_size=1, max_len=64,
                                temp=1.0, top_p=1.0, top_k=1)  # greedy
    golden = {
        "config": "tv2o-medium",
        "state_dict": {k: v.float().numpy() for k, v in
                       model.state_dict().items()},
        "prompt": prompt,
        "logits": logits.numpy(),
        "greedy_64": np.asarray(decode),
    }
    out = OUT_DIR / "checkpoint_parity.pkl"
    with open(out, "wb") as f:
        pickle.dump(golden, f)
    print(f"wrote {out}")


def make_reference_oracle_golden(seed: int = 20260817, max_len: int = 48,
                                 batch: int = 2):
    """Capture the GENUINE reference model's greedy generation as a golden.

    The pretrained-checkpoint north star is blocked by zero egress
    (BASELINE.md), and asserting parity against a hand-written replica risks
    the replica sharing a misreading with the implementation under test.
    This oracle runs the reference's OWN ``MIDIModel.generate``
    (/root/reference/midi_model.py:99-250) at the real tv2o-medium scale with
    deterministic synthetic weights and records its outputs.

    The golden stores only the state-dict LAYOUT (names + shapes) and the
    seed — both sides synthesize identical weights via
    ``interop.synthesize_state_dict`` — plus fp32 logits on a fixed prompt
    and the greedy (top_k=1) decode.  tests/test_generate.py asserts our
    fused decode matches token-for-token.
    """
    import numpy as np
    import torch
    from midi_model import MIDIModel, MIDIModelConfig  # reference

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from midi_model_tpu.interop import synthesize_state_dict

    config = MIDIModelConfig.from_name("tv2o-medium")
    model = MIDIModel(config).float().eval()
    layout = [(k, tuple(v.shape)) for k, v in model.state_dict().items()]
    sd = synthesize_state_dict(layout, seed)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    tokenizer = model.tokenizer
    prompt = np.full((1, 1, tokenizer.max_token_seq), tokenizer.pad_id,
                     dtype=np.int64)
    prompt[0, 0, 0] = tokenizer.bos_id
    with torch.no_grad():
        hidden = model.forward(torch.from_numpy(prompt))
        logits = model.forward_token(hidden[:, -1])
        # top_k=1 keeps only the argmax -> deterministic greedy decode
        decode = model.generate(prompt[0], batch_size=batch, max_len=max_len,
                                temp=1.0, top_p=1.0, top_k=1)
    golden = {
        "config": "tv2o-medium",
        "seed": seed,
        "layout": layout,
        "prompt": prompt,
        "logits": np.asarray(logits),
        "greedy": np.asarray(decode),
    }
    out = OUT_DIR / "reference_oracle.pkl"
    with open(out, "wb") as f:
        pickle.dump(golden, f)
    print(f"wrote {out} (greedy decode shape {golden['greedy'].shape})")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="",
                    help="hub repo id or local .safetensors of the pretrained "
                         "model; captures north-star parity goldens")
    ap.add_argument("--reference-oracle", action="store_true",
                    help="capture the genuine-reference generation oracle "
                         "(tv2o-medium, seeded synthetic weights; no hub "
                         "access needed)")
    args = ap.parse_args()
    if args.checkpoint:
        make_checkpoint_golden(args.checkpoint)
    elif args.reference_oracle:
        make_reference_oracle_golden()
    else:
        main()
