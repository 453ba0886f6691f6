"""Build the native extensions in-place with g++.

    python -m midi_model_tpu.native.build
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).resolve().parent


MODULES = ("midicodec", "tokenizer_scan")


def build(verbose: bool = True):
    include = sysconfig.get_paths()["include"]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    outs = []
    for name in MODULES:
        out = HERE / f"_{name}{suffix}"
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            f"-I{include}",
            str(HERE / f"{name}.cpp"),
            "-o", str(out),
        ]
        if verbose:
            print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        outs.append(out)
    return outs


if __name__ == "__main__":
    paths = build()
    # smoke test
    sys.path.insert(0, str(HERE.parent.parent))
    import importlib

    mod = importlib.import_module("midi_model_tpu.native._midicodec")
    assert mod.midi2opus(b"") == [1000, []]
    scan = importlib.import_module("midi_model_tpu.native._tokenizer_scan")
    state = scan.scan_tracks([480, [["note", 0, 480, 0, 60, 90]]], 2, 4.0, 4.0)
    assert state["event_list"] == [["note", 0, 0, 0, 0, 60, 90, 16]], state
    print(f"built + smoke-tested {[p.name for p in paths]}")
