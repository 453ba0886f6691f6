"""Build the native extensions in-place with g++.

    python -m midi_model_tpu.native.build
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).resolve().parent


def build(verbose: bool = True) -> Path:
    include = sysconfig.get_paths()["include"]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = HERE / f"_midicodec{suffix}"
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}",
        str(HERE / "midicodec.cpp"),
        "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    # smoke test
    sys.path.insert(0, str(HERE.parent.parent))
    import importlib

    mod = importlib.import_module("midi_model_tpu.native._midicodec")
    assert mod.midi2opus(b"") == [1000, []]
    print(f"built + smoke-tested {path.name}")
