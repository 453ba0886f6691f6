"""Native (C++) components, built on demand.

``python -m midi_model_tpu.native.build`` compiles the extensions with g++;
importing this package picks them up if present.  Everything here has a
pure-python fallback — the native path is a host-side throughput optimization
(the training data loader parses thousands of .mid files per minute), never a
requirement.
"""

from __future__ import annotations

import importlib
import os

_midicodec = None
_tokenizer_scan = None
if os.environ.get("MIDI_TPU_NATIVE", "1") != "0":
    try:
        _midicodec = importlib.import_module("midi_model_tpu.native._midicodec")
    except ImportError:
        _midicodec = None
    try:
        _tokenizer_scan = importlib.import_module(
            "midi_model_tpu.native._tokenizer_scan")
    except ImportError:
        _tokenizer_scan = None


def native_codec():
    """The compiled _midicodec module, or None if not built/disabled."""
    return _midicodec


def native_tokenizer_scan():
    """The compiled _tokenizer_scan module, or None if not built/disabled."""
    return _tokenizer_scan
