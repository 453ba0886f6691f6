"""Serving: streaming generation service, gradio UI, audio rendering."""

from .app import (
    DRUM_KITS,
    GenerationRequest,
    KEY_SIGNATURES,
    MidiGenerationService,
    create_msg,
    send_msgs,
)
from .synth import MidiSynthesizer, load_synthesizer

__all__ = [
    "DRUM_KITS",
    "GenerationRequest",
    "KEY_SIGNATURES",
    "MidiGenerationService",
    "MidiSynthesizer",
    "create_msg",
    "load_synthesizer",
    "send_msgs",
]
