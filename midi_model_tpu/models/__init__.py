"""Model configurations and the hierarchical MIDI transformer."""

from . import llama, midinet
from .api import MIDIModel
from .config import CONFIG_NAMES, MIDIModelConfig, TransformerConfig, config_name_list
from .llama import KVCache

__all__ = [
    "CONFIG_NAMES",
    "config_name_list",
    "KVCache",
    "llama",
    "midinet",
    "MIDIModel",
    "MIDIModelConfig",
    "TransformerConfig",
]
