"""midi_model_tpu — a TPU-native MIDI event-transformer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SkyTNT/midi-model:

- ``midi``      : Standard MIDI File codec (bytes ⇄ opus ⇄ score) and score utilities.
- ``tokenizer`` : event tokenizers (v1/v2) with augmentation + corpus quality filters.
- ``models``    : Llama-style transformer blocks and the hierarchical MIDI model,
                  written as pure-functional JAX with parameter pytrees.
- ``ops``       : Pallas TPU kernels and low-level fused ops.
- ``sampling``  : fully-jitted autoregressive generation (grammar-masked top-p/top-k).
- ``parallel``  : device mesh / sharding rules (dp/tp) for pjit training + inference.
- ``train``     : data pipeline, optimizer/schedule, train step, checkpointing.
- ``interop``   : PyTorch/HF checkpoint import, artifact export.
- ``serve``     : streaming generation service + audio rendering.
"""

__version__ = "0.1.0"
