"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's fake-backend strategy: multi-device sharding tests run
on ``--xla_force_host_platform_device_count=8`` CPU devices so no TPU pod is
needed.

Note: the container's sitecustomize registers the axon TPU plugin at
interpreter start (jax is already imported by the time this file runs), so the
platform override must go through ``jax.config`` — backends initialize lazily,
and XLA_FLAGS is read when the CPU client is first created, so both settings
still take effect here.  Keeping tests off the TPU also avoids serializing
test runs behind the single-chip claim.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
