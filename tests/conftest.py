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


# Clear JAX's compilation caches at every test-FILE boundary.  The full
# suite compiles ~200 CPU programs in one process; at that accumulation the
# XLA CPU compiler segfaults deterministically partway through
# tests/test_paged.py (observed 2026-08-19, jax 0.8.x — native crash inside
# backend_compile_and_load; the same file passes in isolation and in every
# sub-suite tried).  Dropping the caches per module bounds the live-program
# count; it costs only recompiles of the few cross-file shared programs.
_LAST_MODULE = [None]


def pytest_runtest_setup(item):
    mod = item.module.__name__
    if _LAST_MODULE[0] is not None and _LAST_MODULE[0] != mod:
        jax.clear_caches()
    _LAST_MODULE[0] = mod
