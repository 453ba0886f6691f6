"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors SURVEY.md §4's fake-backend strategy: multi-device sharding tests run
on `--xla_force_host_platform_device_count=8` CPU devices so no TPU pod is
needed in CI.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
