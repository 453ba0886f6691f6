"""The scoped-VMEM compile-option helper (utils/xla_opts.py).

XLA's custom-fusion cloning drops a pallas_call's explicit
``vmem_limit_bytes`` at long scan lengths; the decode step programs
compile with the program-level scoped default raised on TPU.  Off-TPU the
option must NOT be passed — backends reject unknown compile options with
INVALID_ARGUMENT (these tests run on the CPU mesh, so they pin the
off-TPU half; tools/probe_vmem_shapes.py pins the TPU half on-device).
"""

import jax

from midi_model_tpu.utils.xla_opts import (SCOPED_VMEM_KIB,
                                           decode_step_compiler_options)


def test_options_off_tpu_are_none():
    assert jax.default_backend() != "tpu"  # conftest pins the cpu mesh
    assert decode_step_compiler_options() is None


def test_options_on_tpu_raise_scoped_limit(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    opts = decode_step_compiler_options()
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}
    # the raise must cover the measured 42.25 MB dropped-limit demand
    assert SCOPED_VMEM_KIB * 1024 > int(42.25 * 2**20)


def test_lazy_jits_build_off_tpu():
    from midi_model_tpu.serve.batcher import _step_jitted
    from midi_model_tpu.sampling.generate import _decode_events_jitted

    # cached per backend: a process that mixes backends (tests monkeypatch
    # jax.default_backend) must not inherit a stale TPU jit (ADVICE r4)
    assert _step_jitted("cpu") is _step_jitted("cpu")
    assert _decode_events_jitted("cpu") is _decode_events_jitted("cpu")
    assert _decode_events_jitted("tpu") is not _decode_events_jitted("cpu")
