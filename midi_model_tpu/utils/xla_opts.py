"""Per-program XLA compiler options for the decode step programs.

Root cause (round 4, measured on the live compiler via
tools/probe_vmem_shapes.py): at long scan lengths (the serving chunk of 32;
chunk 4 does not trigger it) XLA clones a Mosaic ``pallas_call`` into a
kCustom fusion together with the scan's output-stacking update
(``%closed_call.N = (...) fusion(...), kind=kCustom, calls=
%fused_computation.M.clone.clone``) — and the clone DROPS the kernel's
explicit ``vmem_limit_bytes``.  The kernel is then accounted against the
16 MB ``--xla_tpu_scoped_vmem_limit_kib`` program default and rejected:

    Scoped allocation with size 42.25M and limit 16.00M exceeded scoped
    vmem limit by 26.25M. It should not be possible to run out of scoped
    vmem -  please file a bug against XLA.

(The full verbatim error lives in tools/probe_vmem_shapes.py's round-4 log;
the one-axis bisect isolated scan length — per-request knob arrays, allow
planes, and donation are innocent.)  Round 3 had read these failures as the
two decode kernels' limits "summing" and fenced off the fused-event-net +
token-row-kernel combination in the batcher and in 24-layer aligned decode;
the real defect is the dropped per-kernel limit.

The fix: raise the program-level scoped-vmem default to 48 MB per-compile
for exactly the decode step programs.  This only restores the budget the
kernel had already declared through ``vmem_limit_bytes`` — XLA still runs
its physical-fit accounting, so the raise cannot over-subscribe VMEM, and
programs that never hit the cloning path compile byte-identically.

TPU-only: other backends reject unknown compile options
(``INVALID_ARGUMENT: No such compile option``), so callers create their
jits lazily and ask here at first call.
"""

from __future__ import annotations

import os
from typing import Optional

SCOPED_VMEM_KIB = 49152  # 48 MB: the observed 42.25 M demand + headroom


def decode_step_compiler_options() -> Optional[dict]:
    """Compiler options for jits that co-compile the decode Pallas kernels
    under a long scan — ``None`` off-TPU (the option is TPU-specific).

    ``MIDI_TPU_SCOPED_VMEM_KIB`` overrides the default raise — an ops /
    probe knob (tools/probe_scoped_drift.py sweeps it to isolate how the
    program-level scoped default shifts XLA's fusion sizing in the
    latency-bound 32-slot batcher program)."""
    import jax

    if jax.default_backend() == "tpu":
        kib = int(os.environ.get("MIDI_TPU_SCOPED_VMEM_KIB",
                                 SCOPED_VMEM_KIB))
        return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
    return None
