"""Isolate the 32-slot post-raise throughput drift.

Round 4 raised the program-level scoped-vmem default to 48 MB for the
decode step programs (utils/xla_opts.py) — required, or the chunk-32
batcher program rejects after XLA's custom-fusion cloning drops the
token-row kernel's explicit vmem limit.  After the raise, the 32-slot
medium batcher drifted 9,277 -> 8.1-8.7k ev/s while 128 slots held parity;
hypothesis: the raised default lets XLA size other fusions' scoped buffers
differently in the latency-bound program.

This sweep runs the steady 32-slot bench in a SUBPROCESS per candidate
``MIDI_TPU_SCOPED_VMEM_KIB`` value (fresh compile cache each):

    python tools/probe_scoped_drift.py
    python tools/probe_scoped_drift.py --kib 45056 49152 65536

44 MB (45056) is the smallest round value above the observed 42.25 M
demand; 43008 (42 MB) is expected to reject and confirms the demand
measurement still holds.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_KIB = [43008, 45056, 49152, 65536]


def main():
    args = sys.argv[1:]
    extra = [a for a in args if a in ("--split", "--int8")]
    args = [a for a in args if a not in extra]
    if args and args[0] == "--kib":
        values = [int(a) for a in args[1:]]
    else:
        values = DEFAULT_KIB
    for kib in values:
        env = dict(os.environ, MIDI_TPU_SCOPED_VMEM_KIB=str(kib))
        print(f"=== scoped_vmem_limit_kib={kib} ({kib / 1024:.0f} MB) ===",
              flush=True)
        r = subprocess.run(
            [sys.executable, "-u", os.path.join(HERE, "bench_batcher.py"),
             "--steady", "--slots=32"] + extra,
            env=env, timeout=2400)
        if r.returncode:
            print(f"    -> exit {r.returncode} (compile reject?)",
                  flush=True)


if __name__ == "__main__":
    main()
