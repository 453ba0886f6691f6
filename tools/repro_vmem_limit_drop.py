"""Standalone repro: XLA's custom-fusion cloning DROPS a pallas_call's
explicit ``vmem_limit_bytes`` at long scan lengths.

THE BUG (root-caused round 4 via tools/probe_vmem_shapes.py one-axis
bisect on the live compiler, JAX 0.8.x / libtpu 2026-xx on TPU v5e):

  When a Mosaic ``pallas_call`` with an explicit
  ``CompilerParams(vmem_limit_bytes=N)`` (N > the 16 MB program default)
  sits inside a ``lax.scan`` whose per-step outputs are STACKED, and the
  scan is long enough (the serving chunk of 32 triggers it; 4 does not),
  XLA clones the kernel into a kCustom fusion together with the scan's
  output-stacking dynamic-update-slice:

      %closed_call.N = (...) fusion(...), kind=kCustom,
          calls=%fused_computation.M.clone.clone

  The CLONE does not carry the kernel's explicit vmem limit, so the
  kernel is accounted against the program-level
  ``--xla_tpu_scoped_vmem_limit_kib`` default (16 MB) and rejected:

      Scoped allocation with size 42.25M and limit 16.00M exceeded scoped
      vmem limit by 26.25M. It should not be possible to run out of
      scoped vmem -  please file a bug against XLA.

  (Verbatim from the round-4 bisect; the 42.25 M is the token-row
  kernel's fused-clone demand at tv2o-medium/32 slots.)

THE WORKAROUND: raise the program-level default per-compile for exactly
the decode-step programs (utils/xla_opts.py, 48 MB).  The raise only
restores the budget the kernel had already declared — XLA still runs its
physical-fit accounting.

THIS SCRIPT reproduces the drop with a SYNTHETIC kernel so the artifact
stays auditable when JAX/XLA versions move: a pallas_call holding a 24 MB
VMEM scratch and declaring a 32 MB limit, scanned with stacked outputs.

    python tools/repro_vmem_limit_drop.py          # expect: DROP REPRODUCED
    (run on the REAL TPU; CPU has no scoped-vmem accounting)

Expected output on an affected stack:
  scan=4   default-limit: OK          (no clone at short scans)
  scan=32  default-limit: REJECTED    <- the bug (explicit limit dropped)
  scan=32  raised-limit:  OK          (the utils/xla_opts.py workaround)
If "scan=32 default-limit" starts passing after a JAX/libtpu bump, the
upstream bug is fixed and the 48 MB raise in utils/xla_opts.py can be
retired (re-measure the 32-slot batcher drift first — BASELINE.md r4/r5).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCRATCH_MB = 24  # > the 16 MB program default, < the declared 32 MB limit


def _kernel(x_ref, o_ref, big_ref):
    # touch the scratch so it cannot be elided
    big_ref[0, :, :] = x_ref[...] * 2.0
    o_ref[...] = big_ref[0] + x_ref[...]


def make_call():
    rows = SCRATCH_MB * (1 << 20) // (4 * 512 * 128)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, 512, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )


def scanned(length: int, opts):
    call = make_call()

    @functools.partial(jax.jit, compiler_options=opts)
    def prog(x):
        def body(c, _):
            y = call(c)
            return y, y  # stacked per-step output: the clone trigger

        _, ys = jax.lax.scan(body, x, None, length=length)
        return ys

    x = jnp.ones((512, 128), jnp.float32)
    jax.block_until_ready(prog(x))


def attempt(tag, length, opts):
    try:
        scanned(length, opts)
        print(f"  scan={length:<3} {tag}: OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if "coped" in ln]
        print(f"  scan={length:<3} {tag}: REJECTED", flush=True)
        for ln in lines[:2]:
            print(f"      {ln.strip()[:200]}", flush=True)
        return False


def main():
    assert jax.default_backend() == "tpu", "run on the real TPU"
    raised = {"xla_tpu_scoped_vmem_limit_kib": "49152"}
    ok_short = attempt("default-limit", 4, None)
    ok_long = attempt("default-limit", 32, None)
    ok_raised = attempt("raised-limit ", 32, raised)
    if ok_short and not ok_long and ok_raised:
        print("DROP REPRODUCED: explicit vmem_limit_bytes lost in the "
              "long-scan kCustom clone; the xla_opts.py raise remains "
              "required.")
    elif ok_short and ok_long:
        print("NOT REPRODUCED on this JAX/libtpu: the upstream drop may be "
              "fixed — consider retiring the 48 MB raise "
              "(utils/xla_opts.py) after re-measuring the batcher drift.")
    else:
        print("UNEXPECTED pattern — inspect the errors above.")


if __name__ == "__main__":
    main()
