"""BASELINE config 4: training throughput + MFU on the real TPU chip.

tv2o-medium / tv2o-large, seq 2048 events x 8 tokens, bf16 compute / fp32
master.  Reports tokens/sec (= B * 2048 * 8 / step time) AND model FLOPs
utilization from EXACT matmul-FLOPs accounting (fwd+bwd = 3x fwd, the
standard MFU convention — remat recompute is NOT credited), against the
v5e bf16 peak of 197 TFLOP/s.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import set_backend
from midi_model_tpu.train import init_train_state, make_optimizer, make_train_step

SEQ = 2048
STEPS = 8
V5E_BF16_PEAK = 197e12  # FLOP/s per chip


def matmul_flops_fwd(config: MIDIModelConfig, batch: int, seq: int) -> float:
    """Exact forward matmul FLOPs for one loss_fn pass over [B, seq, 8].

    Counts every MXU op in the model (2 FLOPs per MAC): event-net qkv/o/mlp
    + causal attention (scores and AV at the true triangular cost), token-net
    same at its 8-token context, and the lm_head.  Embedding gathers and
    elementwise/norm work are excluded (not MXU FLOPs).
    """
    tok = config.tokenizer
    rows = batch * (seq - 1)  # x = batch[:, :-1] event rows through the net
    t = tok.max_token_seq     # 8: token-net context per event row

    def stack_flops(cfg, n_rows, ctx_rows_avg):
        d, f, w = cfg.hidden_size, cfg.intermediate_size, cfg.num_heads * cfg.head_dim
        kvw = cfg.kv_heads * cfg.head_dim
        per_row = (
            d * (w + 2 * kvw)      # q, k, v projections
            + 2 * ctx_rows_avg * w  # scores QK^T + AV (per-head summed = w)
            + w * d                # o projection
            + 3 * d * f            # gate, up, down
        )
        return 2.0 * cfg.num_layers * n_rows * per_row  # MACs -> FLOPs

    # causal attention: average context of position i is (i+1)/2 -> (S+1)/2
    ev = stack_flops(config.net, rows, (seq - 1 + 1) / 2)
    tk = stack_flops(config.net_token, rows * t, (t + 1) / 2)
    lm_head = 2.0 * rows * t * config.n_embd * tok.vocab_size
    return ev + tk + lm_head


def measure(batch_size: int, backend: str, token_chunk=None, remat=False,
            name="tv2o-medium") -> float:
    set_backend(backend)
    config = MIDIModelConfig.from_name(name)
    params = midinet.init_params(jax.random.PRNGKey(0), config)
    opt = make_optimizer()
    step = make_train_step(config, opt, accum_steps=1, token_chunk=token_chunk,
                           remat=remat)
    state = init_train_state(params, opt)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        3, config.tokenizer.vocab_size, (1, batch_size, SEQ, 8)), jnp.int32)

    state, m = step(state, batch)  # compile
    float(m["loss"])
    t0 = time.time()
    for _ in range(STEPS):
        state, m = step(state, batch)
    float(m["loss"])  # host sync
    dt = (time.time() - t0) / STEPS
    tokens = batch_size * SEQ * 8
    flops = 3.0 * matmul_flops_fwd(config, batch_size, SEQ)  # fwd+bwd
    mfu = flops / dt / V5E_BF16_PEAK
    print(f"{name} bs={batch_size} attn={backend} chunk={token_chunk} "
          f"remat={remat}: {dt*1000:.0f} ms/step, {tokens/dt:,.0f} tokens/sec, "
          f"MFU {mfu*100:.1f}%")
    return tokens / dt


def main():
    jobs = [
        dict(batch_size=2, backend="auto"),
        dict(batch_size=4, backend="auto", token_chunk=2048),
        dict(batch_size=8, backend="auto", token_chunk=2048, remat=True),
        dict(batch_size=16, backend="auto", token_chunk=2048, remat=True),
        # bs=1 fits WITHOUT remat and beats every bs=2 remat policy (the
        # 2048x8 rows already saturate the matmul M dims; bs=2 only buys
        # activation pressure): 78.4k tok/s vs 67.1k bs=2+dots.  Use
        # --batch-size-train 1 --acc-grad 2 for effective batch 2 (74.2k).
        dict(batch_size=1, backend="auto", name="tv2o-large"),
        dict(batch_size=2, backend="auto", remat="dots", name="tv2o-large"),
        dict(batch_size=2, backend="auto", token_chunk=2048, remat=True,
             name="tv2o-large"),
        # round-5 (VERDICT task 4): does a LARGER batch help once remat=dots
        # (the supported policy — whole-layer remat crashes the compiler,
        # tools/repro_splash_remat_crash.py) makes bs=8 compileable?
        dict(batch_size=2, backend="auto", remat="dots"),            # 7
        dict(batch_size=4, backend="auto", remat="dots",
             token_chunk=2048),                                      # 8
        dict(batch_size=8, backend="auto", remat="dots",
             token_chunk=2048),                                      # 9
        dict(batch_size=8, backend="auto", remat="dots",
             token_chunk=2048, name="tv2o-large"),                   # 10
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for i, job in enumerate(jobs):
        if only is not None and str(i) != only:
            continue
        try:
            measure(**job)
        except Exception as e:
            print(f"{job}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
