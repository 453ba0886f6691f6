"""Continuous-batch serving throughput on one chip (tv2o-medium).

Three modes:
- default: end-to-end (admission + prefill + ramp + tail) over a request
  stream — the number a short bursty workload sees;
- --steady: per-step timing at full occupancy with unbounded budgets — the
  sustained decode throughput (what capacity planning wants). This is the
  number quoted in BASELINE.md config 5;
- --churn [--rate=R]: Poisson arrivals (R req/s), mixed prompt lengths and
  budgets — effective ev/s + time-to-first-row and inter-row-gap p50/p99,
  the latencies steady-state hides (group prefill stalls, admission waves).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.serve.batcher import ContinuousBatcher


def _setup(n_slots, max_seq, chunk, kv_int8, model="tv2o-medium"):
    if "--split" in sys.argv:  # force the split scan (A/B vs merged kernel)
        from midi_model_tpu.ops import event_loop

        event_loop.set_enabled(False)
    config = MIDIModelConfig.from_name(model)
    tok = config.tokenizer
    params = midinet.init_params(jax.random.PRNGKey(0), config,
                                 dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(params, config, n_slots=n_slots,
                                max_seq=max_seq, chunk=chunk,
                                disable_eos=True, kv_int8=kv_int8)
    prompt = np.full((1, tok.max_token_seq), tok.pad_id, np.int32)
    prompt[0, 0] = tok.bos_id
    return batcher, prompt


def main(n_slots=128, max_seq=512, budget=128, n_requests=160,
         kv_int8=False, chunk=32, model="tv2o-medium"):
    batcher, prompt = _setup(n_slots, max_seq, chunk, kv_int8, model)
    for _ in range(n_slots):
        batcher.submit(prompt, max_events=budget)
    batcher.step()  # compile + first chunk

    t0 = time.time()
    total_rows = 0
    submitted = n_slots
    while batcher.any_active:
        for fin in batcher.step():
            total_rows += len(fin.rows)
            if submitted < n_requests:
                batcher.submit(prompt, max_events=budget)
                submitted += 1
    dt = time.time() - t0
    print(f"slots={n_slots} requests={n_requests} budget={budget}"
          f"{' int8' if kv_int8 else ''}: {total_rows} rows in {dt:.1f}s "
          f"-> {total_rows/dt:,.0f} events/sec", flush=True)


def churn(n_slots=32, max_seq=512, kv_int8=False, chunk=32,
          model="tv2o-medium", rate=100.0, n_requests=300, seed=0):
    """Serving under CHURN, not steady-state: Poisson arrivals, mixed prompt
    lengths and budgets.  Reports effective ev/s plus the latencies a user
    actually feels: time-to-first-row (admission + prefill + first chunk)
    and inter-delivery gaps on each request's stream (p50/p99) — a group
    prefill that stalls every live slot shows up here, not in --steady.
    All latencies include the pipelined step's one-chunk lag: this is the
    shipped configuration end to end.
    """
    batcher, _ = _setup(n_slots, max_seq, chunk, kv_int8, model)
    tok = batcher.tokenizer
    rng = np.random.default_rng(seed)
    t_max = tok.max_token_seq
    # mixed workload: mostly short seeds, a tail of long file-prompts
    p_lens = rng.choice([1, 16, 64, 256], n_requests, p=[0.35, 0.3, 0.2, 0.15])
    budgets = rng.integers(32, 160, n_requests)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_requests))

    def make_prompt(n):
        p = np.full((n, t_max), tok.pad_id, np.int32)
        p[0, 0] = tok.bos_id
        if n > 1:  # realistic in-range rows so prefill does real work
            p[1:] = rng.integers(3, tok.vocab_size, (n - 1, t_max))
        return p

    # compile every program variant OUT of the timed window (prefill
    # buckets x step) so the churn numbers measure serving, not XLA
    for n in sorted(set(p_lens)):
        batcher.submit(make_prompt(n), max_events=1)
    while batcher.any_active:
        batcher.step()

    submit_t, first_t, gaps, done = {}, {}, [], {}
    last_t = {}

    def on_rows(rid, rows):
        now = time.perf_counter()
        if rid not in first_t:
            first_t[rid] = now
        else:
            gaps.append((now - last_t[rid]) / len(rows))
        last_t[rid] = now

    t0 = time.perf_counter()
    nxt = 0
    total_rows = 0
    while nxt < n_requests or batcher.any_active:
        now = time.perf_counter() - t0
        while nxt < n_requests and arrivals[nxt] <= now:
            rid = batcher.submit(make_prompt(int(p_lens[nxt])),
                                 max_events=int(budgets[nxt]))
            submit_t[rid] = time.perf_counter()
            nxt += 1
        if not batcher.any_active:
            time.sleep(min(0.005, max(0.0, arrivals[nxt] - now)))
            continue
        for fin in batcher.step(on_rows=on_rows):
            done[fin.request_id] = time.perf_counter()
            total_rows += len(fin.rows)
    dt = time.perf_counter() - t0
    ttfr = np.asarray([first_t[r] - submit_t[r] for r in first_t])
    gaps = np.asarray(gaps) if gaps else np.zeros(1)
    print(f"churn model={model} slots={n_slots} chunk={chunk} rate={rate}/s"
          f"{' int8' if kv_int8 else ''}: {total_rows} rows of "
          f"{len(done)} requests in {dt:.1f}s -> "
          f"{total_rows/dt:,.0f} events/sec effective;"
          f" time-to-first-row p50 {np.percentile(ttfr, 50)*1e3:,.0f} ms /"
          f" p99 {np.percentile(ttfr, 99)*1e3:,.0f} ms;"
          f" inter-row gap p50 {np.percentile(gaps, 50)*1e3:.1f} ms /"
          f" p99 {np.percentile(gaps, 99)*1e3:.1f} ms", flush=True)


def steady(n_slots=128, max_seq=512, kv_int8=False, chunk=32,
           model="tv2o-medium"):
    batcher, prompt = _setup(n_slots, max_seq, chunk, kv_int8, model)
    for _ in range(n_slots):
        batcher.submit(prompt, max_events=10**9)  # never retire
    batcher.step()  # compile
    batcher.step()  # fill the pipeline (pipelined mode keeps 1 in flight)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        batcher.step()
        times.append(time.perf_counter() - t0)
    # SUSTAINED time, not min: with pipeline=True a step that fetches an
    # already-finished chunk looks artificially fast — min() would overstate
    sus = sum(times) / len(times)
    print(f"steady model={model} slots={n_slots} chunk={chunk}"
          f"{' int8' if kv_int8 else ''}: "
          f"{sus*1e3:.1f} ms/step sustained (min {min(times)*1e3:.1f}) -> "
          f"{n_slots*chunk/sus:,.0f} events/sec", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    kv_int8 = "--int8" in args
    slots = next((int(a.split("=")[1]) for a in args
                  if a.startswith("--slots=")), 128)
    model = next((a.split("=")[1] for a in args
                  if a.startswith("--model=")), "tv2o-medium")
    if "--steady" in args:
        steady(n_slots=slots, kv_int8=kv_int8, model=model)
    elif "--churn" in args:
        rate = next((float(a.split("=")[1]) for a in args
                     if a.startswith("--rate=")), 100.0)
        churn(n_slots=slots, kv_int8=kv_int8, model=model, rate=rate)
    else:
        main(n_slots=slots, kv_int8=kv_int8, model=model)
