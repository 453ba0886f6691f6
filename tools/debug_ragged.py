"""Bit-identity check: ragged merged kernel vs aligned merged kernel on a
UNIFORM batch (same lengths, all alive, no retirement).  Every ragged
addition (work tables, per-slot RMW, per-slot RoPE, allow plane, freeze
gating) must be an exact no-op in this regime, so any diff is a ragged bug
— not the known merged-vs-split epsilon.

Run on the CPU mesh: JAX_PLATFORMS=cpu (tests/conftest.py style).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from midi_model_tpu.models import MIDIModelConfig, midinet
from midi_model_tpu.ops import event_loop
from midi_model_tpu.sampling import build_mask_table
from midi_model_tpu.sampling.generate import (_mask_arrays, normalize_prompt,
                                              prefill)


def main():
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=512, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    b, n_ev = 4, 5
    prompt = np.asarray(normalize_prompt(cfg.tokenizer, None, b))
    rng = np.random.default_rng(0)
    extra = rng.integers(3, cfg.tokenizer.vocab_size, (b, 2, 8))
    prompt = np.concatenate([prompt, extra], axis=1)  # len 3, uniform
    state = prefill(params, cfg, jnp.asarray(prompt), 64)
    masks = _mask_arrays(build_mask_table(cfg.tokenizer, disable_eos=True))
    merged = event_loop.prepare_inputs(params, cfg, masks)
    ps = state.pools.page_size
    pps = state.pools.k.shape[0] // (cfg.net.num_layers * b)
    t_max = cfg.tokenizer.max_token_seq

    key = jax.random.PRNGKey(5)
    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(jnp.arange(n_ev))
    gumbel = jax.vmap(lambda k2: jax.random.gumbel(
        k2, (t_max * b, event_loop.K_CAP), jnp.float32))(keys)

    for greedy in (True, False):
        g = jnp.zeros_like(gumbel) if greedy else gumbel
        rows_a, xout_a, pools_a = event_loop.merged_decode_events(
            merged, cfg, state.hidden, state.pools, state.cur_len, 1.0,
            0.98, 20, g, page_size=ps, pages_per_slot=pps, n_events=n_ev,
            greedy=greedy, interpret=True)
        index = jnp.full((b,), int(state.cur_len), jnp.int32)
        active = jnp.ones((b,), bool)
        allow = jnp.ones((b, cfg.tokenizer.vocab_size), jnp.float32)
        rows_r, xout_r, pools_r = event_loop.merged_decode_ragged(
            merged, cfg, state.hidden, state.pools, index, active, allow,
            1.0, 0.98, 20, g, page_size=ps, pages_per_slot=pps,
            n_events=n_ev, greedy=greedy, interpret=True)
        rows_same = np.array_equal(np.asarray(rows_a), np.asarray(rows_r))
        x_same = np.array_equal(np.asarray(xout_a, np.float32),
                                np.asarray(xout_r, np.float32))
        k_same = np.array_equal(np.asarray(pools_a.k, np.float32),
                                np.asarray(pools_r.k, np.float32))
        print(f"greedy={greedy}: rows {'OK' if rows_same else 'DIFF'}  "
              f"xout {'OK' if x_same else 'DIFF'}  "
              f"pools.k {'OK' if k_same else 'DIFF'}")
        if not rows_same:
            a, r = np.asarray(rows_a), np.asarray(rows_r)
            idx = np.argwhere(a != r)
            print("  first diffs (e, b, t):", idx[:5].tolist())
            e0 = idx[0][0]
            print("  aligned:", a[e0][idx[0][1]], "\n  ragged: ",
                  r[e0][idx[0][1]])


def ragged_vs_solo():
    """Each slot decoded ALONE through the aligned kernel at its own length
    must match the ragged batch slot-for-slot bit-exactly (no retirement:
    eos disabled, capacity ample)."""
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=512, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    lens = [1, 3, 9, 6]
    b, n_ev = len(lens), 5
    l_n = cfg.net.num_layers
    t_max = cfg.tokenizer.max_token_seq
    masks = _mask_arrays(build_mask_table(cfg.tokenizer, disable_eos=True))
    merged = event_loop.prepare_inputs(params, cfg, masks)
    rng = np.random.default_rng(0)

    states = []
    for s, ln in enumerate(lens):
        prompt = np.asarray(normalize_prompt(cfg.tokenizer, None, 1))
        if ln > 1:
            extra = rng.integers(3, cfg.tokenizer.vocab_size, (1, ln - 1, 8))
            prompt = np.concatenate([prompt, extra], axis=1)
        states.append(prefill(params, cfg, jnp.asarray(prompt), 64))
    ps = states[0].pools.page_size
    pps = states[0].pools.k.shape[0] // l_n

    key = jax.random.PRNGKey(5)
    # batch gumbel with per-slot streams; solo runs slice their own stream
    seeds = jnp.arange(b, dtype=jnp.uint32) + 100
    index = jnp.asarray(lens, jnp.int32)

    def g_event(e):
        keys = jax.vmap(lambda sd, ix: jax.random.fold_in(
            jax.random.PRNGKey(sd), ix + e))(seeds, index)
        return jnp.swapaxes(
            jax.vmap(lambda k2: jax.random.gumbel(
                k2, (t_max, event_loop.K_CAP), jnp.float32))(keys),
            0, 1).reshape(t_max * b, event_loop.K_CAP)

    gumbel = jax.vmap(g_event)(jnp.arange(n_ev))

    for greedy in (True, False):
        solo_rows = []
        for s, st in enumerate(states):
            # replicate the slot b times: SAME batch size as the ragged run,
            # so CPU matmul accumulation order matches (b=1 vs b=4 interpret
            # matmuls reassociate at epsilon) — row 0 is the reference
            if greedy:
                g1 = jnp.zeros((n_ev, t_max * b, event_loop.K_CAP),
                               jnp.float32)
            else:
                # slot s's stream replicated into every batch row
                g1 = jnp.repeat(gumbel[:, s::b, :], b, axis=1)
            hid_r = jnp.repeat(st.hidden, b, axis=0)
            k_r = jnp.repeat(st.pools.k.reshape(l_n, 1, pps, ps, -1), b,
                             axis=1).reshape(l_n * b * pps, ps, -1)
            v_r = jnp.repeat(st.pools.v.reshape(l_n, 1, pps, ps, -1), b,
                             axis=1).reshape(l_n * b * pps, ps, -1)
            from midi_model_tpu.ops.paged_allheads import PagedPools
            r, _, _ = event_loop.merged_decode_events(
                merged, cfg, hid_r, PagedPools(k=k_r, v=v_r), st.cur_len,
                1.0, 0.98, 20, g1, page_size=ps, pages_per_slot=pps,
                n_events=n_ev, greedy=greedy, interpret=True)
            solo_rows.append(np.asarray(r)[:, 0])  # [E, T]

        # batch pools: interleave the solo pools into the slot-major layout
        k_b = jnp.stack([st.pools.k.reshape(l_n, pps, ps, -1)
                         for st in states], axis=1).reshape(
            l_n * b * pps, ps, -1)
        v_b = jnp.stack([st.pools.v.reshape(l_n, pps, ps, -1)
                         for st in states], axis=1).reshape(
            l_n * b * pps, ps, -1)
        from midi_model_tpu.ops.paged_allheads import PagedPools
        pools_b = PagedPools(k=k_b, v=v_b)
        hidden_b = jnp.concatenate([st.hidden for st in states], axis=0)
        active = jnp.ones((b,), bool)
        allow = jnp.ones((b, cfg.tokenizer.vocab_size), jnp.float32)
        g = jnp.zeros_like(gumbel) if greedy else gumbel
        rows_r, _, _ = event_loop.merged_decode_ragged(
            merged, cfg, hidden_b, pools_b, index, active, allow,
            1.0, 0.98, 20, g, page_size=ps, pages_per_slot=pps,
            n_events=n_ev, greedy=greedy, interpret=True)
        rows_r = np.asarray(rows_r)
        ok = all(np.array_equal(rows_r[:, s], solo_rows[s])
                 for s in range(b))
        print(f"ragged-vs-solo greedy={greedy}: "
              f"{'OK' if ok else 'DIFF'}")
        if not ok:
            for s in range(b):
                if not np.array_equal(rows_r[:, s], solo_rows[s]):
                    d0 = np.argwhere(rows_r[:, s] != solo_rows[s])[0]
                    print(f"  slot {s} (len {lens[s]}) first diff at", d0,
                          "\n   ragged:", rows_r[d0[0], s],
                          "\n   solo:  ", solo_rows[s][d0[0]])


def one_event_bisect():
    """n_ev=1 bitwise per-slot comparison of rows/xout/pools."""
    cfg = MIDIModelConfig.get_config("v2", True, n_layer=4, n_head=4,
                                     n_embd=512, n_inner=256)
    params = midinet.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    lens = [1, 3, 9, 6]
    b = len(lens)
    l_n = cfg.net.num_layers
    t_max = cfg.tokenizer.max_token_seq
    masks = _mask_arrays(build_mask_table(cfg.tokenizer, disable_eos=True))
    merged = event_loop.prepare_inputs(params, cfg, masks)
    rng = np.random.default_rng(0)
    states = []
    for s, ln in enumerate(lens):
        prompt = np.asarray(normalize_prompt(cfg.tokenizer, None, 1))
        if ln > 1:
            extra = rng.integers(3, cfg.tokenizer.vocab_size, (1, ln - 1, 8))
            prompt = np.concatenate([prompt, extra], axis=1)
        states.append(prefill(params, cfg, jnp.asarray(prompt), 64))
    ps = states[0].pools.page_size
    pps = states[0].pools.k.shape[0] // l_n

    for n_ev in (1, 2, 3):
        solo = []
        for s, st in enumerate(states):
            g1 = jnp.zeros((n_ev, t_max, event_loop.K_CAP), jnp.float32)
            r, x, p = event_loop.merged_decode_events(
                merged, cfg, st.hidden, st.pools, st.cur_len, 1.0, 0.98,
                20, g1, page_size=ps, pages_per_slot=pps, n_events=n_ev,
                greedy=True, interpret=True)
            solo.append((np.asarray(r)[:, 0], np.asarray(x, np.float32),
                         np.asarray(p.k.reshape(l_n, pps, ps, -1), np.float32),
                         np.asarray(p.v.reshape(l_n, pps, ps, -1), np.float32)))
        k_b = jnp.stack([st.pools.k.reshape(l_n, pps, ps, -1)
                         for st in states], axis=1).reshape(l_n * b * pps, ps, -1)
        v_b = jnp.stack([st.pools.v.reshape(l_n, pps, ps, -1)
                         for st in states], axis=1).reshape(l_n * b * pps, ps, -1)
        from midi_model_tpu.ops.paged_allheads import PagedPools
        pools_b = PagedPools(k=k_b, v=v_b)
        hidden_b = jnp.concatenate([st.hidden for st in states], axis=0)
        index = jnp.asarray(lens, jnp.int32)
        g = jnp.zeros((n_ev, t_max * b, event_loop.K_CAP), jnp.float32)
        allow = jnp.ones((b, cfg.tokenizer.vocab_size), jnp.float32)
        rows_r, xout_r, pr = event_loop.merged_decode_ragged(
            merged, cfg, hidden_b, pools_b, index, jnp.ones((b,), bool),
            allow, 1.0, 0.98, 20, g, page_size=ps, pages_per_slot=pps,
            n_events=n_ev, greedy=True, interpret=True)
        rows_r = np.asarray(rows_r)
        xout_r = np.asarray(xout_r, np.float32)
        kr5 = np.asarray(pr.k.reshape(l_n, b, pps, ps, -1), np.float32)
        vr5 = np.asarray(pr.v.reshape(l_n, b, pps, ps, -1), np.float32)
        for s in range(b):
            rows_ok = np.array_equal(rows_r[:, s], solo[s][0])
            x_ok = np.array_equal(xout_r[s], solo[s][1][0])
            k_ok = np.array_equal(kr5[:, s], solo[s][2])
            v_ok = np.array_equal(vr5[:, s], solo[s][3])
            print(f"n_ev={n_ev} slot {s} (len {lens[s]}): rows "
                  f"{'OK' if rows_ok else 'DIFF'} xout "
                  f"{'OK' if x_ok else 'DIFF'} k "
                  f"{'OK' if k_ok else 'DIFF'} v {'OK' if v_ok else 'DIFF'}")
            if not k_ok:
                d = np.argwhere(kr5[:, s] != solo[s][2])
                print("   k first diffs (l, page, row, lane):", d[:3].tolist(),
                      "n=", len(d), "rows:", sorted(set(d[:, 2].tolist())))
            if not v_ok:
                d = np.argwhere(vr5[:, s] != solo[s][3])
                l0, p0, r0, c0 = d[0]
                print("   v first diffs:", d[:3].tolist(), "n=", len(d),
                      "rows:", sorted(set(d[:, 2].tolist())),
                      "vals:", vr5[l0, s, p0, r0, c0], solo[s][3][l0, p0, r0, c0])


if __name__ == "__main__":
    import sys as _s
    if "--bisect" in _s.argv:
        one_event_bisect()
    else:
        main()
        ragged_vs_solo()
