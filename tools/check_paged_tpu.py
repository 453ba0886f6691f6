"""On-device validation of the paged KV ops (Pallas vs XLA reference).

Run on the real TPU (single-claim — nothing else may touch the chip):
    python tools/check_paged_tpu.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from midi_model_tpu.ops import paged  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    hkv, n_pages, ps, d = 4, 48, 16, 64
    # lane-padded pools (the real config: head_dim 64 < LANE 128)
    k_pool, v_pool = paged.alloc_pools(hkv, n_pages, ps, d, jnp.bfloat16)
    k_pool = k_pool.at[..., :d].set(
        jnp.asarray(rng.normal(size=(hkv, n_pages, ps, d)), jnp.bfloat16))
    v_pool = v_pool.at[..., :d].set(
        jnp.asarray(rng.normal(size=(hkv, n_pages, ps, d)), jnp.bfloat16))

    b, h = 8, 8
    new_k = paged._pad_lane(
        jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.bfloat16),
        k_pool.shape[-1])
    new_v = paged._pad_lane(
        jnp.asarray(rng.normal(size=(b, hkv, d)), jnp.bfloat16),
        v_pool.shape[-1])
    pages = jnp.asarray(rng.integers(0, n_pages, b), jnp.int32)
    # distinct pages (the contract: one writer per page)
    pages = jnp.asarray(np.random.default_rng(1).permutation(n_pages)[:b],
                        jnp.int32)
    offs = jnp.asarray(rng.integers(0, ps, b), jnp.int32)

    k_ref, v_ref = paged._kv_append_xla(k_pool, v_pool, new_k, new_v, pages, offs)
    k_pl, v_pl = paged._kv_append_tpu(k_pool, v_pool, new_k, new_v, pages, offs)
    np.testing.assert_array_equal(
        np.asarray(k_pl, np.float32), np.asarray(k_ref, np.float32))
    np.testing.assert_array_equal(
        np.asarray(v_pl, np.float32), np.asarray(v_ref, np.float32))
    print("kv_append: pallas == xla (bit-exact)")

    pps = 6
    q = (jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32) * (d ** -0.5))
    page_indices = jnp.asarray(
        np.stack([np.arange(i * pps, (i + 1) * pps) for i in range(b)]),
        jnp.int32)
    lengths = jnp.asarray([37, 0, 96, 1, 17, 64, 95, 50], jnp.int32)

    out_pl = paged.paged_attention(q, k_pl, v_pl, lengths, page_indices,
                                   pages_per_compute_block=2)
    out_ref = paged._paged_attention_xla(
        paged._pad_lane(q, k_pl.shape[-1]), k_pl, v_pl, lengths,
        page_indices)[..., :q.shape[-1]]
    live = np.asarray(lengths) > 0
    a = np.asarray(out_pl, np.float32)[live]
    r = np.asarray(out_ref, np.float32)[live]
    err = np.abs(a - r).max()
    print(f"paged_attention: max |pallas - xla| = {err:.5f} (live rows)")
    assert err < 2e-2, err
    print("OK")


if __name__ == "__main__":
    main()
