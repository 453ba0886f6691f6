"""On-device validation of the all-heads paged KV kernels (Pallas vs XLA).

Run on the real TPU (single-claim — nothing else may touch the chip):
    python tools/check_paged_tpu.py          # real TPU
    JAX_PLATFORMS=cpu python tools/check_paged_tpu.py interp   # interpreter
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from midi_model_tpu.ops import paged_allheads as pa

def main(interpret):
    rng = np.random.default_rng(0)
    HKV, H, D, PS, PPS, B = 4, 8, 64, 16, 6, 5
    n_pages = B * PPS + 4
    kp, vp = pa.alloc_pools(HKV, n_pages, PS, D, jnp.float32)
    # fill pools with packed random data
    raw_k = rng.normal(size=(n_pages, PS, HKV, D)).astype(np.float32)
    raw_v = rng.normal(size=(n_pages, PS, HKV, D)).astype(np.float32)
    kp = kp.at[...].set(np.asarray(pa.pack_heads(jnp.asarray(raw_k), HKV, D)))
    vp = vp.at[...].set(np.asarray(pa.pack_heads(jnp.asarray(raw_v), HKV, D)))
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32) * (D ** -0.5)
    lengths = jnp.asarray([37, 0, 96, 1, 64], jnp.int32)
    base = jnp.asarray([0, 6, 12, 18, 24], jnp.int32)

    o, m, l = pa.paged_attention_stats(
        q, kp, vp, lengths, base, page_size=PS, pages_per_slot=PPS,
        kv_heads=HKV, head_dim=D, ppcb=2, interpret=interpret)
    o_ref, m_ref, l_ref = pa._decode_xla(
        q, kp, vp, lengths, base, page_size=PS, pages_per_slot=PPS,
        kv_heads=HKV, head_dim=D)
    live = np.asarray(lengths) > 0
    for name, a, r in (("o", o, o_ref), ("m", m, m_ref), ("l", l, l_ref)):
        err = np.abs(np.asarray(a, np.float32)[live] - np.asarray(r, np.float32)[live]).max()
        print(f"{name}: max err {err:.5f}")
        assert err < 3e-2, (name, err)
    # dead rows well-defined: m=-inf, l=0, o=0
    assert np.all(np.asarray(l)[~live] == 0)
    print("ALLHEADS OK")

    # kv_append parity
    new_k = pa.pack_heads(jnp.asarray(rng.normal(size=(B, HKV, D)), jnp.float32), HKV, D)
    new_v = pa.pack_heads(jnp.asarray(rng.normal(size=(B, HKV, D)), jnp.float32), HKV, D)
    pages = jnp.asarray([0, 7, 13, 19, 25], jnp.int32)
    offs = jnp.asarray([5, 0, 15, 3, 9], jnp.int32)
    k1, v1 = pa._kv_append_xla(kp, vp, new_k, new_v, pages, offs)
    k2, v2 = pa._kv_append_tpu(kp, vp, new_k, new_v, pages, offs, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    print("APPEND OK")

if __name__ == "__main__":
    main(interpret=len(sys.argv) > 1 and sys.argv[1] == "interp")
