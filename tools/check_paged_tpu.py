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
    raw_k = jnp.asarray(rng.normal(size=(n_pages, PS, HKV, D)), jnp.float32)
    raw_v = jnp.asarray(rng.normal(size=(n_pages, PS, HKV, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32) * (D ** -0.5)
    lengths = jnp.asarray([37, 0, 96, 1, 64], jnp.int32)
    base = jnp.asarray([0, 6, 12, 18, 24], jnp.int32)

    for quantized in (False, True):
        pools = pa.alloc_pools(HKV, n_pages, PS, D, jnp.float32,
                               quantized=quantized)
        if quantized:
            kq, ks = pa.quantize_packed(raw_k, HKV, D)
            vq, vs = pa.quantize_packed(raw_v, HKV, D)
            pools = pools._replace(k=kq, v=vq,
                                   scales=pa.combine_scales(ks, vs, HKV))
        else:
            pools = pools._replace(k=pa.pack_heads(raw_k, HKV, D),
                                   v=pa.pack_heads(raw_v, HKV, D))

        o, m, l = pa.paged_attention_stats(
            q, pools, lengths, base, page_size=PS, pages_per_slot=PPS,
            kv_heads=HKV, head_dim=D, ppcb=2, interpret=interpret)
        o_ref, m_ref, l_ref = pa._decode_xla(
            q, pools, lengths, base, page_size=PS, pages_per_slot=PPS,
            kv_heads=HKV, head_dim=D)
        live = np.asarray(lengths) > 0
        for name, a, r in (("o", o, o_ref), ("m", m, m_ref), ("l", l, l_ref)):
            a = np.asarray(a, np.float32)[live]
            r = np.asarray(r, np.float32)[live]
            # l is a softmax mass sum (magnitude ~length) — compare relative
            err = (np.abs(a - r) / np.maximum(np.abs(r), 1.0)).max() \
                if name == "l" else np.abs(a - r).max()
            print(f"{'int8' if quantized else 'fp'} {name}: max err {err:.5f}")
            assert err < 3e-2, (name, err)
        assert np.all(np.asarray(l)[~live] == 0)

        # fused in-kernel append parity (RMW in the attention kernel vs the
        # XLA .at[].set path); write at each slot's current length
        new = jnp.asarray(rng.normal(size=(B, HKV, D)), jnp.float32)
        wpos = jnp.clip(lengths, 0, PS * PPS - 1)  # as decode_paged clamps
        wpages = base + wpos // PS
        woffs = wpos % PS
        if quantized:
            nk, nks = pa.quantize_packed(new, HKV, D)
            nv, nvs = pa.quantize_packed(new * 2, HKV, D)
            nscales = pa.combine_scales(nks, nvs, HKV)
        else:
            nk = pa.pack_heads(new, HKV, D)
            nv = pa.pack_heads(new * 2, HKV, D)
            nscales = None
        ref = pa.kv_append(pools, nk, nv, wpages, woffs, new_scales=nscales)
        if interpret or jax.default_backend() == "tpu":
            o2, m2, l2, out = pa.paged_attention_stats(
                q, pools, lengths, base, (nk, nv, nscales, wpages, woffs),
                page_size=PS, pages_per_slot=PPS, kv_heads=HKV, head_dim=D,
                ppcb=2, interpret=interpret)
            np.testing.assert_array_equal(np.asarray(out.k), np.asarray(ref.k))
            np.testing.assert_array_equal(np.asarray(out.v), np.asarray(ref.v))
            if quantized:
                np.testing.assert_array_equal(np.asarray(out.scales),
                                              np.asarray(ref.scales))
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o, np.float32),
                                       atol=1e-5)
        print(f"{'int8' if quantized else 'fp'} APPEND OK")
    print("ALLHEADS OK")

if __name__ == "__main__":
    main(interpret=len(sys.argv) > 1 and sys.argv[1] == "interp")
