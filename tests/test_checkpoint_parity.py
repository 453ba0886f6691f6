"""North-star parity vs the REAL pretrained checkpoint (BASELINE.json).

This container has zero egress and no local copy of
skytnt/midi-model-tv2o-medium (documented blocked dependency, BASELINE.md),
so these tests SKIP unless ``tests/golden/checkpoint_parity.pkl`` exists —
produce it wherever hub access is available with:

    python tools/make_goldens.py --checkpoint skytnt/midi-model-tv2o-medium
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "checkpoint_parity.pkl"

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(),
    reason="pretrained-checkpoint golden absent (zero-egress container; "
           "see BASELINE.md blocked dependency)")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN, "rb") as f:
        g = pickle.load(f)
    from midi_model_tpu.interop import params_from_state_dict
    from midi_model_tpu.models import MIDIModelConfig

    cfg = MIDIModelConfig.from_name(g["config"])
    params = params_from_state_dict(g["state_dict"], cfg)
    return g, cfg, params


def test_logits_parity(golden):
    g, cfg, params = golden
    import jax.numpy as jnp

    from midi_model_tpu.models import midinet

    hidden, _ = midinet.forward(params, cfg, jnp.asarray(g["prompt"]))
    logits, _ = midinet.forward_token(
        params, cfg, hidden[:, -1], jnp.zeros((1, 0), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(logits[:, 0]), g["logits"].reshape(logits[:, 0].shape),
        atol=2e-3)


def test_greedy_decode_token_identical(golden):
    g, cfg, params = golden
    from midi_model_tpu.sampling import generate

    ours = generate(params, cfg, prompt=g["prompt"], batch_size=1,
                    max_len=64, greedy=True)
    ref = g["greedy_64"]
    n = min(ours.shape[1], ref.shape[1])
    np.testing.assert_array_equal(np.asarray(ours[0, :n]), ref[0, :n])
