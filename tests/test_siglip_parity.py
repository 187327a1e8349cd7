"""SigLIP tower parity vs HF transformers SiglipVisionModel.

Verifies the drop-last-layer contract (`siglip_encoder.py:570-571,582`): our tower
with num_layers=N must match HF hidden states *before* the final layer + post-LN,
i.e. the penultimate hidden state of an (N+1)-layer HF tower.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radvlm_tpu.config import SigLIPConfig
from radvlm_tpu.models import hf_import, siglip

torch = pytest.importorskip("torch")

TINY = SigLIPConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,  # we run 2 of the HF model's 3 layers
    num_heads=2,
    image_size=42,
    patch_size=14,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    cfg = SiglipVisionConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers + 1,  # one extra layer that we drop
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        attn_implementation="eager",
    )
    model = SiglipVisionModel(cfg)
    model.eval()
    return model


def test_hidden_states_match_hf_penultimate(hf_model):
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_siglip(state, TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    # normalized pixel values in [-1, 1]
    pixels = rng.uniform(-1, 1, size=(2, TINY.image_size, TINY.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        out = hf_model(
            torch.tensor(pixels).permute(0, 3, 1, 2), output_hidden_states=True
        )
    # hidden_states[k] = input to layer k; index num_layers = output of first
    # `num_layers` layers = what the reference uses.
    ref = out.hidden_states[TINY.num_layers].numpy()

    got = siglip.forward(params, TINY, jnp.asarray(pixels), attn_impl="xla")
    assert got.shape == ref.shape == (2, TINY.tokens_per_tile, TINY.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)
