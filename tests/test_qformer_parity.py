"""Qformer resampler parity vs the reference's VENDORED BLIP-2 module
(`multimodal_resampler/qformer.py`), loaded from /root/reference with the
moved transformers helpers re-exported (apply_chunking_to_forward etc. now
live in transformers.pytorch_utils).

Oracle = the exact construction the reference's Qformer wrapper performs
(`qformer.py:1117-1147`): BertLMHeadModel with cross-attention every
`depth` layers, text path surgically removed, ln_vision outside, query
tokens through bert(query_embeds=..., encoder_hidden_states=ln_vision(x)).
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import ResamplerConfig
from radvlm_tpu.models import hf_import, resampler

torch = pytest.importorskip("torch")

_QFORMER_PY = (
    "/root/reference/finetuning/llava/model/multimodal_resampler/qformer.py"
)


@pytest.fixture(scope="module")
def qformer_mod():
    import transformers.modeling_utils as mu
    from transformers import pytorch_utils

    for name in ("apply_chunking_to_forward",
                  "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pytorch_utils, name))
    spec = importlib.util.spec_from_file_location("ref_qformer", _QFORMER_PY)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_qformer"] = mod
    spec.loader.exec_module(mod)
    return mod


def _build_oracle(qformer_mod, *, hidden, heads, inter, layers, freq,
                  queries, vision_width):
    """Replicate Qformer.build_Qformer (`qformer.py:1117-1133`) without the
    network fetch of bert-base-uncased: construct BertConfig directly."""
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=30, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        max_position_embeddings=64, layer_norm_eps=1e-12,
    )
    cfg.encoder_width = vision_width
    cfg.add_cross_attention = True
    cfg.cross_attention_freq = freq
    cfg.query_length = queries
    torch.manual_seed(0)
    model = qformer_mod.BertLMHeadModel(config=cfg)
    query_tokens = torch.nn.Parameter(torch.zeros(1, queries, hidden))
    query_tokens.data.normal_(mean=0.0, std=cfg.initializer_range)
    model.cls = None
    model.bert.embeddings.word_embeddings = None
    model.bert.embeddings.position_embeddings = None
    for layer in model.bert.encoder.layer:
        layer.output = None
        layer.intermediate = None
    ln_vision = torch.nn.LayerNorm(vision_width)
    with torch.no_grad():
        ln_vision.weight.add_(torch.randn_like(ln_vision.weight) * 0.05)
        ln_vision.bias.add_(torch.randn_like(ln_vision.bias) * 0.05)
    model.eval()
    return model, query_tokens, ln_vision


@pytest.mark.parametrize("freq", [1, 2])
def test_qformer_matches_vendored_torch(qformer_mod, freq):
    hidden, heads, inter, layers, queries, vw = 32, 2, 64, 4, 6, 24
    model, query_tokens, ln_vision = _build_oracle(
        qformer_mod, hidden=hidden, heads=heads, inter=inter, layers=layers,
        freq=freq, queries=queries, vision_width=vw,
    )

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 10, vw)).astype(np.float32)
    with torch.no_grad():
        x = ln_vision(torch.tensor(feats))
        atts = torch.ones(x.size()[:-1], dtype=torch.long)
        out = model.bert(
            query_embeds=query_tokens.expand(x.shape[0], -1, -1),
            encoder_hidden_states=x,
            encoder_attention_mask=atts,
            return_dict=True,
        )
        want = out.last_hidden_state.numpy()

    # wrapper-shaped state dict (Qformer module attribute names)
    state = {"query_tokens": query_tokens.detach().numpy(),
             "ln_vision.weight": ln_vision.weight.detach().numpy(),
             "ln_vision.bias": ln_vision.bias.detach().numpy()}
    for k, v in model.state_dict().items():
        state["Qformer." + k] = v.numpy()

    rcfg = ResamplerConfig(
        kind="qformer", depth=freq, num_latents=queries,
        qformer_layers=layers, qformer_hidden=hidden, qformer_heads=heads,
        qformer_intermediate=inter,
    )
    params = hf_import.import_qformer(state, rcfg, dtype=jnp.float32)
    got = np.asarray(resampler.forward(params, rcfg, jnp.asarray(feats)))
    assert got.shape == want.shape == (3, queries, hidden)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qformer_contract():
    rcfg = ResamplerConfig(kind="qformer", depth=2, num_latents=4,
                           qformer_layers=2, qformer_hidden=32,
                           qformer_heads=2, qformer_intermediate=64)
    assert resampler.output_tokens(rcfg, 729) == 4
    assert resampler.output_dim(rcfg, 1152) == 32
    assert not rcfg.spatial  # anyres must reject it (no spatial grid)
    params = resampler.init_params(rcfg, 24, jax.random.key(0), jnp.float32)
    out = resampler.forward(
        params, rcfg, jax.random.normal(jax.random.key(1), (2, 9, 24)))
    assert out.shape == (2, 4, 32)
    # cross-attention present only on every `depth`-th layer
    assert "cross" in params["layers"][0] and "cross" not in params["layers"][1]

def test_qformer_in_full_vlm_forward():
    """qformer plugs into the full model: non-spatial -> pad aspect, projector
    consumes the bert hidden width, the LLM sees num_latents image tokens."""
    import dataclasses

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal, radvlm

    base = cfglib.tiny_test_config()
    cfg = dataclasses.replace(
        base,
        resampler=ResamplerConfig(
            kind="qformer", depth=2, num_latents=4, qformer_layers=2,
            qformer_hidden=32, qformer_heads=2, qformer_intermediate=64),
        image_aspect_ratio="pad",
    )
    assert cfg.tokens_per_tile == 4
    params = radvlm.init_params(cfg, jax.random.key(0))
    assert params["projector"]["fc0"]["kernel"].shape[0] == 32
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
    sample = multimodal.build_sample([2, IMAGE_TOKEN_INDEX, 3], [img], cfg)
    batch = {k: jnp.asarray(v)
             for k, v in multimodal.collate([sample], pad_to_multiple=128).items()}
    logits, _ = radvlm.forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()


def test_vision_resampler_keys_normalize():
    """Full-checkpoint wiring: the reference stores the wrapper under
    model.vision_resampler.* — normalize_keys must expose it for
    import_radvlm's qformer branch (not mangle it into text.*)."""
    from radvlm_tpu.models.hf_import import normalize_keys

    state = normalize_keys({
        "model.vision_resampler.query_tokens": np.zeros((1, 4, 8), np.float32),
        "model.vision_resampler.Qformer.bert.embeddings.LayerNorm.weight":
            np.ones((8,), np.float32),
    })
    assert "vision_resampler.query_tokens" in state
    assert ("vision_resampler.Qformer.bert.embeddings.LayerNorm.weight"
            in state)
