"""Long-context knobs: pos-skipping augmentation + linear rope scaling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.loader import apply_pos_skipping
from radvlm_tpu.models import qwen2


def test_pos_skipping():
    rng = np.random.default_rng(0)
    b, L = 4, 32
    positions = np.tile(np.arange(L)[None], (b, 1)).astype(np.int32)
    seg = np.ones((b, L), np.int32)
    seg[:, 28:] = 0
    lengths = np.full((b,), 28, np.int64)
    batch = {"positions": positions, "segment_ids": seg, "lengths": lengths}
    out = apply_pos_skipping(batch, rng, max_range=1000)
    p = out["positions"]
    for i in range(b):
        row = p[i, :28]
        deltas = row - np.arange(28)
        # monotone non-decreasing offsets: 0 before the split, constant offset after
        assert deltas[0] == 0
        assert (np.diff(deltas) >= 0).all()
        assert set(np.unique(deltas)).issubset({deltas[0], deltas[-1]})
        assert deltas[-1] <= 1000
        # padding positions untouched
        np.testing.assert_array_equal(p[i, 28:], positions[i, 28:])
    # original batch not mutated
    assert (batch["positions"] == positions).all()


def test_rope_scaling_extends_context():
    """With linear rope scaling factor f, position p behaves like p/f: logits at
    scaled position f*p must match unscaled position p."""
    base = cfglib.tiny_test_config().text
    scaled = base.__class__(**{**base.__dict__, "rope_scaling": 4.0})
    params = qwen2.init_params(base, jax.random.key(0))

    b, s, d = 1, 8, base.hidden_size
    embeds = jnp.asarray(np.random.default_rng(0).normal(size=(b, s, d)), jnp.float32)
    seg = jnp.ones((b, s), jnp.int32)
    pos = jnp.tile(jnp.arange(s)[None], (b, 1))

    h_base, _ = qwen2.forward(
        params, base, input_embeds=embeds, positions=pos,
        segment_ids=seg, attn_impl="xla", return_hidden=True,
    )
    h_scaled, _ = qwen2.forward(
        params, scaled, input_embeds=embeds, positions=pos * 4,
        segment_ids=seg, attn_impl="xla", return_hidden=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_base), np.asarray(h_scaled), atol=1e-5, rtol=1e-5
    )
