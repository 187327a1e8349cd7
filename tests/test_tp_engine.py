"""Tensor-parallel continuous serving engine: the shard_map'd fill + decode
graphs over a `tensor` mesh axis must emit token-for-token what the
single-device engine emits (TP is a pure layout transform — psums restore the
exact matmul sums, modulo reduction-order float noise that greedy argmax over
well-separated logits absorbs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.parallel import tp
from radvlm_tpu.parallel.mesh import make_mesh


def _mk_sample(cfg, rng, n_text):
    img = rng.integers(0, 255, size=(90, 70, 3), dtype=np.uint8)
    ids = list(rng.integers(3, cfg.text.vocab_size, size=n_text))
    ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
    return multimodal.build_sample(ids, [img], cfg)


def _run(params, cfg, samples, steps, *, mesh=None, kv_quant=False):
    b = ContinuousBatcher(
        params, cfg,
        GenerationConfig(max_new_tokens=steps, eos_token_ids=()),
        num_slots=2, max_len=256, prompt_buckets=(128,),
        pad_tiles=2, attn_impl="xla", mesh=mesh, kv_quant=kv_quant,
    )
    reqs = [b.submit(s) for s in samples]
    done = {r.uid: r.emitted for r in b.run()}
    return [done[r.uid] for r in reqs]


@pytest.mark.parametrize("kv_quant", [False, True])
def test_tp_engine_matches_single_device(rng, kv_quant):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    steps = 5
    samples = [_mk_sample(cfg, rng, n) for n in (6, 11, 8)]

    ref = _run(params, cfg, samples, steps, kv_quant=kv_quant)
    mesh = make_mesh({"tensor": 2, "data": 1, "fsdp": 4})
    got = _run(params, cfg, samples, steps, mesh=mesh, kv_quant=kv_quant)
    assert got == ref


def test_tp_param_specs_reject_fused_and_validate():
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    from radvlm_tpu.models import qwen2

    fused = dict(params)
    fused["text"] = qwen2.fuse_projections(params["text"])
    with pytest.raises(ValueError, match="unfused"):
        tp.tp_param_pspecs(fused)
    # head counts must divide
    with pytest.raises(ValueError, match="must divide"):
        tp.local_text_cfg(cfg.text, 3)
    # sanity: the spec tree marks attn q column-parallel and o row-parallel
    specs = tp.tp_param_pspecs(params)
    q = specs["text"]["layers"]["attn"]["q"]["kernel"]
    o = specs["text"]["layers"]["attn"]["o"]["kernel"]
    assert q[-1] == "tensor" and o[1] == "tensor"


def test_tp_sampling_replicated(rng):
    """Temperature>0 under TP: every shard must sample the identical token
    (replicated lm_head + replicated rng) — the engine relies on this for a
    coherent shared cache. Determinism across two identical runs proves no
    shard divergence leaked into the cache."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(7))
    samples = [_mk_sample(cfg, rng, 6)]
    mesh = make_mesh({"tensor": 2, "data": 1, "fsdp": 4})

    def run_hot():
        b = ContinuousBatcher(
            params, cfg,
            GenerationConfig(max_new_tokens=6, eos_token_ids=(),
                             temperature=1.0, top_p=0.9),
            num_slots=1, max_len=256, prompt_buckets=(128,),
            pad_tiles=2, attn_impl="xla", mesh=mesh, seed=3,
        )
        reqs = [b.submit(s) for s in samples]
        done = {r.uid: r.emitted for r in b.run()}
        return [done[r.uid] for r in reqs]

    assert run_hot() == run_hot()


def test_tp_rejects_alibi_models():
    """ALiBi slopes index GLOBAL heads; a per-shard head count would silently
    mis-bias every shard (MPT under TP) — local_text_cfg must reject it."""
    import dataclasses

    import pytest

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.parallel import tp

    text = dataclasses.replace(
        cfglib.tiny_test_config().text, pos_embedding="alibi",
        num_heads=4, num_kv_heads=4,
    )
    with pytest.raises(NotImplementedError, match="ALiBi"):
        tp.local_text_cfg(text, 2)
