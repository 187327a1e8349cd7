"""Pipeline parallelism (GPipe schedule) over a `stage` mesh axis.

TPU-native pipeline training: the decoder layer stack — already *stacked*
along a leading [L, ...] axis and scanned (`models/qwen2.py forward`) — is
split into S contiguous stages sharded over the `stage` mesh axis. Inside one
`shard_map`, microbatches flow through the stages with `lax.ppermute` hops
over ICI neighbors: tick t has stage s working on microbatch (t - s), the
classic GPipe schedule with (S - 1) bubble ticks on each side. Autodiff
through the tick scan + ppermute yields the backward pipeline automatically
(ppermute transposes to the reversed hop), so one `jax.value_and_grad` gives
pipelined fwd+bwd with no hand-written schedule.

The reference has no pipeline engine of its own — its 7B runs fit one GPU
under ZeRO-3 (`finetuning/scripts/zero3.json`; sharded *states*, replicated
compute). PP is here for the scale story SURVEY.md §2.7 asks for: models
whose layer stack exceeds one chip's HBM train with layers split across
chips, composing with the `data` axis (DP x PP), while embeddings, the
vision tower, and the LM head stay replicated (they are <5% of 7B-and-up
parameter bytes).

Design notes (vs a naive translation):
  - everything under ONE jit: the tick loop is a `lax.scan`, stage identity
    is `lax.axis_index` (runtime), so a single SPMD program serves all
    stages — no per-stage Python programs or p2p send/recv threads.
  - non-last stages skip the LM-head/CE work and non-first stages skip the
    vision tower via `lax.cond` on the stage index (both branches compile,
    only one executes per device).
  - per-layer `jax.checkpoint` (remat) inside the stage body keeps the
    GPipe activation footprint at O(microbatches x layer boundaries), the
    standard memory profile.

Interleaved schedule (`PPStepConfig.interleave = V > 1`, Megatron-style
virtual stages): each device holds V round-robin layer chunks instead of one
contiguous block, so a microbatch visits every device V times and the warmup/
drain bubble shrinks from (S-1)/(M+S-1) of the step to (S-1)/(M*V+S-1).
Layout: the stacked [L, ...] layer leaves are reshaped [V, S, C, ...]
(C = L/(S*V); the reshape is order-preserving, so global stage g = v*S + s
covers layers [g*C, (g+1)*C) exactly) and sharded P(None, "stage") — device s
holds chunk v at local index [v, 0]. The tick loop walks per-device work
index u = t - s; u decodes to (round r, chunk v, slot j) = (u//(S*V),
(u%(S*V))//S, u%S) and microbatch m = r*S + j; activations hop the FULL ring
(stage S-1 -> 0 carries a microbatch to its next chunk). `lax.switch` on v
picks the chunk body (static layer slices; one branch executes per tick).
Requires L % (S*V) == 0 and M % S == 0.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radvlm_tpu.config import IGNORE_INDEX, RadVLMConfig
from radvlm_tpu.parallel.sharding import path_str

_LAYER_RE = re.compile(r"(^|/)text/layers/")


def pp_param_pspecs(params: Any, interleave: int = 1) -> Any:
    """PartitionSpecs for PP: decoder layer stacks shard their leading [L]
    axis over `stage` (interleaved: [V, S, C, ...] leaves shard dim 1);
    everything else (vision tower, embed, final norm, lm_head, projector) is
    replicated across stages."""
    layer_spec = P(None, "stage") if interleave > 1 else P("stage")
    return jax.tree_util.tree_map_with_path(
        lambda path, _: layer_spec if _LAYER_RE.search(path_str(path)) else P(),
        params,
    )


def fold_layers_interleaved(params: Any, stages: int, interleave: int) -> Any:
    """Reshape stacked decoder-layer leaves [L, ...] -> [V, S, C, ...] so a
    P(None, "stage") sharding places chunk v of device s (= global stage
    v*S + s, layers [(v*S+s)*C, ...)) at local index [v, 0]. Order-preserving
    (pure reshape), so `unfold_layers_interleaved` restores the canonical
    stack for checkpoints/HF export."""
    V, S = interleave, stages

    def fold(path, x):
        if _LAYER_RE.search(path_str(path)):
            if x.shape[0] % (V * S):
                raise ValueError(
                    f"num_layers={x.shape[0]} not divisible by "
                    f"stage={S} x interleave={V}"
                )
            return x.reshape((V, S, x.shape[0] // (V * S)) + x.shape[1:])
        return x

    return jax.tree_util.tree_map_with_path(fold, params)


def unfold_layers_interleaved(params: Any) -> Any:
    """Inverse of `fold_layers_interleaved`: [V, S, C, ...] -> [L, ...]."""

    def unfold(path, x):
        if _LAYER_RE.search(path_str(path)):
            return x.reshape((x.shape[0] * x.shape[1] * x.shape[2],) + x.shape[3:])
        return x

    return jax.tree_util.tree_map_with_path(unfold, params)


def canonicalize_layer_stacks(params: Any, num_layers: int) -> Any:
    """Restore canonical [L, ...] layer stacks on a tree that may come from
    an interleaved-PP checkpoint (leaves saved as [V, S, C, ...]). No-op for
    standard layouts."""
    sample = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if _LAYER_RE.search(path_str(path)):
            sample = leaf
            break
    if sample is None or sample.shape[0] == num_layers:
        return params
    if int(np.prod(sample.shape[:3])) != num_layers:
        raise ValueError(
            f"layer stack leading dims {sample.shape[:3]} do not fold to "
            f"num_layers={num_layers}"
        )
    return unfold_layers_interleaved(params)


def shard_params_pp(mesh: Mesh, params: Any, interleave: int = 1) -> Any:
    if interleave > 1:
        params = fold_layers_interleaved(
            params, dict(mesh.shape)["stage"], interleave
        )
    specs = pp_param_pspecs(params, interleave)
    sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )
    return jax.device_put(params, sh)


def _check_mesh(
    mesh: Mesh, cfg: RadVLMConfig, *, interleave: int = 1,
    n_microbatches: Optional[int] = None,
) -> int:
    shape = dict(mesh.shape)
    stages = shape.get("stage", 1)
    if stages < 2:
        raise ValueError("PP needs a `stage` mesh axis of size >= 2")
    if n_microbatches is not None and n_microbatches < 1:
        raise ValueError(f"n_microbatches must be >= 1, got {n_microbatches}")
    for ax in ("fsdp", "seq", "tensor", "expert"):
        if shape.get(ax, 1) != 1:
            raise ValueError(
                f"PP v1 composes with `data` only; mesh axis {ax}="
                f"{shape[ax]} unsupported"
            )
    if cfg.text.num_layers % (stages * interleave):
        raise ValueError(
            f"num_layers={cfg.text.num_layers} not divisible by "
            f"stage={stages} x interleave={interleave}"
        )
    if interleave > 1 and n_microbatches is not None and n_microbatches % stages:
        raise ValueError(
            f"interleaved PP needs microbatches divisible by stages: "
            f"M={n_microbatches}, S={stages}"
        )
    if cfg.text.num_experts:
        raise ValueError("PP v1 does not support MoE router aux")
    return stages


def _microbatch(x: jnp.ndarray, m: int) -> jnp.ndarray:
    return x.reshape((m, x.shape[0] // m) + x.shape[1:])


def make_pp_loss_fn(
    mesh: Mesh,
    cfg: RadVLMConfig,
    *,
    n_microbatches: int,
    remat: bool = True,
    attn_impl: str = "auto",
    interleave: int = 1,
) -> Callable[[Any, Dict[str, jnp.ndarray]], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
    """Build the per-shard loss closure run inside shard_map.

    Returns fn(local_params, local_batch) -> (local_loss, metrics): the
    differentiated value is this device's numerator over the global token
    count, so grad(fn) is exactly this device's contribution to the global
    gradient (summed afterwards in make_pp_grad_fn); metrics carry the
    psum'd global loss for reporting."""
    from radvlm_tpu.models import qwen2, radvlm

    S = dict(mesh.shape)["stage"]
    M = n_microbatches
    V = interleave
    # Stochastic train-time resampling (masked_drop) needs the per-step rng
    # the plain SFT step threads through (train_step.py:75-88); only stage 0
    # (the vision/embed stage) consumes it.
    needs_rng = cfg.resampler.kind == "masked_drop"

    def loss_fn(local_params, batch, rng):
        my = jax.lax.axis_index("stage")
        tcfg = cfg.text
        b, L = batch["tokens"].shape
        if b % M:
            raise ValueError(f"per-shard batch {b} not divisible by M={M}")
        dtype = local_params["text"]["norm"].dtype

        # ---- embeds (vision tower + splice) on stage 0 only ----
        def compute_embeds(_):
            bt, t = batch["tiles"].shape[:2]
            flat = batch["tiles"].reshape((bt * t,) + batch["tiles"].shape[2:])
            feats = radvlm.encode_tiles(
                local_params, cfg, flat, remat=remat, attn_impl=attn_impl,
                resampler_rng=rng if needs_rng else None,
            ).reshape(bt, t, cfg.tokens_per_tile, -1)
            merged = radvlm.merge_image_features(
                local_params, feats, batch["merge_indices"],
                batch["merge_weights"],
            )
            return radvlm.splice_embeds(
                local_params, batch["tokens"], batch["img_src"], merged, cfg
            ).astype(dtype)

        embeds = jax.lax.cond(
            my == 0,
            compute_embeds,
            lambda _: jnp.zeros((b, L, tcfg.hidden_size), dtype),
            None,
        )

        micro_e = _microbatch(embeds, M)               # [M, mb, L, D]
        micro_pos = _microbatch(batch["positions"], M)  # [M, mb, L]
        micro_seg = _microbatch(batch["segment_ids"], M)
        micro_lab = _microbatch(batch["labels"], M)
        mb = b // M

        def stage_fwd(layers, x, pos, seg):
            def body(carry, lp):
                return (
                    qwen2._block(tcfg, lp, carry, pos, seg, attn_impl),
                    None,
                )

            if remat:
                body = jax.checkpoint(
                    body, policy=jax.checkpoint_policies.nothing_saveable
                )
            x, _ = jax.lax.scan(body, x, layers)
            return x

        inbuf0 = jnp.zeros((mb, L, tcfg.hidden_size), dtype)
        outbuf0 = jnp.zeros((M, mb, L, tcfg.hidden_size), dtype)

        if V == 1:
            # ---- GPipe tick loop: stage s runs microbatch (t - s) at tick t
            local_layers = local_params["text"]["layers"]  # [L/S, ...]
            perm = [(i, i + 1) for i in range(S - 1)]

            def tick(carry, t):
                inbuf, outbuf = carry
                m = jnp.clip(t - my, 0, M - 1)
                first = jax.lax.dynamic_index_in_dim(micro_e, m, keepdims=False)
                x_in = jnp.where(my == 0, first, inbuf)
                pos = jax.lax.dynamic_index_in_dim(micro_pos, m, keepdims=False)
                seg = jax.lax.dynamic_index_in_dim(micro_seg, m, keepdims=False)
                y = stage_fwd(local_layers, x_in, pos, seg)
                nxt = jax.lax.ppermute(y, "stage", perm)
                oidx = jnp.clip(t - (S - 1), 0, M - 1)
                write = (my == S - 1) & (t >= S - 1)
                cur = jax.lax.dynamic_index_in_dim(outbuf, oidx, keepdims=False)
                outbuf = jax.lax.dynamic_update_index_in_dim(
                    outbuf, jnp.where(write, y, cur), oidx, 0
                )
                return (nxt, outbuf), None

            (_, outbuf), _ = jax.lax.scan(
                tick, (inbuf0, outbuf0), jnp.arange(M + S - 1)
            )
        else:
            # ---- interleaved tick loop: device s at tick t works item
            # u = t - s; u decodes to (round, chunk, slot) and the activation
            # rides the FULL ring (S-1 -> 0 advances a microbatch to its next
            # chunk on the same device group). See module docstring.
            local_layers = jax.tree.map(
                lambda x: x[:, 0], local_params["text"]["layers"]
            )  # [V, 1, C, ...] shard -> [V, C, ...]
            perm = [(i, (i + 1) % S) for i in range(S)]
            chunk_fns = [
                (lambda vv: lambda x, pos, seg: stage_fwd(
                    jax.tree.map(lambda p: p[vv], local_layers), x, pos, seg
                ))(vv)
                for vv in range(V)
            ]

            def tick(carry, t):
                inbuf, outbuf = carry
                u = jnp.clip(t - my, 0, M * V - 1)
                r = u // (S * V)
                rem = u % (S * V)
                v = rem // S
                m = r * S + rem % S
                first = jax.lax.dynamic_index_in_dim(micro_e, m, keepdims=False)
                x_in = jnp.where((my == 0) & (v == 0), first, inbuf)
                pos = jax.lax.dynamic_index_in_dim(micro_pos, m, keepdims=False)
                seg = jax.lax.dynamic_index_in_dim(micro_seg, m, keepdims=False)
                y = jax.lax.switch(v, chunk_fns, x_in, pos, seg)
                nxt = jax.lax.ppermute(y, "stage", perm)
                write = (my == S - 1) & (v == V - 1) & (t - my >= 0)
                cur = jax.lax.dynamic_index_in_dim(outbuf, m, keepdims=False)
                outbuf = jax.lax.dynamic_update_index_in_dim(
                    outbuf, jnp.where(write, y, cur), m, 0
                )
                return (nxt, outbuf), None

            (_, outbuf), _ = jax.lax.scan(
                tick, (inbuf0, outbuf0), jnp.arange(M * V + S - 1)
            )

        # ---- LM head + CE on the last stage only ----
        def ce(outbuf):
            def mb_body(acc, xs):
                hid, lab, seg = xs
                x = qwen2._norm(tcfg, hid, local_params["text"]["norm"])
                logits = qwen2.unembed(local_params["text"], tcfg, x)
                sl = logits[:, :-1]
                sy = lab[:, 1:]
                mask = (sy != IGNORE_INDEX) & (seg[:, 1:] != 0)
                safe = jnp.where(mask, sy, 0)
                logp = jax.nn.log_softmax(sl.astype(jnp.float32), axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                tot, cnt = acc
                return (
                    tot + jnp.sum(nll * mask),
                    cnt + jnp.sum(mask).astype(jnp.float32),
                ), None

            (tot, cnt), _ = jax.lax.scan(
                mb_body,
                (jnp.float32(0.0), jnp.float32(0.0)),
                (outbuf, micro_lab, micro_seg),
            )
            return tot, cnt

        tot, cnt = jax.lax.cond(
            my == S - 1,
            ce,
            lambda _: (jnp.float32(0.0), jnp.float32(0.0)),
            outbuf,
        )
        # Differentiate a LOCAL numerator over the GLOBAL token count: under
        # check_vma=False, psum transposes to psum (not identity), so a psum
        # on the to-be-differentiated path would inflate every gradient by
        # the axis size. The global-loss value itself is psum'd behind a
        # stop_gradient for reporting only; grad_fn psums the per-device
        # gradient contributions explicitly.
        cnt_g = jax.lax.psum(cnt, ("data", "stage"))
        denom = jnp.maximum(cnt_g, 1.0)
        loss_local = tot / denom
        loss_metric = (
            jax.lax.psum(jax.lax.stop_gradient(tot), ("data", "stage")) / denom
        )
        return loss_local, {"loss": loss_metric, "tokens": cnt_g}

    return loss_fn


def make_pp_grad_fn(
    mesh: Mesh,
    cfg: RadVLMConfig,
    params_tree: Any,
    *,
    n_microbatches: int,
    remat: bool = True,
    attn_impl: str = "auto",
    interleave: int = 1,
):
    """shard_map'd fn(params, batch) -> (grads, metrics) with grads laid out
    like the PP param shardings (layer stacks over `stage`, rest replicated).
    `params_tree` must already be in the PP layout (interleave > 1: layer
    leaves folded [V, S, C, ...] — `shard_params_pp` does this).
    """
    shard_map = jax.shard_map

    _check_mesh(mesh, cfg, interleave=interleave, n_microbatches=n_microbatches)
    loss_fn = make_pp_loss_fn(
        mesh, cfg, n_microbatches=n_microbatches, remat=remat,
        attn_impl=attn_impl, interleave=interleave,
    )
    pspecs = pp_param_pspecs(params_tree, interleave)
    batch_spec = P(("data", "fsdp"))

    def grad_fn(local_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            local_params, batch, rng
        )
        # Layer grads live on one stage each (sum replicas over data); the
        # replicated leaves (embed/vision/lm_head/norms) accumulate their
        # contributions from every stage (vision+embed touch stage 0, the
        # head stage S-1) AND every data shard.
        def sync(path, g):
            if _LAYER_RE.search(path_str(path)):
                return jax.lax.psum(g, ("data", "fsdp"))
            return jax.lax.psum(g, ("data", "fsdp", "stage"))

        grads = jax.tree_util.tree_map_with_path(sync, grads)
        return grads, metrics

    def batch_specs(batch):
        return {k: batch_spec for k in batch}

    def wrapped(params, batch, rng=None):
        if rng is None:
            rng = jax.random.key(0)
        fn = shard_map(
            grad_fn,
            mesh=mesh,
            in_specs=(pspecs, batch_specs(batch), P()),
            out_specs=(pspecs, P()),
            check_vma=False,
        )
        return fn(params, batch, rng)

    return wrapped


@dataclasses.dataclass
class PPStepConfig:
    n_microbatches: int = 4
    remat: bool = True
    attn_impl: str = "auto"
    # Megatron-style virtual stages: V layer chunks per device, bubble / V.
    # Needs num_layers % (stages * V) == 0 and n_microbatches % stages == 0.
    interleave: int = 1


def setup_pp_training(
    mesh: Mesh,
    model_cfg: RadVLMConfig,
    train_cfg,
    params: Any,
    *,
    pp_cfg: Optional[PPStepConfig] = None,
):
    """One-call PP setup mirroring `train_step.setup_training`: shard params
    (layer stacks over `stage`), init the optimizer sharded, return
    (state, step_fn, tx). step_fn(state, device_batch) -> (state, metrics).

    Consumes `params`: the sharded copies may alias the caller's buffers and
    the donated step deletes them — don't reuse the input tree afterwards.
    """
    from radvlm_tpu.training.optimizer import make_optimizer
    from radvlm_tpu.training.train_step import TrainState

    pp_cfg = pp_cfg or PPStepConfig()
    _check_mesh(
        mesh, model_cfg, interleave=pp_cfg.interleave,
        n_microbatches=pp_cfg.n_microbatches,
    )
    tx, _ = make_optimizer(params, train_cfg)
    params = shard_params_pp(mesh, params, interleave=pp_cfg.interleave)
    opt_state = jax.jit(tx.init)(params)
    rep = NamedSharding(mesh, P())

    def _on_mesh(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
            return x
        return jax.device_put(x, rep)

    opt_state = jax.tree.map(_on_mesh, opt_state)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), rep),
        params=params,
        opt_state=opt_state,
    )
    grad_fn = make_pp_grad_fn(
        mesh, model_cfg, params,
        n_microbatches=pp_cfg.n_microbatches, remat=pp_cfg.remat,
        attn_impl=pp_cfg.attn_impl, interleave=pp_cfg.interleave,
    )

    needs_rng = model_cfg.resampler.kind == "masked_drop"

    def step_fn(state: TrainState, batch):
        rng = (
            jax.random.fold_in(jax.random.key(0), state.step)
            if needs_rng else jax.random.key(0)
        )
        grads, metrics = grad_fn(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1, params=new_params, opt_state=opt_state
            ),
            metrics,
        )

    return state, jax.jit(step_fn, donate_argnums=(0,)), tx


def make_pp_lora_grad_fn(
    mesh: Mesh,
    cfg: RadVLMConfig,
    lora_cfg,
    adapters_tree: Any,
    base_tree: Any,
    *,
    n_microbatches: int,
    remat: bool = True,
    attn_impl: str = "auto",
    interleave: int = 1,
):
    """shard_map'd fn(adapters, base, batch, rng) -> (adapter_grads, metrics).

    LoRA/QLoRA over the pipeline (reference peft injection `train.py:1515-1532`
    + 4/8-bit base prep `:1466-1503`): every adapter target lives under
    `text/layers/`, so the adapter tree folds/shards exactly like the base
    layer stacks and `merge_lora` runs on the LOCAL shard inside shard_map
    (path strings are shard-invariant). Both trees must already be in the PP
    layout (`shard_params_pp`)."""
    shard_map = jax.shard_map

    _check_mesh(mesh, cfg, interleave=interleave, n_microbatches=n_microbatches)
    loss_fn = make_pp_loss_fn(
        mesh, cfg, n_microbatches=n_microbatches, remat=remat,
        attn_impl=attn_impl, interleave=interleave,
    )
    a_specs = pp_param_pspecs(adapters_tree, interleave)
    b_specs = pp_param_pspecs(base_tree, interleave)
    batch_spec = P(("data", "fsdp"))

    def grad_fn(local_adapters, local_base, batch, rng):
        from radvlm_tpu.ops import quant
        from radvlm_tpu.training.lora import merge_lora

        def lora_loss(adapters):
            # A quantized frozen base (QLoRA) must matmul via differentiable
            # dequant — the W8A8 round / Pallas int8 kernels have no gradient.
            with quant.training_mode():
                merged = merge_lora(local_base, adapters, lora_cfg)
                return loss_fn(merged, batch, rng)

        (loss, metrics), grads = jax.value_and_grad(lora_loss, has_aux=True)(
            local_adapters
        )

        def sync(path, g):
            if _LAYER_RE.search(path_str(path)):
                return jax.lax.psum(g, ("data", "fsdp"))
            return jax.lax.psum(g, ("data", "fsdp", "stage"))

        grads = jax.tree_util.tree_map_with_path(sync, grads)
        return grads, metrics

    def wrapped(adapters, base, batch, rng=None):
        if rng is None:
            rng = jax.random.key(0)
        fn = shard_map(
            grad_fn,
            mesh=mesh,
            in_specs=(a_specs, b_specs, {k: batch_spec for k in batch}, P()),
            out_specs=(a_specs, P()),
            check_vma=False,
        )
        return fn(adapters, base, batch, rng)

    return wrapped


def setup_pp_lora_training(
    mesh: Mesh,
    model_cfg: RadVLMConfig,
    train_cfg,
    lora_cfg,
    base_params: Any,
    *,
    seed: int = 0,
    pp_cfg: Optional[PPStepConfig] = None,
):
    """PP x LoRA setup mirroring `train_step.setup_lora_training`: the frozen
    base (dense or int8-quantized — QLoRA) shards its layer stacks over
    `stage`, adapters shard the same way, AdamW over adapters only. Returns
    (state, base, step_fn); step_fn(state, base, device_batch). Consumes
    neither tree destructively, but `base_params` buffers may be aliased into
    the returned `base` — don't mutate the input afterwards."""
    import optax as _optax

    from radvlm_tpu.training.lora import init_lora
    from radvlm_tpu.training.optimizer import make_schedule
    from radvlm_tpu.training.train_step import TrainState

    pp_cfg = pp_cfg or PPStepConfig()
    _check_mesh(
        mesh, model_cfg, interleave=pp_cfg.interleave,
        n_microbatches=pp_cfg.n_microbatches,
    )
    adapters = init_lora(base_params, lora_cfg, jax.random.key(seed))
    base = shard_params_pp(mesh, base_params, interleave=pp_cfg.interleave)
    adapters = shard_params_pp(mesh, adapters, interleave=pp_cfg.interleave)
    tx = _optax.chain(
        _optax.clip_by_global_norm(train_cfg.max_grad_norm),
        _optax.adamw(
            make_schedule(train_cfg, train_cfg.learning_rate),
            b1=train_cfg.adam_b1, b2=train_cfg.adam_b2, eps=train_cfg.adam_eps,
            weight_decay=train_cfg.weight_decay,
        ),
    )
    if train_cfg.grad_accum_steps > 1:
        tx = _optax.MultiSteps(tx, train_cfg.grad_accum_steps)
    opt_state = jax.jit(tx.init)(adapters)
    rep = NamedSharding(mesh, P())

    def _on_mesh(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
            return x
        return jax.device_put(x, rep)

    opt_state = jax.tree.map(_on_mesh, opt_state)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), rep),
        params=adapters,
        opt_state=opt_state,
    )
    grad_fn = make_pp_lora_grad_fn(
        mesh, model_cfg, lora_cfg, adapters, base,
        n_microbatches=pp_cfg.n_microbatches, remat=pp_cfg.remat,
        attn_impl=pp_cfg.attn_impl, interleave=pp_cfg.interleave,
    )
    needs_rng = model_cfg.resampler.kind == "masked_drop"

    def step_fn(state: TrainState, base_params, batch):
        rng = (
            jax.random.fold_in(jax.random.key(0), state.step)
            if needs_rng else jax.random.key(0)
        )
        grads, metrics = grad_fn(state.params, base_params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_adapters = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1, params=new_adapters, opt_state=opt_state
            ),
            metrics,
        )

    return state, base, jax.jit(step_fn, donate_argnums=(0,))


def put_batch_pp(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Host batch -> device, batch dim over `data`, replicated over `stage`.

    Delegates to the shared batch-placement rules so PP callers and the
    training loop (which uses `train_step.put_batch`) cannot drift; with
    seq=1 (PP invariant) both produce P(("data", "fsdp")) on every leaf."""
    from radvlm_tpu.parallel import sharding as shardlib

    return jax.device_put(batch, shardlib.batch_shardings(mesh, batch))
