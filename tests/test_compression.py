"""int8-compressed all-reduce (parallel/compression.py — ZeRO++ qgZ analog):
numeric closeness to exact psum, padding/odd shapes, and a cross-slice
data-parallel training sync that keeps replicas bit-identical while the loss
decreases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from radvlm_tpu.parallel.compression import (
    quantized_grad_sync,
    quantized_psum,
)


def _mesh(n=8, name="dcn"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


@pytest.mark.parametrize("shape", [(8, 4096), (8, 1000), (8, 7), (8,)])
def test_quantized_psum_close_to_exact(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mesh = _mesh()

    def body(xs):
        return quantized_psum(xs, "dcn", block=256)

    got = shard_map(body, mesh=mesh, in_specs=P("dcn"), out_specs=P("dcn"))(x)
    exact = np.asarray(x).sum(axis=0, keepdims=True).repeat(8, axis=0) \
        if x.ndim > 1 else np.full((8,), np.asarray(x).sum())
    got = np.asarray(got)
    # two int8 stages: ~1/127 relative error each, against the block amax
    tol = 2.5 / 127 * np.max(np.abs(np.asarray(x)), axis=0) * 8
    assert np.all(np.abs(got - exact) <= tol + 1e-6)
    # every replica holds the SAME reduced value (bit-identical broadcast)
    assert all(np.array_equal(got[0], row) for row in got) or x.ndim == 1


def test_quantized_psum_bf16_roundtrip_dtype():
    x = jnp.ones((8, 64), jnp.bfloat16)
    mesh = _mesh()
    out = shard_map(
        lambda xs: quantized_psum(xs, "dcn", block=64),
        mesh=mesh, in_specs=P("dcn"), out_specs=P("dcn"),
    )(x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 8.0, rtol=0.02)


@pytest.mark.slow
def test_cross_slice_dp_training_sync():
    """Mini 2-'slice' data-parallel training: per-slice grads synced with
    quantized_grad_sync keep replica params IDENTICAL (same quantized sum
    broadcast everywhere) and the loss decreases."""
    rng = np.random.default_rng(1)
    W_true = rng.normal(size=(16, 4)).astype(np.float32)
    W = jnp.zeros((16, 4), jnp.float32)
    X = jnp.asarray(rng.normal(size=(8, 32, 16)).astype(np.float32))
    Y = jnp.asarray(np.asarray(X) @ W_true)  # realizable target
    mesh = _mesh()

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    def step(w, x, y):
        # w replicated, (x, y) sharded over the slice axis
        loss, g = jax.value_and_grad(loss_fn)(w, x, y)
        g = quantized_grad_sync({"w": g}, "dcn")["w"]
        return w - 0.1 * g, jax.lax.pmean(loss, "dcn")

    # check_vma=False: the all_to_all in quantized_psum defeats shard_map's
    # replication inference; test_quantized_psum_close_to_exact asserts the
    # bit-identical broadcast property directly.
    stepped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("dcn"), P("dcn")), out_specs=(P(), P()),
        check_vma=False,
    )
    w = W
    losses = []
    for _ in range(10):
        w, loss = stepped(w, X, Y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5
    assert np.all(np.isfinite(np.asarray(w)))
