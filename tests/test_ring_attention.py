"""Ring attention vs full single-device attention on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from radvlm_tpu.ops.attention import make_attention_mask, mha_reference
from radvlm_tpu.parallel.ring import make_ring_attention, _merge


def _mesh(n=8):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs, ("seq",))


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape), jnp.float32)


@pytest.mark.parametrize("gqa", [1, 2])
def test_ring_matches_full_causal(rng, gqa):
    mesh = _mesh(8)
    b, s, h, d = 2, 8 * 32, 4, 16
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h // gqa, d))
    v = _rand(rng, (b, s, h // gqa, d))
    seg = np.ones((b, s), np.int32)
    seg[0, 200:] = 0  # padding tail crossing shard boundaries
    seg = jnp.asarray(seg)

    ring = make_ring_attention(mesh, axis_name="seq", impl="xla")
    out = ring(q, k, v, seg, seg)

    ref = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


def test_ring_packed_segments(rng):
    mesh = _mesh(8)
    b, s, h, d = 1, 8 * 16, 2, 8
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = np.zeros((b, s), np.int32)
    seg[0, :50] = 1
    seg[0, 50:100] = 2  # second packed segment spans shards
    seg = jnp.asarray(seg)
    ring = make_ring_attention(mesh, axis_name="seq", impl="xla")
    out = ring(q, k, v, seg, seg)
    ref = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_ring_grad_flows(rng):
    """Backward works through ppermute + cond (remat-style recompute)."""
    mesh = _mesh(4)
    b, s, h, d = 1, 4 * 16, 2, 8
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = jnp.ones((b, s), jnp.int32)
    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))
    ring = make_ring_attention(mesh, axis_name="seq", impl="xla")

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v, seg, seg) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_merge_identity():
    # Merging a partial with an all--inf lse leaves the accumulator unchanged.
    b, s, h, d = 1, 4, 2, 8
    o = jnp.ones((b, s, h, d), jnp.float32)
    m = jnp.zeros((b, h, s))
    l = jnp.ones((b, h, s))
    o2, m2, l2 = _merge(o, m, l, jnp.zeros_like(o), jnp.full((b, h, s), -jnp.inf))
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l))


@pytest.mark.slow
def test_ring_flash_impl_grad_parity(rng):
    """The TPU local path (impl="flash", Pallas kernel in interpret mode) is
    differentiable end to end through the ring merge — the shipped SP training
    configuration (ADVICE r1 high: this path previously failed at trace time)."""
    mesh = _mesh(2)
    b, s, h, d = 1, 2 * 128, 2, 64
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = np.ones((b, s), np.int32)
    seg[0, 200:] = 0  # padding tail on the second shard
    seg = jnp.asarray(seg)

    ring = make_ring_attention(mesh, axis_name="seq", impl="flash",
                               interpret=True)

    def loss_ring(q, k, v):
        o = ring(q, k, v, seg, seg)
        return jnp.sum((o * (seg != 0)[:, :, None, None]) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
        return jnp.sum((o.astype(jnp.float32) * (seg != 0)[:, :, None, None]) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def _zz(x, perm):
    return x[:, perm]


def test_zigzag_indices_layout():
    from radvlm_tpu.parallel.ring import inverse_zigzag_indices, zigzag_indices

    p = zigzag_indices(16, 4)  # 8 chunks of 2; rank i -> chunks (i, 7-i)
    assert list(p) == [0, 1, 14, 15, 2, 3, 12, 13, 4, 5, 10, 11, 6, 7, 8, 9]
    inv = inverse_zigzag_indices(16, 4)
    assert list(np.asarray(p)[inv]) == list(range(16))


def test_zigzag_schedule_balanced():
    """Per ring step t>0 every rank computes exactly 2 half-chunk pairs (3 at
    t=0) — the load-balance property the contiguous schedule lacks."""
    n = 4
    for t in range(n):
        for i in range(n):
            src = (i - t) % n
            live = 1  # hi x lo always
            live += int(src <= i)   # lo x lo (full or diag)
            live += int(src >= i)   # hi x hi (full or diag)
            assert live == (3 if t == 0 else 2), (t, i, live)


@pytest.mark.parametrize("gqa", [1, 2])
@pytest.mark.slow
def test_zigzag_matches_full_causal(rng, gqa):
    from radvlm_tpu.parallel.ring import (
        inverse_zigzag_indices,
        make_ring_attention,
        zigzag_indices,
    )

    mesh = _mesh(4)
    b, s, h, d = 2, 4 * 32, 4, 16
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h // gqa, d))
    v = _rand(rng, (b, s, h // gqa, d))
    seg = np.ones((b, s), np.int32)
    seg[0, 100:] = 0  # padding tail
    seg[1, :40] = 1
    seg[1, 40:90] = 2  # packed segments crossing chunk boundaries
    seg[1, 90:] = 0
    seg = jnp.asarray(seg)

    perm = zigzag_indices(s, 4)
    inv = inverse_zigzag_indices(s, 4)
    ring = make_ring_attention(mesh, axis_name="seq", impl="xla",
                               schedule="zigzag")
    out_zz = ring(_zz(q, perm), _zz(k, perm), _zz(v, perm),
                  _zz(seg, perm), _zz(seg, perm))
    out = np.asarray(out_zz)[:, inv]

    ref = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(
        out * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_zigzag_grad_parity(rng):
    from radvlm_tpu.parallel.ring import (
        inverse_zigzag_indices,
        make_ring_attention,
        zigzag_indices,
    )

    mesh = _mesh(2)
    b, s, h, d = 1, 2 * 32, 2, 8
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = jnp.ones((b, s), jnp.int32)
    perm = zigzag_indices(s, 2)
    inv = inverse_zigzag_indices(s, 2)
    ring = make_ring_attention(mesh, axis_name="seq", impl="xla",
                               schedule="zigzag")

    def loss_zz(q, k, v):
        o = ring(_zz(q, perm), _zz(k, perm), _zz(v, perm),
                 _zz(seg, perm), _zz(seg, perm))
        return jnp.sum(o[:, inv].astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, mask=make_attention_mask(seg, seg, True))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_zz = jax.grad(loss_zz, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_zz, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


@pytest.mark.slow
def test_zigzag_16k_prefill_parity(rng):
    """Long-context prefill: zigzag vs contiguous ring agree at 16k tokens on
    the 8-rank mesh (O(S^2/N) memory each — a full reference would need the
    [S, S] score matrix)."""
    from radvlm_tpu.parallel.ring import (
        inverse_zigzag_indices,
        make_ring_attention,
        zigzag_indices,
    )

    mesh = _mesh(8)
    b, s, h, d = 1, 16384, 1, 16
    q = _rand(rng, (b, s, h, d))
    k = _rand(rng, (b, s, h, d))
    v = _rand(rng, (b, s, h, d))
    seg = np.ones((b, s), np.int32)
    seg[0, 15000:] = 0
    seg = jnp.asarray(seg)

    contig = make_ring_attention(mesh, axis_name="seq", impl="xla",
                                 schedule="contiguous")
    out_c = np.asarray(contig(q, k, v, seg, seg))

    perm = zigzag_indices(s, 8)
    inv = inverse_zigzag_indices(s, 8)
    zz = make_ring_attention(mesh, axis_name="seq", impl="xla",
                             schedule="zigzag")
    out_z = np.asarray(zz(_zz(q, perm), _zz(k, perm), _zz(v, perm),
                          _zz(seg, perm), _zz(seg, perm)))[:, inv]
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(out_z * valid, out_c * valid,
                               atol=3e-5, rtol=3e-5)
