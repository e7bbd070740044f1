"""The MoE-style grouped-matmul Pallas kernel (ops.pallas.grouped_matmul)
vs ``lax.ragged_dot``: forward and both gradients, over random group
distributions including empty groups, group boundaries on/off tile
boundaries, and m not a multiple of the tile."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gcn_tpu.ops.pallas.grouped_matmul import TILE_M, grouped_matmul


def _case(rng, m, t, h, r):
    ids = np.sort(rng.randint(0, r, m)).astype(np.int32)
    gs = np.bincount(ids, minlength=r).astype(np.int32)
    x = jnp.asarray(rng.randn(m, t), jnp.float32)
    s = jnp.asarray(rng.randn(r, t, h), jnp.float32)
    g = jnp.asarray(rng.randn(m, h), jnp.float32)
    return x, s, jnp.asarray(gs), g


@pytest.mark.parametrize("seed", range(6))
def test_forward_and_grads_random(seed):
    rng = np.random.RandomState(seed)
    m = int(rng.randint(5, 600))
    t = int(rng.randint(3, 80))
    h = int(rng.randint(3, 80))
    r = int(rng.randint(2, 40))
    x, s, gs, g = _case(rng, m, t, h, r)

    ref = lax.ragged_dot(x, s, gs)
    out = grouped_matmul(x, s, gs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, x, s):
        return jnp.vdot(fn(x, s), g)

    gr = jax.grad(lambda x, s: loss(lambda a, b: lax.ragged_dot(a, b, gs),
                                    x, s), argnums=(0, 1))(x, s)
    gn = jax.grad(lambda x, s: loss(lambda a, b: grouped_matmul(a, b, gs),
                                    x, s), argnums=(0, 1))(x, s)
    for a, b, name in zip(gr, gn, ("dx", "ds")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_tile_boundary_exact():
    """Groups starting exactly on tile boundaries + an empty group."""
    rng = np.random.RandomState(0)
    r = 4
    gs = np.array([TILE_M, 0, TILE_M // 2, TILE_M // 2], np.int32)
    m = int(gs.sum())
    x = jnp.asarray(rng.randn(m, 16), jnp.float32)
    s = jnp.asarray(rng.randn(r, 16, 24), jnp.float32)
    ref = lax.ragged_dot(x, s, jnp.asarray(gs))
    out = grouped_matmul(x, s, jnp.asarray(gs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the empty group's dS must be exactly zero, not uninitialized
    ds = jax.grad(lambda s: grouped_matmul(x, s, jnp.asarray(gs)).sum())(s)
    assert np.all(np.asarray(ds[1]) == 0.0)


def test_single_group_is_plain_matmul():
    rng = np.random.RandomState(1)
    m, t, h = 200, 32, 16
    x = jnp.asarray(rng.randn(m, t), jnp.float32)
    s = jnp.asarray(rng.randn(1, t, h), jnp.float32)
    gs = jnp.asarray(np.array([m], np.int32))
    np.testing.assert_allclose(
        np.asarray(grouped_matmul(x, s, gs)),
        np.asarray(x @ s[0]), rtol=1e-5, atol=1e-5,
    )


def test_bfloat16():
    rng = np.random.RandomState(2)
    x, s, gs, g = _case(rng, 300, 40, 24, 9)
    out = grouped_matmul(x.astype(jnp.bfloat16), s.astype(jnp.bfloat16), gs)
    ref = lax.ragged_dot(x, s, gs)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=5e-2, atol=1e-1)
