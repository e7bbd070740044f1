"""Fused band aggregation kernel vs the XLA dense formulation, and vs the
model's dense diagonal/full deprel layers."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.ops.adjacency import build_adjacency
from gcn_tpu.ops.gcn_layers import diagonal_deprel_layer
from gcn_tpu.ops.pallas.band_aggregate import (
    band_ref_math,
    fused_band_aggregate,
)


def make_graph(rng, b, n, e):
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    child = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < 0.7
    return parent, child, mask


def test_forward_matches_ref_math():
    rng = np.random.RandomState(0)
    b, n, e, h = 3, 12, 12, 16
    parent, child, mask = make_graph(rng, b, n, e)
    xs = [jnp.asarray(rng.randn(b, n, h), jnp.float32) for _ in range(3)]
    out = fused_band_aggregate(parent, child, mask, *xs)
    ref = band_ref_math(parent, child, mask, *xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_no_relu_variant():
    rng = np.random.RandomState(1)
    b, n, e, h = 2, 8, 8, 6
    parent, child, mask = make_graph(rng, b, n, e)
    xs = [jnp.asarray(rng.randn(b, n, h), jnp.float32) for _ in range(3)]
    out = fused_band_aggregate(parent, child, mask, *xs, False)
    ref = band_ref_math(parent, child, mask, *xs, relu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert (np.asarray(out) < 0).any()  # negative values survive


def test_matches_dense_diagonal_layer():
    """Kernel with gated inputs ≡ dense diagonal_deprel layer + denom + relu."""
    rng = np.random.RandomState(2)
    b, n, e, hd = 2, 10, 10, 12
    parent, child, mask = make_graph(rng, b, n, e)
    h = jnp.asarray(rng.randn(b, n, hd), jnp.float32)
    e_f = jnp.asarray(rng.randn(b, n, hd), jnp.float32)
    e_r = jnp.asarray(rng.randn(b, n, hd), jnp.float32)
    e_s = jnp.asarray(rng.randn(1, 1, hd), jnp.float32)
    adj = build_adjacency(parent, child, mask, n)
    dense = jax.nn.relu(
        diagonal_deprel_layer(h, adj.forward, e_f, e_r, e_s) / adj.denom
    )
    fused = fused_band_aggregate(
        parent, child, mask, e_f * h, e_r * h,
        jnp.broadcast_to(e_s * h, h.shape),
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               atol=1e-5)


def test_grads_match():
    rng = np.random.RandomState(3)
    b, n, e, h = 2, 9, 9, 8
    parent, child, mask = make_graph(rng, b, n, e)
    xs = tuple(jnp.asarray(rng.randn(b, n, h), jnp.float32)
               for _ in range(3))
    gk = jax.grad(
        lambda a, b_, c: (fused_band_aggregate(parent, child, mask,
                                               a, b_, c) ** 2).sum(),
        argnums=(0, 1, 2),
    )(*xs)
    gr = jax.grad(
        lambda a, b_, c: (band_ref_math(parent, child, mask,
                                        a, b_, c) ** 2).sum(),
        argnums=(0, 1, 2),
    )(*xs)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)
