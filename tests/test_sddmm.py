"""SDDMM kernel vs XLA gather formulation; edge softmax properties."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.ops.pallas.sddmm import edge_softmax, sddmm, sddmm_ref


def make(rng, b, n, e, h):
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    child = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < 0.7
    u = jnp.asarray(rng.randn(b, n, h), jnp.float32)
    v = jnp.asarray(rng.randn(b, n, h), jnp.float32)
    return parent, child, mask, u, v


def test_forward_matches_gather():
    rng = np.random.RandomState(0)
    parent, child, mask, u, v = make(rng, 3, 11, 13, 8)
    out = sddmm(parent, child, mask, u, v)
    ref = sddmm_ref(parent, child, mask, u, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_masked_edges_zero():
    rng = np.random.RandomState(1)
    parent, child, mask, u, v = make(rng, 2, 6, 7, 4)
    out = np.asarray(sddmm(parent, child, mask, u, v))
    assert (out[~mask] == 0).all()


def test_grads_match():
    rng = np.random.RandomState(2)
    parent, child, mask, u, v = make(rng, 2, 8, 9, 5)
    gk = jax.grad(
        lambda u_, v_: (sddmm(parent, child, mask, u_, v_) ** 2).sum(),
        argnums=(0, 1),
    )(u, v)
    gr = jax.grad(
        lambda u_, v_: (sddmm_ref(parent, child, mask, u_, v_) ** 2).sum(),
        argnums=(0, 1),
    )(u, v)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)


def test_edge_softmax_sums_to_one_per_parent():
    rng = np.random.RandomState(3)
    b, n, e = 2, 6, 10
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < 0.8
    scores = jnp.asarray(rng.randn(b, e), jnp.float32)
    alpha = np.asarray(edge_softmax(parent, scores, mask, n))
    assert (alpha[~mask] == 0).all()
    # per (batch, parent) sums are 1 where the node has ≥1 valid edge
    for bi in range(b):
        for node in range(n):
            sel = (parent[bi] == node) & mask[bi]
            if sel.any():
                np.testing.assert_allclose(alpha[bi][sel].sum(), 1.0,
                                           atol=1e-5)
