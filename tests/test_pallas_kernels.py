"""Pallas kernels vs dense-XLA reference (interpret mode on CPU):
deprel bilinear (v1 + v2), fused edge-list SpMM.
Forward and custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_tpu.ops.adjacency import build_adjacency
from gcn_tpu.ops.gcn_layers import bilinear_traverse, regular_layer
from gcn_tpu.ops.pallas.deprel_bilinear import (
    deprel_bilinear,
    deprel_bilinear_batched,
    deprel_bilinear_v2,
)
from gcn_tpu.ops.pallas.spmm_fused import (
    fused_gcn_spmm,
    onehot_adjacency,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    m, t, d, h = 96, 40, 9, 24
    return dict(
        rng=rng, m=m, t=t, d=d, h=h,
        x=jnp.asarray(rng.randn(m, t), jnp.float32),
        e=jnp.asarray(rng.randn(m, d), jnp.float32),
        w=jnp.asarray(rng.randn(d, t, h) * 0.1, jnp.float32),
        b=jnp.asarray(rng.randn(d, h) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("fn", [deprel_bilinear, deprel_bilinear_v2])
def test_bilinear_forward(data, fn):
    out = fn(data["x"], data["e"], data["w"], data["b"], 32)
    ref = bilinear_traverse(
        data["x"][None], data["e"][None], data["w"], data["b"]
    )[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("fn", [deprel_bilinear, deprel_bilinear_v2])
def test_bilinear_grads(data, fn):
    args = (data["x"], data["e"], data["w"], data["b"])
    g1 = jax.grad(lambda *a: (fn(*a, 32) ** 2).sum(), argnums=(0, 1, 2))(
        *args
    )
    g2 = jax.grad(
        lambda *a: (bilinear_traverse(a[0][None], a[1][None], a[2], a[3])[0]
                    ** 2).sum(),
        argnums=(0, 1, 2),
    )(*args)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-3,
                                   rtol=1e-4)


def test_bilinear_batched_shape(data):
    x3 = data["x"].reshape(4, 24, -1)
    e3 = data["e"].reshape(4, 24, -1)
    out = deprel_bilinear_batched(x3, e3, data["w"], data["b"], tile_m=32)
    assert out.shape == (4, 24, data["h"])


def test_bilinear_unaligned_tail(data):
    """M not divisible by tile_m: trailing partial tile must be exact."""
    x = data["x"][:70]
    e = data["e"][:70]
    out = deprel_bilinear(x, e, data["w"], data["b"], 32)
    ref = bilinear_traverse(x[None], e[None], data["w"], data["b"])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestFusedSpmm:
    def setup_method(self):
        rng = np.random.RandomState(2)
        b, n, e, t, h = 4, 14, 14, 22, 18
        self.parent = rng.randint(0, n, (b, e)).astype(np.int32)
        self.child = rng.randint(0, n, (b, e)).astype(np.int32)
        self.mask = rng.rand(b, e) < 0.7
        self.n = n
        self.h = jnp.asarray(rng.randn(b, n, t), jnp.float32)
        self.w = jnp.asarray(rng.randn(t, h) * 0.1, jnp.float32)
        self.b = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)

    def test_onehot_adjacency_equals_scatter(self):
        adj = build_adjacency(self.parent, self.child, self.mask, self.n)
        a1 = onehot_adjacency(self.parent, self.child, self.mask, self.n)
        np.testing.assert_array_equal(np.asarray(a1),
                                      np.asarray(adj.forward))

    def test_matches_xla_regular_layer(self):
        adj = build_adjacency(self.parent, self.child, self.mask, self.n)
        ref = jax.nn.relu(
            regular_layer(self.h, adj.combined, self.w, self.b) / adj.denom
        )
        out = fused_gcn_spmm(self.parent, self.child, self.mask, self.h,
                             self.w, self.b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grads(self):
        adj = build_adjacency(self.parent, self.child, self.mask, self.n)
        gk = jax.grad(
            lambda h, w, b: (fused_gcn_spmm(self.parent, self.child,
                                            self.mask, h, w, b) ** 2).sum(),
            argnums=(0, 1, 2),
        )(self.h, self.w, self.b)
        gr = jax.grad(
            lambda h, w, b: (jax.nn.relu(
                regular_layer(h, adj.combined, w, b) / adj.denom
            ) ** 2).sum(),
            argnums=(0, 1, 2),
        )(self.h, self.w, self.b)
        for a, c in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-4)

    def test_empty_graph(self):
        mask = np.zeros_like(self.mask)
        out = fused_gcn_spmm(self.parent, self.child, mask, self.h,
                             self.w, self.b)
        # no edges: out = relu((h W + 2b) / 1)
        ref = jax.nn.relu(jnp.matmul(self.h, self.w) + 2 * self.b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
