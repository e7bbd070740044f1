"""Unit tests: adjacency construction, SpMM vs dense, pooling, dropouts."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_tpu.ops.adjacency import build_adjacency
from gcn_tpu.ops.dropout import (
    drop_edges,
    dropout,
    embedding_dropout_mask,
    forget_deprels,
)
from gcn_tpu.ops.pooling import pool, triple_pool
from gcn_tpu.ops.spmm import node_degrees, spmm_forward, spmm_reverse


def random_edges(rng, b, n, e):
    parent = rng.randint(0, n, (b, e)).astype(np.int32)
    child = rng.randint(0, n, (b, e)).astype(np.int32)
    mask = rng.rand(b, e) < 0.7
    return parent, child, mask


class TestAdjacency:
    def test_scatter_and_degrees(self):
        parent = np.array([[0, 0, 1]], np.int32)
        child = np.array([[1, 2, 3]], np.int32)
        mask = np.array([[True, True, True]])
        adj = build_adjacency(parent, child, mask, 5)
        f = np.asarray(adj.forward[0])
        assert f[0, 1] == 1 and f[0, 2] == 1 and f[1, 3] == 1
        assert f.sum() == 3
        assert np.asarray(adj.incident[0]).tolist() == [
            True, True, True, True, False
        ]
        # denom: deg_out + deg_in + incident + 1
        np.testing.assert_array_equal(
            np.asarray(adj.denom[0, :, 0]), [4, 4, 3, 3, 1]
        )
        assert np.asarray(adj.pool_mask[0]).tolist() == [
            False, False, False, False, True
        ]

    def test_padded_edges_ignored(self):
        parent = np.zeros((1, 4), np.int32)
        child = np.zeros((1, 4), np.int32)
        mask = np.zeros((1, 4), bool)
        adj = build_adjacency(parent, child, mask, 3)
        assert np.asarray(adj.forward).sum() == 0
        assert not np.asarray(adj.incident).any()

    def test_combined_matches_reference_structure(self):
        parent = np.array([[1]], np.int32)
        child = np.array([[0]], np.int32)
        mask = np.array([[True]])
        adj = build_adjacency(parent, child, mask, 3)
        c = np.asarray(adj.combined[0])
        expected = np.zeros((3, 3))
        expected[1, 0] = 1  # forward
        expected[0, 1] = 1  # reverse
        expected[0, 0] = expected[1, 1] = 1  # self loops on incident
        np.testing.assert_array_equal(c, expected)


class TestSpmm:
    def test_forward_matches_dense(self):
        rng = np.random.RandomState(0)
        b, n, e, h = 3, 10, 14, 6
        parent, child, mask = random_edges(rng, b, n, e)
        x = jnp.asarray(rng.randn(b, n, h), jnp.float32)
        adj = build_adjacency(parent, child, mask, n)
        dense = jnp.matmul(adj.forward, x)
        sparse = spmm_forward(x, parent, child, mask)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(dense), atol=1e-5
        )

    def test_reverse_matches_dense(self):
        rng = np.random.RandomState(1)
        b, n, e, h = 2, 8, 11, 5
        parent, child, mask = random_edges(rng, b, n, e)
        x = jnp.asarray(rng.randn(b, n, h), jnp.float32)
        adj = build_adjacency(parent, child, mask, n)
        dense = jnp.matmul(adj.reverse, x)
        sparse = spmm_reverse(x, parent, child, mask)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(dense), atol=1e-5
        )

    def test_gated_matches_dense(self):
        rng = np.random.RandomState(2)
        b, n, e, h = 2, 7, 9, 4
        parent, child, mask = random_edges(rng, b, n, e)
        x = jnp.asarray(rng.randn(b, n, h), jnp.float32)
        g = jnp.asarray(rng.randn(b, n, h), jnp.float32)
        adj = build_adjacency(parent, child, mask, n)
        dense = jnp.matmul(adj.forward, g * x)
        sparse = spmm_forward(x, parent, child, mask, gate=g)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(dense), atol=1e-5
        )

    def test_degrees_match_adjacency(self):
        rng = np.random.RandomState(3)
        b, n, e = 2, 9, 12
        parent, child, mask = random_edges(rng, b, n, e)
        adj = build_adjacency(parent, child, mask, n)
        deg_out, deg_in, incident = node_degrees(parent, child, mask, n)
        np.testing.assert_array_equal(
            np.asarray(deg_out), np.asarray(adj.forward.sum(2))
        )
        np.testing.assert_array_equal(
            np.asarray(incident), np.asarray(adj.incident)
        )


class TestPooling:
    def test_max_avg_sum(self):
        h = jnp.asarray([[[1.0, 5.0], [3.0, 2.0], [9.0, 9.0]]])
        mask = jnp.asarray([[False, False, True]])  # exclude last token
        np.testing.assert_allclose(np.asarray(pool(h, mask, "max"))[0], [3, 5])
        np.testing.assert_allclose(np.asarray(pool(h, mask, "avg"))[0], [2, 3.5])
        np.testing.assert_allclose(np.asarray(pool(h, mask, "sum"))[0], [4, 7])

    def test_all_masked_avg_is_finite(self):
        h = jnp.ones((1, 3, 2))
        mask = jnp.ones((1, 3), bool)
        out = np.asarray(pool(h, mask, "avg"))
        assert np.isfinite(out).all() and (out == 0).all()

    def test_triple_pool_concats(self):
        h = jnp.ones((2, 4, 3))
        m = jnp.zeros((2, 4), bool)
        out = triple_pool(h, m, m, m, "max")
        assert out.shape == (2, 9)


class TestDropout:
    def test_deterministic_passthrough(self):
        x = jnp.ones((4, 5))
        assert (np.asarray(dropout(None, x, 0.5, True)) == 1).all()

    def test_rate_statistics(self):
        key = jax.random.key(0)
        x = jnp.ones((100, 100))
        y = np.asarray(dropout(key, x, 0.3, False))
        frac = (y == 0).mean()
        assert 0.25 < frac < 0.35
        # inverted scaling preserves expectation
        assert abs(y.mean() - 1.0) < 0.05

    def test_embedding_dropout_type_consistency(self):
        key = jax.random.key(1)
        ids = jnp.asarray([[3, 3, 3, 7, 7]])
        mult = embedding_dropout_mask(key, ids, 10, 0.5, False)
        m = np.asarray(mult)[0, :, 0]
        assert m[0] == m[1] == m[2]  # same type, same fate
        assert m[3] == m[4]

    def test_drop_edges(self):
        key = jax.random.key(2)
        adj = jnp.ones((1, 50, 50))
        out = np.asarray(drop_edges(key, adj, 0.6, False))
        assert 0.5 < out.mean() < 0.7
        assert set(np.unique(out)) <= {0.0, 1.0}

    def test_forget_deprels_sets_ones_rowwise(self):
        key = jax.random.key(3)
        e = jnp.full((1, 200, 4), 5.0)
        out = np.asarray(forget_deprels(key, e, 0.5, False))
        rows = out[0]
        is_kept = (rows == 5.0).all(axis=1)
        is_ones = (rows == 1.0).all(axis=1)
        assert (is_kept | is_ones).all()
        assert 0.3 < is_kept.mean() < 0.7
