"""Native C++ graph builder vs Python pruning — exact equivalence on the
reference golden records and on random trees; dataset integration."""

import numpy as np
import pytest

from gcn_tpu.graph.native import (
    native_available,
    prune_graph_batch_native,
)
from gcn_tpu.graph.prune import prune_graph
from tests.conftest import load_golden

needs_native = pytest.mark.skipif(
    not native_available(), reason="libgraphbuilder.so not built"
)


@needs_native
def test_matches_python_on_reference_goldens():
    z = load_golden("prune_goldens.npz")
    num = int(z["num"])
    for j in range(num):
        n = int(z[f"n_{j}"])
        k = int(z[f"prune_{j}"])
        heads = z[f"head_{j}"].astype(np.int32)[None, :]
        deprels = z[f"deprel_{j}"].astype(np.int32)[None, :]
        subj = z[f"subj_pos_{j}"].astype(np.int32)[None, :]
        obj = z[f"obj_pos_{j}"].astype(np.int32)[None, :]
        lengths = np.array([n], np.int32)
        ep, ec, ed, em, keep, ne, roots = prune_graph_batch_native(
            heads, deprels, subj, obj, lengths, k
        )
        g = prune_graph(heads[0], deprels[0], n, k, subj[0], obj[0])
        assert int(ne[0]) == g.num_edges
        np.testing.assert_array_equal(ep[0, : ne[0]], g.edge_parent)
        np.testing.assert_array_equal(ec[0, : ne[0]], g.edge_child)
        np.testing.assert_array_equal(ed[0, : ne[0]], g.edge_deprel)
        np.testing.assert_array_equal(keep[0, :n], g.keep)
        assert int(roots[0]) == g.root


@needs_native
def test_random_trees_all_depths():
    rng = np.random.RandomState(7)
    b, n = 32, 40
    heads = np.zeros((b, n), np.int32)
    deprels = np.ones((b, n), np.int32)
    subj = np.full((b, n), 10**6, np.int32)
    obj = np.full((b, n), 10**6, np.int32)
    lengths = rng.randint(3, n + 1, b).astype(np.int32)
    for i in range(b):
        ln = lengths[i]
        for t in range(1, ln):
            heads[i, t] = rng.randint(1, t + 1)
        deprels[i, :ln] = rng.randint(2, 41, ln)
        sp, op_ = rng.randint(ln), rng.randint(ln)
        subj[i, :ln] = np.arange(ln) - sp
        obj[i, :ln] = np.arange(ln) - op_
    for k in (-1, 0, 1, 3, 100):
        ep, ec, ed, em, keep, ne, roots = prune_graph_batch_native(
            heads, deprels, subj, obj, lengths, k
        )
        for i in range(b):
            g = prune_graph(heads[i], deprels[i], int(lengths[i]), k,
                            subj[i], obj[i])
            assert int(ne[i]) == g.num_edges, (k, i)
            np.testing.assert_array_equal(ep[i, : ne[i]], g.edge_parent)
            np.testing.assert_array_equal(keep[i, : lengths[i]], g.keep)


@needs_native
def test_cycle_rejected():
    heads = np.array([[2, 1, 0]], np.int32)  # 0↔1 cycle
    deprels = np.ones((1, 3), np.int32)
    subj = np.array([[0, 1, 2]], np.int32)
    obj = np.array([[2, 1, 0]], np.int32)
    with pytest.raises(ValueError, match="malformed"):
        prune_graph_batch_native(
            heads, deprels, subj, obj, np.array([3], np.int32), 1
        )


@needs_native
def test_dataset_uses_native_builder(monkeypatch, tmp_path):
    """Dataset graphs must be identical with and without the native path."""
    import json

    from gcn_tpu.config import gcn_preset
    from gcn_tpu.data.dataset import RelationDataset
    from gcn_tpu.data.vocab import Vocab

    with open("dataset/tacred/train.json") as f:
        data = json.load(f)[:10]
    path = tmp_path / "mini.json"
    path.write_text(json.dumps(data))
    vocab = Vocab(["<PAD>", "<UNK>"])
    cfg = gcn_preset()
    cfg.model.vocab_size = 2

    ds_native = RelationDataset(str(path), cfg, vocab)
    monkeypatch.setenv("GCN_TPU_NATIVE", "0")
    import gcn_tpu.graph.native as nat

    monkeypatch.setattr(nat, "_TRIED", False)
    monkeypatch.setattr(nat, "_LIB", None)
    ds_python = RelationDataset(str(path), cfg, vocab)
    for a, b_ in zip(ds_native.examples, ds_python.examples):
        np.testing.assert_array_equal(a.graph.edge_parent,
                                      b_.graph.edge_parent)
        np.testing.assert_array_equal(a.graph.edge_child,
                                      b_.graph.edge_child)
        np.testing.assert_array_equal(a.graph.keep, b_.graph.keep)
        assert a.graph.root == b_.graph.root
