"""Golden tests: edge-list pruning reproduces the reference's dense
adjacency (``model/tree.py``) bit-for-bit on the sample TACRED data
(60 examples × 5 prune depths)."""

import numpy as np
import pytest

from gcn_tpu.graph.prune import graph_to_dense_adj, prune_graph
from tests.conftest import load_golden


@pytest.fixture(scope="module")
def prune_goldens():
    z = load_golden("prune_goldens.npz")
    num = int(z["num"])
    return [
        {
            name: z[f"{name}_{j}"]
            for name in ("example", "prune", "n", "head", "deprel",
                         "subj_pos", "obj_pos", "adj")
        }
        for j in range(num)
    ]


def test_adjacency_matches_reference(prune_goldens):
    assert len(prune_goldens) == 300
    for rec in prune_goldens:
        n = int(rec["n"])
        g = prune_graph(
            rec["head"], rec["deprel"], n, int(rec["prune"]),
            rec["subj_pos"], rec["obj_pos"],
        )
        adj = graph_to_dense_adj(g, n)
        np.testing.assert_array_equal(
            adj, rec["adj"],
            err_msg=f"example {rec['example']} prune {rec['prune']}",
        )


def test_no_prune_keeps_whole_tree():
    head = np.array([2, 0, 2, 3, 2])
    deprel = np.array([7, 11, 10, 5, 2])
    g = prune_graph(head, deprel, 5, -1,
                    np.array([0, 1, 2, 3, 4]), np.array([-3, -2, -1, 0, 1]))
    assert g.keep.all()
    assert g.num_edges == 4
    assert g.root == 1


def test_prune_zero_keeps_path_only():
    # chain: 0 <- 1 <- 2 <- 3 <- 4, subj=0, obj=4
    head = np.array([0, 1, 2, 3, 4])
    deprel = np.array([11, 5, 5, 5, 5])
    g = prune_graph(head, deprel, 5, 0,
                    np.array([0, 1, 2, 3, 4]), np.array([-4, -3, -2, -1, 0]))
    assert g.keep.all()  # whole chain is the dependency path
    assert g.num_edges == 4


def test_prune_drops_off_path_tokens():
    # star: root 0 with children 1..4; subj=1, obj=2 → 3,4 at distance 1
    head = np.array([0, 1, 1, 1, 1])
    deprel = np.array([11, 7, 10, 5, 2])
    subj = np.array([-1, 0, 1, 2, 3])
    obj = np.array([-2, -1, 0, 1, 2])
    g0 = prune_graph(head, deprel, 5, 0, subj, obj)
    assert list(np.nonzero(g0.keep)[0]) == [0, 1, 2]
    g1 = prune_graph(head, deprel, 5, 1, subj, obj)
    assert g1.keep.all()


def test_single_token_entity_graph():
    # subj == obj == token 0, tree of 1 node: no edges, lca kept
    head = np.array([0])
    deprel = np.array([11])
    g = prune_graph(head, deprel, 1, 1, np.array([0]), np.array([0]))
    assert g.num_edges == 0
    assert g.keep.all()
    adj = graph_to_dense_adj(g, 1)
    assert adj.sum() == 0  # no self-loop without incident edges
