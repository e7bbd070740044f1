"""Per-relation pruned-tree statistics.

Working counterpart of the reference's analysis script
``data/tree_structures.py`` (which calls ``head_to_tree`` with a stale
2-argument signature and crashes).  For each relation label, reports how
often each dependency relation appears inside the pruned trees, plus tree
size / path-length distributions.

    python tools/tree_statistics.py dataset/tacred/train.json --prune_k 1
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcn_tpu import constants  # noqa: E402
from gcn_tpu.data.dataset import get_positions  # noqa: E402
from gcn_tpu.data.vocab import map_to_ids  # noqa: E402
from gcn_tpu.graph.prune import prune_graph  # noqa: E402

ID_TO_DEPREL = {v: k for k, v in constants.DEPREL_TO_ID.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_file")
    p.add_argument("--prune_k", type=int, default=1)
    p.add_argument("--top", type=int, default=10,
                   help="deprels to show per relation")
    args = p.parse_args()

    with open(args.data_file) as f:
        data = json.load(f)

    by_relation: dict = collections.defaultdict(collections.Counter)
    sizes: dict = collections.defaultdict(list)
    for ex in data:
        deprel = np.asarray(
            map_to_ids(ex["stanford_deprel"], constants.DEPREL_TO_ID),
            np.int32,
        )
        head = np.asarray([int(x) for x in ex["stanford_head"]], np.int32)
        n = len(head)
        subj = np.asarray(
            get_positions(ex["subj_start"], ex["subj_end"], n), np.int32
        )
        obj = np.asarray(
            get_positions(ex["obj_start"], ex["obj_end"], n), np.int32
        )
        g = prune_graph(head, deprel, n, args.prune_k, subj, obj)
        rel = ex["relation"]
        by_relation[rel].update(
            ID_TO_DEPREL[int(d)] for d in g.edge_deprel
        )
        sizes[rel].append(int(g.keep.sum()))

    for rel in sorted(by_relation):
        counts = by_relation[rel]
        total = sum(counts.values())
        mean_size = np.mean(sizes[rel])
        print(f"\n{rel}  (examples: {len(sizes[rel])}, "
              f"mean pruned-tree size: {mean_size:.1f}, edges: {total})")
        for name, c in counts.most_common(args.top):
            print(f"  {name:<16} {c:>6}  ({c / max(total, 1):.1%})")


if __name__ == "__main__":
    main()
