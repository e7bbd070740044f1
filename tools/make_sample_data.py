"""Generate a small synthetic dataset in TACRED/SemEval JSON schema.

Produces deterministic random sentences with valid dependency trees, tag
sequences drawn from the real tag inventories, and a matching vocab +
random embedding matrix — enough to smoke-run the full train/eval CLIs
without the LDC-licensed TACRED corpus.  Schema matches
``/root/reference/dataset/tacred/README.md``.

    python tools/make_sample_data.py [--out dataset] [--n 40]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcn_tpu import constants, constants_semeval  # noqa: E402

WORDS = (
    "the a an quick brown fox jumps over lazy dog company president said "
    "yesterday that new york city mayor was born in spring field his her "
    "their chief executive officer founded subsidiary organization church "
    "school reported married died age years old spokesman announced today"
).split()


def random_tree(rng: np.random.RandomState, n: int) -> list[int]:
    """Random labeled tree as a 1-indexed head array with one root."""
    root = rng.randint(n)
    head = [0] * n
    attached = {root}
    order = [i for i in range(n) if i != root]
    rng.shuffle(order)
    for i in order:
        parent = list(attached)[rng.randint(len(attached))]
        head[i] = parent + 1
        attached.add(i)
    return head


def make_example(rng, i, dataset="tacred"):
    C = constants if dataset == "tacred" else constants_semeval
    n = rng.randint(8, 40)
    tokens = [WORDS[rng.randint(len(WORDS))] for _ in range(n)]
    head = random_tree(rng, n)
    # never emit the semeval-only 'pad' POS tag: the reference model sizes
    # pos_emb from the 47-tag TACRED table (model/gcn.py:46) while its
    # semeval loader encodes with the 48-tag semeval table, so 'pad'
    # (id 47) crashes the reference — and it is not a real PTB tag, so
    # actual parses never contain it
    pos_tags = [t for t in list(C.POS_TO_ID)[2:] if t != "pad"]
    dep_tags = [t for t in list(constants.DEPREL_TO_ID)[2:42]]
    ner_tags = [t for t in list(constants.NER_TO_ID)[2:]]
    pos = [pos_tags[rng.randint(len(pos_tags))] for _ in range(n)]
    deprel = [dep_tags[rng.randint(len(dep_tags))] for _ in range(n)]
    ner = [ner_tags[rng.randint(len(ner_tags))] for _ in range(n)]
    ss = rng.randint(n - 2)
    se = min(n - 1, ss + rng.randint(1, 3))
    while True:
        os_ = rng.randint(n - 1)
        oe = min(n - 1, os_ + rng.randint(1, 2))
        if oe < ss or os_ > se:
            break
    labels = list(
        (constants if dataset == "tacred" else constants_semeval)
        .LABEL_TO_ID
    )
    ex = {
        "id": f"synthetic-{dataset}-{i:04d}",
        "relation": labels[rng.randint(len(labels))],
        "token": tokens,
        "subj_start": ss,
        "subj_end": se,
        "obj_start": os_,
        "obj_end": oe,
        "subj_type": "PERSON" if rng.rand() < 0.5 else "ORGANIZATION",
        "obj_type": list(constants.OBJ_NER_TO_ID)[
            2 + rng.randint(len(constants.OBJ_NER_TO_ID) - 2)
        ],
        "stanford_pos": pos,
        "stanford_ner": ner,
        "stanford_head": [str(h) for h in head],
        "stanford_deprel": deprel,
    }
    return ex


def make_learnable_example(rng, i, dataset="tacred"):
    """Example whose relation IS predictable from observable features: a
    relation-specific trigger token attached (in the dependency tree) to
    the object token, plus the matching subject entity type.  Unlike the
    random-label examples above, held-out F1 on this data measures real
    generalization — `tools/train_compare.py --data_mode learnable` uses
    it to compare both frameworks' learned quality, not just their
    memorization rate.

    The trigger is appended as a LEAF of the object's head token, so
    path-centric pruning at K>=1 (reference model/tree.py:129-162) always
    keeps it: distance-to-path 1.  Solvable by GCN-only models (no RNN
    needed), since the trigger survives pruning and pooling."""
    C = constants if dataset == "tacred" else constants_semeval
    ex = make_example(rng, i, dataset)
    # 8 active relations: keeps per-class counts dense enough that a few
    # hundred examples suffice to learn the mapping (41-way needs ~10x)
    labels = [l for l in C.LABEL_TO_ID if l != C.NEGATIVE_LABEL][:8]
    neg = rng.rand() < 0.25
    if neg:
        ex["relation"] = C.NEGATIVE_LABEL
        return ex
    rel = labels[rng.randint(len(labels))]
    ex["relation"] = rel
    if dataset == "tacred":
        ex["subj_type"] = "PERSON" if rel.startswith("per:") else "ORGANIZATION"
    # trigger leaf attached to the object's first token (1-indexed head)
    trig = "trg" + "".join(ch if ch.isalnum() else "_" for ch in rel)
    ex["token"] = ex["token"] + [trig]
    ex["stanford_head"] = ex["stanford_head"] + [str(ex["obj_start"] + 1)]
    ex["stanford_pos"] = ex["stanford_pos"] + ["NN"]
    if "stanford_ner" in ex:
        ex["stanford_ner"] = ex["stanford_ner"] + ["O"]
    dep_tags = [t for t in list(constants.DEPREL_TO_ID)[2:42]]
    ex["stanford_deprel"] = ex["stanford_deprel"] + [
        dep_tags[rng.randint(len(dep_tags))]
    ]
    return ex


def make_hard_example(rng, i, dataset="tacred", trigger_copies=1):
    """NON-SATURATED variant of the learnable task: structured so neither
    framework can reach F1 1.0, which makes cross-framework quality deltas
    measurable *off the ceiling* (two frameworks agreeing at 1.0 on a
    solvable task is weak evidence they'd agree at 0.65 on TACRED — this
    is the committed answer to that gap).

    Difficulty knobs (all deterministic given the seed):

    * 16 active relations (vs 8), as 8 TRIGGER PAIRS: relations 2k and
      2k+1 share the same trigger token and are disambiguated only by the
      subject entity type (PERSON vs ORGANIZATION) — a second feature the
      model must conjoin with the trigger.
    * trigger dropout: 25% of positives carry NO trigger (irreducible —
      the label is unpredictable; the Bayes-optimal policy calls them
      negative), capping recall ≈ 0.75.
    * decoy triggers: 40% of ALL examples get a random OTHER relation's
      trigger attached as a leaf of a random non-path token (dist > K
      from the subj-obj path ~half the time) — bag-of-words shortcuts
      mispredict these; tree structure (pruning keeps only path-adjacent
      triggers) resolves most.
    * label noise: 8% of examples get their gold label resampled
      uniformly from the active set, capping precision.

    Measured operating point (both frameworks, learnable-protocol
    hyperparameters, n_train=1200, 30 epochs): dev F1 ≈ 0.6-0.8 —
    inside the 0.6-0.9 target band, far from both the 1.0 ceiling and
    the 0.0 floor, so systematic regularization/optimizer/pruning gaps
    between the frameworks would move the number.
    """
    C = constants if dataset == "tacred" else constants_semeval
    ex = make_example(rng, i, dataset)
    labels = [l for l in C.LABEL_TO_ID if l != C.NEGATIVE_LABEL][:16]
    pairs = len(labels) // 2
    dep_tags = [t for t in list(constants.DEPREL_TO_ID)[2:42]]

    def attach_leaf(token, head_1idx):
        ex["token"].append(token)
        ex["stanford_head"].append(str(head_1idx))
        ex["stanford_pos"].append("NN")
        if "stanford_ner" in ex:
            ex["stanford_ner"].append("O")
        ex["stanford_deprel"].append(dep_tags[rng.randint(len(dep_tags))])

    neg = rng.rand() < 0.25
    if neg:
        ex["relation"] = C.NEGATIVE_LABEL
    else:
        pair = rng.randint(pairs)
        variant = rng.randint(2)  # disambiguated by subj entity type
        rel = labels[2 * pair + variant]
        ex["relation"] = rel
        if dataset == "tacred":
            ex["subj_type"] = "PERSON" if variant == 0 else "ORGANIZATION"
        if rng.rand() >= 0.25:  # trigger dropout: 25% of positives blind
            # trigger_copies > 1 densifies the SIGNAL without moving the
            # CEILING (trigger dropout and label noise are unchanged):
            # the flagship stack's 0.5-dropout everywhere needs a denser
            # signal to reach the 0.3-0.8 operating band inside a
            # tractable epoch budget; copies attach to the object head
            # and the subject head (both survive K>=1 pruning)
            heads = [ex["obj_start"] + 1, ex["subj_start"] + 1]
            for c in range(trigger_copies):
                attach_leaf(f"trgpair{pair}", heads[c % 2])
    if rng.rand() < 0.40:  # decoy: another pair's trigger off-path
        # ONE decoy pair attached trigger_copies times: decoys must carry
        # the SAME multiplicity as real triggers, or multiplicity itself
        # becomes a real-vs-decoy cue that moves the ceiling the
        # trigger_copies flag claims to hold fixed
        decoy = rng.randint(pairs)
        for c in range(trigger_copies):
            attach_leaf(f"trgpair{decoy}",
                        rng.randint(len(ex["token"])) + 1)
    if rng.rand() < 0.08:  # label noise
        ex["relation"] = labels[rng.randint(len(labels))]
    return ex


def hard_trigger_words():
    return [f"trgpair{k}" for k in range(8)]


def learnable_trigger_words(dataset="tacred"):
    C = constants if dataset == "tacred" else constants_semeval
    return [
        "trg" + "".join(ch if ch.isalnum() else "_" for ch in rel)
        for rel in C.LABEL_TO_ID if rel != C.NEGATIVE_LABEL
    ]


def entity_masks():
    subj = list(constants.SUBJ_NER_TO_ID.keys())[2:]
    obj = list(constants.OBJ_NER_TO_ID.keys())[2:]
    return ["SUBJ-" + e for e in subj] + ["OBJ-" + e for e in obj]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="dataset")
    p.add_argument("--n", type=int, default=40)
    p.add_argument("--emb_dim", type=int, default=300)
    p.add_argument("--task", choices=["random", "learnable", "hard"],
                   default="random",
                   help="random = arbitrary labels (smoke data; held-out "
                        "F1 is noise); learnable = relation predictable "
                        "from a trigger token + entity types, so dev/test "
                        "F1 measures generalization; hard = non-saturated "
                        "variant (shared triggers, trigger dropout, "
                        "decoys, label noise) landing at F1 0.6-0.8 so "
                        "cross-framework deltas are measurable off the "
                        "ceiling (tacred only)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--trigger_copies", type=int, default=1,
                   help="hard task: attach the (real and decoy) trigger "
                        "this many times per example — densifies the "
                        "signal for heavily-regularized stacks without "
                        "moving the F1 ceiling (trigger dropout and "
                        "label noise are unchanged)")
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    import functools

    gen = {"learnable": make_learnable_example,
           "hard": functools.partial(make_hard_example,
                                     trigger_copies=args.trigger_copies),
           "random": make_example}[args.task]

    targets = (("tacred", "tacred"), ("semeval", "semeval"))
    if args.task == "hard":
        # the pair disambiguation rides the subject entity type, which
        # only the TACRED schema carries (SemEval has no NER/entity types)
        targets = (("tacred", "tacred"),)
    for dataset, subdir in targets:
        d = os.path.join(args.out, subdir)
        os.makedirs(d, exist_ok=True)
        splits = (
            ("train", args.n), ("dev", args.n // 2), ("test", args.n // 2)
        )
        if dataset == "semeval":
            splits = (("train", args.n), ("test", args.n // 2))
        for split, count in splits:
            exs = [gen(rng, i, dataset) for i in range(count)]
            with open(os.path.join(d, f"{split}.json"), "w") as f:
                json.dump(exs, f)
        print(f"{dataset}: wrote {[s for s, _ in splits]} to {d}")

    # vocab + random embeddings covering the synthetic corpus
    extra = []
    if args.task == "learnable":
        extra = sorted(set(learnable_trigger_words("tacred")
                           + learnable_trigger_words("semeval")))
    elif args.task == "hard":
        extra = hard_trigger_words()
    vocab = constants.VOCAB_PREFIX + entity_masks() + sorted(WORDS) + extra
    for name in ("vocab", "vocab_semeval"):
        vd = os.path.join(args.out, name)
        os.makedirs(vd, exist_ok=True)
        with open(os.path.join(vd, "vocab.pkl"), "wb") as f:
            pickle.dump(vocab, f)
        emb = rng.uniform(-1, 1, (len(vocab), args.emb_dim))
        emb[0] = 0.0
        np.save(os.path.join(vd, "embedding.npy"), emb)
    print(f"vocab: {len(vocab)} words, emb dim {args.emb_dim}")


if __name__ == "__main__":
    main()
