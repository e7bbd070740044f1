"""Scorer semantics: micro P/R/F1 excluding the negative label
(reference ``utils/scorer.py:20-96``)."""

import io

from gcn_tpu.train.scorer import compute_confusion_matrices, score


def test_all_correct():
    gold = ["a", "b", "no_relation"]
    pred = ["a", "b", "no_relation"]
    p, r, f1 = score(gold, pred, out=io.StringIO())
    assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_negative_pairs_excluded():
    # only negative-negative pairs → no gold, no guesses
    p, r, f1 = score(["no_relation"] * 5, ["no_relation"] * 5,
                     out=io.StringIO())
    assert p == 1.0 and r == 0.0 and f1 == 0.0


def test_false_positive_counts_against_precision():
    gold = ["no_relation", "a"]
    pred = ["a", "a"]
    p, r, f1 = score(gold, pred, out=io.StringIO())
    assert p == 0.5 and r == 1.0
    assert abs(f1 - 2 * 0.5 / 1.5) < 1e-12


def test_false_negative_counts_against_recall():
    gold = ["a", "a"]
    pred = ["no_relation", "a"]
    p, r, f1 = score(gold, pred, out=io.StringIO())
    assert p == 1.0 and r == 0.5


def test_wrong_positive_label_hits_both():
    gold = ["a"]
    pred = ["b"]
    p, r, f1 = score(gold, pred, out=io.StringIO())
    assert p == 0.0 and r == 0.0 and f1 == 0.0


def test_semeval_negative_label():
    gold = ["Other", "Cause-Effect"]
    pred = ["Cause-Effect", "Cause-Effect"]
    p, r, _ = score(gold, pred, negative_label="Other", out=io.StringIO())
    assert p == 0.5 and r == 1.0


def test_verbose_table_renders():
    buf = io.StringIO()
    score(["a", "b"], ["a", "no_relation"], verbose=True, out=buf)
    text = buf.getvalue()
    assert "Per-relation statistics" in text
    assert "F1 (micro)" in text


def test_confusion_matrix():
    cm = compute_confusion_matrices(["a", "a", "b"], ["a", "b", "b"])
    assert cm == {"a": {"a": 1, "b": 1}, "b": {"b": 1}}
