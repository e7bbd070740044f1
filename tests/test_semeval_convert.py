"""Offline tests for the SemEval-2010 fetch/convert path and the hard
quality-benchmark generator (no parser/network needed — the parse/span
logic is what can regress silently)."""

import json
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")


OFFICIAL_SAMPLE = '''1\t"The <e1>system</e1> has an arrayed <e2>configuration</e2> of elements."
Component-Whole(e2,e1)
Comment:

2\t"A <e1>child</e1> was carefully wrapped into the <e2>cradle</e2>."
Other
Comment: x

3\t"The <e1>factory workers</e1> moved into the <e2>storage area</e2>, loudly."
Entity-Destination(e1,e2)
Comment:
'''


@pytest.fixture(scope="module")
def entries(tmp_path_factory):
    from convert_semeval import parse_official

    p = tmp_path_factory.mktemp("sem") / "TRAIN_FILE.TXT"
    p.write_text(OFFICIAL_SAMPLE, encoding="utf-8")
    return parse_official(str(p))


def test_parse_official_labels_and_direction(entries):
    assert [e["id"] for e in entries] == ["1", "2", "3"]
    assert entries[0]["relation"] == "Component-Whole"
    # (e2,e1): the first label argument is the subject
    assert entries[0]["subj_is_e1"] is False
    assert entries[1]["relation"] == "Other"
    assert entries[1]["subj_is_e1"] is True  # Other defaults e1=subj
    assert entries[2]["subj_is_e1"] is True


def test_tokenize_spans_single_and_multiword(entries):
    from convert_semeval import tokenize_with_spans

    tk = tokenize_with_spans(entries[0]["text"])
    toks = tk["token"]
    assert toks[tk["e1_start"]:tk["e1_end"] + 1] == ["system"]
    assert toks[tk["e2_start"]:tk["e2_end"] + 1] == ["configuration"]
    assert toks[-1] == "."  # punctuation tokenized separately

    tk3 = tokenize_with_spans(entries[2]["text"])
    toks3 = tk3["token"]
    assert toks3[tk3["e1_start"]:tk3["e1_end"] + 1] == [
        "factory", "workers"]
    assert toks3[tk3["e2_start"]:tk3["e2_end"] + 1] == ["storage", "area"]


def test_hard_task_generator(tmp_path):
    """The hard variant's difficulty knobs are structural facts the
    benchmark's validity rests on — pin them."""
    out = subprocess.run(
        [sys.executable, "tools/make_sample_data.py", "--out",
         str(tmp_path), "--n", "400", "--task", "hard"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    exs = json.load(open(tmp_path / "tacred" / "train.json"))
    assert len(exs) == 400
    labels = {e["relation"] for e in exs}
    assert "no_relation" in labels
    assert len(labels) >= 15  # 16 active pairs + negative, minus draws
    # trigger dropout: a material fraction of POSITIVES carry no trigger
    pos = [e for e in exs if e["relation"] != "no_relation"]
    blind = [e for e in pos
             if not any(t.startswith("trgpair") for t in e["token"])]
    assert 0.1 < len(blind) / len(pos) < 0.5
    # decoys exist: some NEGATIVES carry a trigger token
    neg = [e for e in exs if e["relation"] == "no_relation"]
    decoyed = [e for e in neg
               if any(t.startswith("trgpair") for t in e["token"])]
    assert decoyed, "decoy triggers missing from negatives"
    # schema intact: head arrays parse as a valid rooted tree
    for e in exs[:20]:
        head = [int(h) for h in e["stanford_head"]]
        assert head.count(0) == 1
        assert len(head) == len(e["token"]) == len(e["stanford_pos"])
    # vocab covers the trigger tokens
    import pickle

    vocab = pickle.load(open(tmp_path / "vocab" / "vocab.pkl", "rb"))
    assert "trgpair0" in vocab and "trgpair7" in vocab
    # dev/test drawn from the same distribution (same generator stream)
    dev = json.load(open(tmp_path / "tacred" / "dev.json"))
    assert len(dev) == 200


def test_prepare_vocab_semeval_mode(tmp_path):
    """--dataset semeval: no dev split required, entity tokens KEPT."""
    d = tmp_path / "data"
    d.mkdir()
    exs = [{
        "token": ["the", "cat", "sat", "on", "mat"],
        "subj_start": 1, "subj_end": 1,
        "obj_start": 4, "obj_end": 4,
    }]
    for split in ("train", "test"):
        (d / f"{split}.json").write_text(json.dumps(exs))
    glove_dir = tmp_path / "glove"
    glove_dir.mkdir()
    words = ["the", "cat", "sat", "on", "mat"]
    (glove_dir / "glove.840B.300d.txt").write_text(
        "\n".join(w + " " + " ".join(["0.1"] * 4) for w in words) + "\n"
    )
    out = subprocess.run(
        [sys.executable, "prepare_vocab.py", str(d),
         str(tmp_path / "vocab"), "--glove_dir", str(glove_dir),
         "--wv_dim", "4", "--dataset", "semeval"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    import pickle

    vocab = pickle.load(open(tmp_path / "vocab" / "vocab.pkl", "rb"))
    # entity spans kept (cat, mat in vocab) — the SemEval loader never
    # anonymizes entities (reference data/semeval_loader.py:52-55)
    assert "cat" in vocab and "mat" in vocab
    emb = np.load(tmp_path / "vocab" / "embedding.npy")
    assert emb.shape == (len(vocab), 4)
