"""Convert the official SemEval-2010 Task 8 distribution to the JSON
schema this framework (and the reference) trains on.

Input: the official ``TRAIN_FILE.TXT`` / ``TEST_FILE_FULL.TXT`` format
(fetched by ``download_semeval.sh``)::

    1   "The <e1>system</e1> ... <e2>configuration</e2> ..."
    Component-Whole(e2,e1)
    Comment: ...

Output: ``train.json`` / ``test.json`` with the fields the SemEval loader
consumes (reference ``data/semeval_loader.py:44-66``): ``id, relation,
token, subj_start/end, obj_start/end, stanford_pos, stanford_deprel,
stanford_head`` — the 10-way direction-collapsed label set
(``gcn_tpu/constants_semeval.py``); the argument DIRECTION is preserved
through the subj/obj span roles (first label argument = subject).

Dependency annotations require a parser producing Stanford-Dependencies
style (basic) trees with 1-indexed heads (0 = root).  Two providers:

* ``--corenlp http://host:9000`` — a running Stanford CoreNLP server
  (``pos,depparse`` annotators).  This matches the reference data's
  provenance (TACRED/SemEval JSONs were produced with CoreNLP).
* ``--stanza`` — the stanza pipeline, if installed (pip install stanza;
  its UD parse differs slightly from Stanford-basic; deprel names
  outside the 40-label table of ``constants_semeval.DEPREL_TO_ID`` map
  to UNK, which the model tolerates).

Neither is bundled in this image (no network egress) — run this on a
machine with one of them available.  Acceptance gate after conversion
(docs/design.md "Real-data acceptance gates"):

    bash download_semeval.sh && python tools/convert_semeval.py \
        --train SemEval2010_task8_training/TRAIN_FILE.TXT \
        --test SemEval2010_task8_testing_keys/TEST_FILE_FULL.TXT \
        --out dataset/semeval --corenlp http://localhost:9000
    python prepare_vocab.py dataset/semeval dataset/vocab_semeval \
        --glove_dir dataset/glove --dataset semeval
    bash train_cgcn_semeval.sh 0 00
    # expect: Test Metrics at Best Train | F1 >= 0.82 (paper C-GCN: 84.8,
    # reference README.md:4; the gate leaves margin for parser drift)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_SENT_RE = re.compile(r'^(\d+)\t"(.*)"\s*$')
_LABEL_RE = re.compile(r"^([A-Za-z-]+)(?:\((e[12]),(e[12])\))?\s*$")


def parse_official(path: str) -> list[dict]:
    """Official TXT → [{id, text, e1 span (char), e2 span, relation,
    subj_is_e1}] with <e1>/<e2> markup stripped and token-level spans
    resolved after tokenization."""
    entries = []
    with open(path, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    while i < len(lines):
        m = _SENT_RE.match(lines[i])
        if not m:
            i += 1
            continue
        sid, text = m.group(1), m.group(2)
        if i + 1 >= len(lines):
            raise ValueError(
                f"{path}: truncated record — sentence {sid} at line "
                f"{i + 1} has no label line (file ends)")
        lm = _LABEL_RE.match(lines[i + 1].strip())
        if not lm:
            raise ValueError(
                f"{path}: bad label line after sentence {sid} at line "
                f"{i + 2}: {lines[i + 1]!r}")
        rel, a1, _ = lm.group(1), lm.group(2), lm.group(3)
        entries.append({
            "id": sid,
            "text": text,
            "relation": rel,
            # first label argument is the SUBJECT; Other keeps e1=subj
            "subj_is_e1": (a1 or "e1") == "e1",
        })
        i += 3  # sentence, label, Comment
    return entries


def tokenize_with_spans(text: str):
    """Split the <e1>/<e2>-marked sentence into tokens + entity token
    spans (inclusive), using whitespace + punctuation tokenization close
    enough to PTB for span math (the parser retokenizes nothing: we pass
    pre-tokenized words, ``is_tokenized`` style)."""
    spans = {}
    for tag in ("e1", "e2"):
        o, c = f"<{tag}>", f"</{tag}>"
        start = text.index(o)
        end = text.index(c)
        inner = text[start + len(o):end]
        spans[tag] = (start, inner)
        text = text[:start] + inner + text[end + len(c):]
        # shift the other tag's recorded char offset if it sits after
        for t2, (s2, in2) in list(spans.items()):
            if t2 != tag and s2 > start:
                spans[t2] = (s2 - len(o) - (len(c) if s2 > end else 0), in2)
    # tokenize: words, keeping punctuation as separate tokens
    tokens, tok_spans = [], []
    for m in re.finditer(r"\w+[\w'-]*|[^\w\s]", text):
        tokens.append(m.group(0))
        tok_spans.append((m.start(), m.end()))
    out = {"token": tokens}
    for tag in ("e1", "e2"):
        cs, inner = spans[tag]
        ce = cs + len(inner)
        idx = [k for k, (s, e) in enumerate(tok_spans) if s < ce and e > cs]
        assert idx, f"entity {tag} not aligned in {text!r}"
        out[f"{tag}_start"], out[f"{tag}_end"] = idx[0], idx[-1]
    return out


class CoreNLPParser:
    def __init__(self, url: str):
        import urllib.parse
        import urllib.request

        self._req = urllib.request
        self.url = (url.rstrip("/") + "/?properties=" + urllib.parse.quote(
            json.dumps({
                "annotators": "pos,depparse",
                "tokenize.whitespace": "true",
                "ssplit.eolonly": "true",
                "outputFormat": "json",
            })))

    def __call__(self, tokens: list[str]):
        data = " ".join(tokens).encode("utf-8")
        with self._req.urlopen(self.url, data=data, timeout=60) as r:
            doc = json.loads(r.read().decode("utf-8"))
        s = doc["sentences"][0]
        pos = [t["pos"] for t in s["tokens"]]
        head = [0] * len(tokens)
        deprel = ["root"] * len(tokens)
        for d in s["basicDependencies"]:
            head[d["dependent"] - 1] = d["governor"]
            deprel[d["dependent"] - 1] = d["dep"].lower()
        return pos, head, deprel


class StanzaParser:
    def __init__(self):
        import stanza

        self.nlp = stanza.Pipeline(
            "en", processors="tokenize,pos,depparse",
            tokenize_pretokenized=True, verbose=False,
        )

    def __call__(self, tokens: list[str]):
        doc = self.nlp([tokens])
        words = doc.sentences[0].words
        return ([w.xpos for w in words],
                [w.head for w in words],
                [w.deprel.split(":")[0] for w in words])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", required=True,
                   help="path to TRAIN_FILE.TXT")
    p.add_argument("--test", required=True,
                   help="path to TEST_FILE_FULL.TXT")
    p.add_argument("--out", default="dataset/semeval")
    p.add_argument("--corenlp", default=None,
                   help="CoreNLP server URL (e.g. http://localhost:9000)")
    p.add_argument("--stanza", action="store_true",
                   help="use an installed stanza pipeline instead")
    args = p.parse_args()

    if args.corenlp:
        parser = CoreNLPParser(args.corenlp)
    elif args.stanza:
        parser = StanzaParser()
    else:
        sys.exit("need a dependency parser: pass --corenlp URL (Stanford "
                 "CoreNLP server with pos,depparse) or --stanza "
                 "(installed stanza). See the module docstring.")

    os.makedirs(args.out, exist_ok=True)
    for split, path in (("train", args.train), ("test", args.test)):
        out = []
        for ent in parse_official(path):
            tk = tokenize_with_spans(ent["text"])
            pos, head, deprel = parser(tk["token"])
            assert any(h == 0 for h in head), ent["id"]
            subj, obj = (("e1", "e2") if ent["subj_is_e1"]
                         else ("e2", "e1"))
            out.append({
                "id": ent["id"],
                "relation": ent["relation"],
                "token": tk["token"],
                "subj_start": tk[f"{subj}_start"],
                "subj_end": tk[f"{subj}_end"],
                "obj_start": tk[f"{obj}_start"],
                "obj_end": tk[f"{obj}_end"],
                "stanford_pos": pos,
                "stanford_head": [str(h) for h in head],
                "stanford_deprel": deprel,
            })
        dst = os.path.join(args.out, f"{split}.json")
        with open(dst, "w") as f:
            json.dump(out, f)
        print(f"{split}: {len(out)} examples -> {dst}")


if __name__ == "__main__":
    main()
