"""Precomputed contextual-embedding inputs ("BERT path").

Counterpart of the reference's offline extractor
(``data/bert_embeddings.py``), which used the external bert-serving
service.  Here extraction runs through HuggingFace ``transformers``
directly; the artifact format is unchanged — a pickle mapping example id →
``[L, hidden]`` float array, one vector per original token — so pickles
produced for the reference load here and vice versa.

Preprocessing mirrors the reference exactly: PTB bracket-token
normalization (``data/bert_embeddings.py:18-27``) and SUBJ-/OBJ- entity
anonymization (``:30-45``) before encoding; CLS/SEP positions are stripped
(``:64-66``).  Sub-word pieces are mean-pooled back to word positions
(bert-serving's ``is_tokenized=True`` behavior).
"""

from __future__ import annotations

import json
import pickle
from typing import Optional

import numpy as np

# PTB bracket tokens → literal brackets (reference data/bert_embeddings.py:18-27)
BRACKET_MAP = {
    "-LRB-": "(", "-RRB-": ")",
    "-LSB-": "[", "-RSB-": "]",
    "-LCB-": "{", "-RCB-": "}",
}


def normalize_tokens(tokens: list[str]) -> list[str]:
    return [BRACKET_MAP.get(t, t) for t in tokens]


def anonymize(example: dict) -> list[str]:
    """SUBJ-/OBJ- entity masking (reference data/bert_embeddings.py:30-45)."""
    tokens = list(example["token"])
    ss, se = example["subj_start"], example["subj_end"]
    os_, oe = example["obj_start"], example["obj_end"]
    tokens[ss : se + 1] = ["SUBJ-" + example["subj_type"]] * (se - ss + 1)
    tokens[os_ : oe + 1] = ["OBJ-" + example["obj_type"]] * (oe - os_ + 1)
    return normalize_tokens(tokens)


def extract_embeddings(
    data_files: list[str],
    out_file: str,
    model_name: str = "bert-large-uncased",
    batch_size: int = 32,
    device: str = "cpu",
    max_examples: Optional[int] = None,
) -> dict:
    """Encode every example's (anonymized) tokens → id2embeddings pickle."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name).to(device).eval()

    examples: list[dict] = []
    for path in data_files:
        with open(path) as f:
            examples.extend(json.load(f))
    if max_examples is not None:
        examples = examples[:max_examples]

    id2embeddings: dict[str, np.ndarray] = {}
    with torch.no_grad():
        for i in range(0, len(examples), batch_size):
            chunk = examples[i : i + batch_size]
            words = [anonymize(ex) for ex in chunk]
            enc = tokenizer(
                words, is_split_into_words=True, return_tensors="pt",
                padding=True, truncation=True,
            ).to(device)
            hidden = model(**enc).last_hidden_state.cpu().numpy()
            for j, ex in enumerate(chunk):
                word_ids = enc.word_ids(batch_index=j)
                n_words = len(words[j])
                dim = hidden.shape[-1]
                sums = np.zeros((n_words, dim), np.float32)
                counts = np.zeros((n_words, 1), np.float32)
                for pos, wid in enumerate(word_ids):
                    if wid is not None:  # skips CLS/SEP/pad
                        sums[wid] += hidden[j, pos]
                        counts[wid] += 1
                id2embeddings[ex["id"]] = sums / np.maximum(counts, 1.0)

    with open(out_file, "wb") as f:
        pickle.dump(id2embeddings, f)
    print(f"wrote {len(id2embeddings)} embeddings to {out_file}")
    return id2embeddings


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Extract contextual word embeddings for the BERT "
                    "input path."
    )
    p.add_argument("data_files", nargs="+", help="TACRED-schema JSON files.")
    p.add_argument("--out", default="id2embeddings.pkl")
    p.add_argument("--model", default="bert-large-uncased")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--device", default="cpu")
    p.add_argument("--max_examples", type=int, default=None)
    args = p.parse_args(argv)
    extract_embeddings(args.data_files, args.out, args.model,
                       args.batch_size, args.device, args.max_examples)


if __name__ == "__main__":
    main()
