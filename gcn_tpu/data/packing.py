"""Single-buffer batch transfer: pack the 13-array batch dict into ONE
int32 array on the host and unpack it inside the jitted step.

Why: every jitted call transfers its numpy arguments leaf-by-leaf, and on
a network-tunneled TPU each transfer pays a round trip — measured ~4.3 ms
blocked for the 13-leaf flagship batch (~0.3 ms/leaf, RTT-bound: the whole
batch is only ~200 KB).  Packing turns that into one transfer; the
device-side unpack is a few static slices that XLA fuses into the
consumers for free.

Layout (all int32, [B, 11*N + 3] for TACRED, [B, 10*N + 3] for SemEval):

    words | pos | (ner) | deprel | edge_parent | edge_child | edge_deprel
    | edge_mask | subj_mask | obj_mask | pad_mask        (N columns each)
    | lengths | labels | example_mask                     (1 column each)

Bool masks are stored as 0/1 and cast back on device.  The BERT input
path (float [B, N, D] words) keeps the plain dict transfer — its words
tensor dominates the leaf count there anyway.

``pack_batch`` is host-side numpy; ``unpack_batch`` is jittable and
recovers the exact dict (dtypes included), round-trip-tested.
"""

from __future__ import annotations

import numpy as np

_INT_FIELDS = ("words", "pos", "ner", "deprel", "edge_parent",
               "edge_child", "edge_deprel")
_MASK_FIELDS = ("edge_mask", "subj_mask", "obj_mask", "pad_mask")
_SCALAR_FIELDS = ("lengths", "labels")  # + example_mask (bool)


def packable(batch: dict) -> bool:
    """True when the batch is the integer-id layout (not BERT floats) on
    host numpy arrays, with every per-token field sharing one width."""
    w = batch["words"]
    if not isinstance(w, np.ndarray) or w.ndim != 2 or w.dtype == np.float32:
        return False
    n = w.shape[1]
    return all(
        isinstance(batch[f], np.ndarray) and batch[f].shape == (w.shape[0], n)
        for f in field_order("ner" in batch) if f != "words"
    )


def field_order(has_ner: bool) -> tuple:
    fields = [f for f in _INT_FIELDS if f != "ner" or has_ner]
    return tuple(fields) + _MASK_FIELDS


def pack_batch(batch: dict) -> np.ndarray:
    """[B, k*N + 3] int32 single-buffer view of the batch (host-side)."""
    has_ner = "ner" in batch
    cols = [np.asarray(batch[f], np.int32) for f in field_order(has_ner)]
    cols.append(np.asarray(batch["lengths"], np.int32)[:, None])
    cols.append(np.asarray(batch["labels"], np.int32)[:, None])
    cols.append(np.asarray(batch["example_mask"], np.int32)[:, None])
    return np.concatenate(cols, axis=1)


def unpack_batch(packed, has_ner: bool) -> dict:
    """Jittable inverse of ``pack_batch`` (exact dtypes restored)."""
    fields = field_order(has_ner)
    n = (packed.shape[1] - 3) // len(fields)
    batch = {}
    for i, f in enumerate(fields):
        col = packed[:, i * n : (i + 1) * n]
        batch[f] = col.astype(bool) if f in _MASK_FIELDS else col
    base = len(fields) * n
    batch["lengths"] = packed[:, base]
    batch["labels"] = packed[:, base + 1]
    batch["example_mask"] = packed[:, base + 2].astype(bool)
    return batch
