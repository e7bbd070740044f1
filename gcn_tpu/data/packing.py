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
    """True when the batch is EXACTLY the integer-id layout (not BERT
    floats) on host numpy arrays, with every per-token field sharing one
    width.  Exact-key check: a batch carrying side-band arrays (e.g. the
    halo ``hplan_*`` plans) must NOT pack — ``pack_batch`` would silently
    drop the extra keys and the consumer would fail only via a late
    missing-key trace error."""
    w = batch["words"]
    if not isinstance(w, np.ndarray) or w.ndim != 2 or w.dtype == np.float32:
        return False
    expected = set(field_order("ner" in batch)) | set(_SCALAR_FIELDS) | {
        "example_mask"}
    if set(batch) != expected:
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
    """Jittable inverse of the packers (exact dtypes restored).  Routes on
    the buffer dtype: uint8 = compact wire format, int32 = legacy."""
    if packed.dtype == np.uint8:
        return unpack_batch_compact(packed, has_ner)
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


# --------------------------------------------------------- compact (uint8)
# v2 wire format: the int32 layout spends 4 bytes on every value, but most
# fields are tiny (POS < 48, NER < 15, deprel ids < 85, masks are bits,
# edge indices < pack_len).  Packing to their natural widths cuts the
# buffer ~2.75x (flagship batch: 212 KB -> 77 KB), which is wall-clock on
# any bandwidth-limited feed (the tunneled chip moves ~1 GB/s: 0.22 ms vs
# 0.08 ms per step).  Lossless: dtypes/values restore exactly; the
# device-side byte reassembly is a few shifts the compiler fuses into the
# consumers.  Per-row layout (n tokens):
#   words 4n (int32 LE) | pos n | (ner n) | deprel n | edge_parent 2n
#   (uint16 LE) | edge_child 2n | edge_deprel n | 4 masks n each
#   | lengths 4 (int32 LE) | labels 4 | example_mask 1

_BYTE_FIELDS = ("pos", "ner", "deprel", "edge_deprel")  # values < 256
_U16_FIELDS = ("edge_parent", "edge_child")             # values < 65536


def _check_range(a: np.ndarray, field: str, hi: int) -> np.ndarray:
    """Guard the narrow wire widths with real exceptions: an assert is
    stripped under ``python -O``, and a negative value (e.g. a future -1
    pad) would silently wrap through uint8/uint16 and corrupt training
    data rather than fail."""
    if a.size and (a.min() < 0 or a.max() >= hi):
        raise ValueError(
            f"{field} range [{a.min()}, {a.max()}] does not fit the "
            f"[0, {hi}) wire width")
    return a


def _compact_width(n: int, has_ner: bool) -> int:
    return (16 if has_ner else 15) * n + 9


def pack_batch_compact(batch: dict) -> np.ndarray:
    has_ner = "ner" in batch
    words = np.ascontiguousarray(batch["words"], "<i4")
    b, n = words.shape
    buf = np.empty((b, _compact_width(n, has_ner)), np.uint8)
    col = 0

    def put(raw: np.ndarray) -> None:
        nonlocal col
        w = raw.shape[1] * raw.dtype.itemsize
        buf[:, col:col + w] = raw.view(np.uint8).reshape(b, w)
        col += w

    put(words)
    for f in _BYTE_FIELDS:
        if f == "ner" and not has_ner:
            continue
        a = _check_range(np.asarray(batch[f]), f, 256)
        put(np.ascontiguousarray(a, np.uint8))
    for f in _U16_FIELDS:
        a = _check_range(np.asarray(batch[f]), f, 65536)
        put(np.ascontiguousarray(a, "<u2"))
    for f in _MASK_FIELDS:
        put(np.ascontiguousarray(batch[f], np.uint8))
    put(np.ascontiguousarray(batch["lengths"], "<i4")[:, None])
    put(np.ascontiguousarray(batch["labels"], "<i4")[:, None])
    put(np.ascontiguousarray(batch["example_mask"], np.uint8)[:, None])
    assert col == buf.shape[1]
    return buf


# ------------------------------------------- sentence-packed batches (v2p)
# The cross-sentence packing layout (``data.dataset.PackedBatcher``) adds
# [B,S,N] per-slot masks and [B·S] labels, which the plain packers above
# don't model — without a wire format those batches fall back to ~16
# per-leaf transfers (each a round trip on a tunneled chip) and the
# padding-waste win packing buys is given straight back to the network.
# Layout per row (n tokens, s slots; bools bit-packed along n):
#   words 4n | pos n | (ner n) | deprel n | edge_deprel n
#   | edge_parent 2n | edge_child 2n | edge_mask n | pad_mask n
#   | seg_start n | slot/subj/obj masks s*ceil(n/8) each
#   | lengths 4 | labels 4s | example_mask s

_SP_TOKEN_FIELDS = ("pos", "ner", "deprel", "edge_deprel")
_SP_BYTE_MASKS = ("edge_mask", "pad_mask", "seg_start")
_SP_BIT_MASKS = ("slot_mask", "subj_mask", "obj_mask")


def _sp_expected_keys(has_ner: bool) -> set:
    fields = [f for f in _SP_TOKEN_FIELDS if f != "ner" or has_ner]
    return ({"words", "lengths", "labels", "example_mask"}
            | set(fields) | set(_U16_FIELDS)
            | set(_SP_BYTE_MASKS) | set(_SP_BIT_MASKS))


def sentence_packable(batch: dict) -> bool:
    """True for a PackedBatcher batch (integer ids, [B,S,N] slot masks).
    Exact-key check against the field set ``pack_sentence_batch``
    consumes: ANY side-band key (halo ``hplan_*`` plans or a future
    addition) must fall back to the dict transfer — the packer would
    silently drop it and the consumer would fail only via a late
    missing-key trace error."""
    if "slot_mask" not in batch or not isinstance(
            batch.get("words"), np.ndarray):
        return False
    if set(batch) != _sp_expected_keys("ner" in batch):
        return False
    return batch["words"].ndim == 2


def sp_width(n: int, s: int, has_ner: bool) -> int:
    return ((15 if has_ner else 14) * n
            + 3 * s * ((n + 7) // 8) + 5 * s + 4)


def pack_sentence_batch(batch: dict) -> np.ndarray:
    has_ner = "ner" in batch
    words = np.ascontiguousarray(batch["words"], "<i4")
    b, n = words.shape
    s = batch["slot_mask"].shape[1]
    buf = np.empty((b, sp_width(n, s, has_ner)), np.uint8)
    col = 0

    def put(raw: np.ndarray) -> None:
        nonlocal col
        raw = raw.reshape(b, -1)
        w = raw.shape[1] * raw.dtype.itemsize
        buf[:, col:col + w] = raw.view(np.uint8).reshape(b, w)
        col += w

    put(words)
    for f in _SP_TOKEN_FIELDS:
        if f == "ner" and not has_ner:
            continue
        a = _check_range(np.asarray(batch[f]), f, 256)
        put(np.ascontiguousarray(a, np.uint8))
    for f in _U16_FIELDS:
        a = _check_range(np.asarray(batch[f]), f, 65536)
        put(np.ascontiguousarray(a, "<u2"))
    for f in _SP_BYTE_MASKS:
        put(np.ascontiguousarray(batch[f], np.uint8))
    for f in _SP_BIT_MASKS:
        put(np.packbits(np.asarray(batch[f], bool), axis=-1))
    put(np.ascontiguousarray(batch["lengths"], "<i4")[:, None])
    put(np.ascontiguousarray(batch["labels"], "<i4").reshape(b, s))
    put(np.ascontiguousarray(batch["example_mask"], np.uint8)
        .reshape(b, s))
    assert col == buf.shape[1]
    return buf


def _unbits(by, s: int, n: int):
    # [B, s*ceil(n/8)] uint8 -> [B, s, n] bool (np.packbits bit order)
    cn8 = (n + 7) // 8
    b3 = by.reshape(by.shape[0], s, cn8, 1)
    shifts = np.arange(7, -1, -1, dtype=np.uint8)  # big-endian bits
    bits = (b3 >> shifts) & 1
    return bits.reshape(by.shape[0], s, cn8 * 8)[:, :, :n].astype(bool)


def unpack_sentence_batch(packed, n: int, s: int, has_ner: bool) -> dict:
    """Jittable inverse of ``pack_sentence_batch`` (n, s static)."""
    batch = {}
    col = 0

    def take(w):
        nonlocal col
        sl = packed[:, col:col + w]
        col += w
        return sl

    batch["words"] = _le32(take(4 * n))
    for f in _SP_TOKEN_FIELDS:
        if f == "ner" and not has_ner:
            continue
        batch[f] = take(n).astype("int32")
    for f in _U16_FIELDS:
        batch[f] = _le16(take(2 * n))
    for f in _SP_BYTE_MASKS:
        batch[f] = take(n).astype(bool)
    for f in _SP_BIT_MASKS:
        batch[f] = _unbits(take(s * ((n + 7) // 8)), s, n)
    batch["lengths"] = _le32(take(4))[:, 0]
    batch["labels"] = _le32(take(4 * s)).reshape(-1)
    batch["example_mask"] = take(s).reshape(-1).astype(bool)
    return batch


def _le32(by):  # [B, 4k] uint8 -> [B, k] int32 (little-endian)
    b4 = by.reshape(by.shape[0], -1, 4).astype("int32")
    return b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16) | (
        b4[..., 3] << 24)


def _le16(by):  # [B, 2k] uint8 -> [B, k] int32
    b2 = by.reshape(by.shape[0], -1, 2).astype("int32")
    return b2[..., 0] | (b2[..., 1] << 8)


def unpack_batch_compact(packed, has_ner: bool) -> dict:
    """Jittable inverse of ``pack_batch_compact``."""
    n = (packed.shape[1] - 9) // (16 if has_ner else 15)
    batch = {}
    col = 0

    def take(w):
        nonlocal col
        s = packed[:, col:col + w]
        col += w
        return s

    batch["words"] = _le32(take(4 * n))
    for f in _BYTE_FIELDS:
        if f == "ner" and not has_ner:
            continue
        batch[f] = take(n).astype("int32")
    for f in _U16_FIELDS:
        batch[f] = _le16(take(2 * n))
    for f in _MASK_FIELDS:
        batch[f] = take(n).astype(bool)
    batch["lengths"] = _le32(take(4))[:, 0]
    batch["labels"] = _le32(take(4))[:, 0]
    batch["example_mask"] = take(1)[:, 0].astype(bool)
    return batch
