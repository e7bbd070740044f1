"""ctypes bindings for the native (C++) graph builder.

Loads ``native/libgraphbuilder.so`` (built by ``make -C native``) and exposes
batched path-centric pruning with the exact semantics of
``gcn_tpu.graph.prune.prune_graph``.  Falls back transparently to the Python
implementation when the library is absent or ``GCN_TPU_NATIVE=0``.

The native builder processes a whole padded batch per call (one FFI
crossing), ~50-100× faster than the per-example Python walker — this is the
host-side hot path the reference re-ran on every forward
(reference ``model/gcn.py:102-112``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native", "libgraphbuilder.so",
    )


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GCN_TPU_NATIVE", "1") == "0":
        return None
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.prune_graph_batch.restype = ctypes.c_int32
    lib.prune_graph_batch.argtypes = [
        _I32P, _I32P, _I32P, _I32P, _I32P,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        _I32P, _I32P, _I32P, _U8P, _U8P, _I32P, _I32P,
    ]
    lib.graph_builder_abi_version.restype = ctypes.c_int32
    if lib.graph_builder_abi_version() != 1:
        return None
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def prune_graph_batch_native(
    heads: np.ndarray,     # [B, N] int32, 1-indexed, 0 = root
    deprels: np.ndarray,   # [B, N] int32
    subj_pos: np.ndarray,  # [B, N] int32
    obj_pos: np.ndarray,   # [B, N] int32
    lengths: np.ndarray,   # [B] int32
    prune_k: int,
):
    """Batched pruning via the native builder.

    Returns (edge_parent, edge_child, edge_deprel, edge_mask, keep,
    num_edges, roots), all [B, N] (edge arrays padded with zeros).
    Raises ValueError if any row is malformed (cycle / no LCA).
    """
    lib = load_library()
    assert lib is not None, "native graph builder not available"
    heads = np.ascontiguousarray(heads, np.int32)
    deprels = np.ascontiguousarray(deprels, np.int32)
    subj_pos = np.ascontiguousarray(subj_pos, np.int32)
    obj_pos = np.ascontiguousarray(obj_pos, np.int32)
    lengths = np.ascontiguousarray(lengths, np.int32)
    b, n = heads.shape
    edge_parent = np.zeros((b, n), np.int32)
    edge_child = np.zeros((b, n), np.int32)
    edge_deprel = np.zeros((b, n), np.int32)
    edge_mask = np.zeros((b, n), np.uint8)
    keep = np.zeros((b, n), np.uint8)
    num_edges = np.zeros((b,), np.int32)
    roots = np.zeros((b,), np.int32)
    rc = lib.prune_graph_batch(
        heads, deprels, subj_pos, obj_pos, lengths, b, n, prune_k,
        edge_parent, edge_child, edge_deprel, edge_mask, keep, num_edges,
        roots,
    )
    if rc != 0:
        raise ValueError(f"native graph builder: invalid arguments (rc={rc})")
    if (num_edges < 0).any():
        bad = np.nonzero(num_edges < 0)[0]
        raise ValueError(
            f"native graph builder: malformed dependency trees at rows "
            f"{bad.tolist()} (cycle or missing root)"
        )
    return (edge_parent, edge_child, edge_deprel, edge_mask.astype(bool),
            keep.astype(bool), num_edges, roots)
