"""COO ↔ CSR conversion for batched dependency forests.

The framework's canonical device format is padded COO edge lists (scatter-
and onehot-friendly on TPU).  CSR (row_ptr + sorted col indices) is the
interchange format for external sparse tooling and for degree-ordered
iteration; these helpers convert losslessly.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class CSRGraph(NamedTuple):
    row_ptr: np.ndarray   # [N+1] int32 — edges of row i at [ptr[i], ptr[i+1])
    col_idx: np.ndarray   # [E] int32 — child indices, grouped by parent
    edge_val: np.ndarray  # [E] int32 — deprel ids, aligned with col_idx


def coo_to_csr(
    parent: np.ndarray, child: np.ndarray, deprel: np.ndarray, n: int
) -> CSRGraph:
    """Sort one example's COO edges into CSR (stable order within a row)."""
    parent = np.asarray(parent, np.int64)
    order = np.argsort(parent, kind="stable")
    counts = np.bincount(parent, minlength=n)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    return CSRGraph(
        row_ptr=row_ptr,
        col_idx=np.asarray(child, np.int32)[order],
        edge_val=np.asarray(deprel, np.int32)[order],
    )


def csr_to_coo(g: CSRGraph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = g.row_ptr.shape[0] - 1
    counts = np.diff(g.row_ptr)
    parent = np.repeat(np.arange(n, dtype=np.int32), counts)
    return parent, g.col_idx.copy(), g.edge_val.copy()
