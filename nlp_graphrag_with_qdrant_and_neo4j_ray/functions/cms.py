"""Count-Min sketch — constant-memory approximate point frequencies.

Classic Cormode/Muthukrishnan (2005) estimator: a ``depth × width``
int64 counter matrix; each value increments one counter per row (an
independent hash per row) and a point query takes the MIN over its
``depth`` counters — never an underestimate, overestimates by at most
``e/width × N`` with probability ``1 - e^-depth``.  Like the HLL
(functions/hll.py), partial sketches merge by simple elementwise
addition, so every input batch reduces to one fixed-size row and
merging is associative/commutative — the third mergeable sketch next
to Misra-Gries (exact-ish heavy hitters) and the t-digest (quantiles):
MG answers "which keys are frequent", CMS answers "how frequent is
THIS key" for arbitrary keys after one pass.

Row hashes reuse the engine's vectorized convention
(``pd.util.hash_pandas_object``) with a per-row 16-byte ``hash_key``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["new_counts", "update_counts", "merge_counts", "point_query"]


def _row_key(row: int) -> str:
    return f"cms-row-{row:06d}"[:16].ljust(16, "0")


def new_counts(depth: int = 4, width: int = 4096) -> np.ndarray:
    return np.zeros((depth, width), np.int64)


def _indices(values: pd.Series, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices — one independent 64-bit hash per
    sketch row via distinct hash keys."""
    idx = np.empty((depth, len(values)), np.int64)
    for d in range(depth):
        h = pd.util.hash_pandas_object(values, index=False,
                                       hash_key=_row_key(d))
        idx[d] = (h.to_numpy(np.uint64) % np.uint64(width)).astype(np.int64)
    return idx


def update_counts(values: pd.Series, counts: np.ndarray | None = None,
                  depth: int = 4, width: int = 4096,
                  weights: np.ndarray | None = None) -> np.ndarray:
    if counts is None:
        counts = new_counts(depth, width)
    depth, width = counts.shape
    if len(values) == 0:
        return counts
    idx = _indices(values, depth, width)
    w = np.ones(len(values), np.int64) if weights is None else weights
    for d in range(depth):
        np.add.at(counts[d], idx[d], w)
    return counts


def merge_counts(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def point_query(values: pd.Series, counts: np.ndarray) -> np.ndarray:
    """Estimated frequency per value: min over the depth counters.
    Guaranteed ≥ the true count; ≤ true + (e/width)·N w.h.p."""
    depth, width = counts.shape
    idx = _indices(values, depth, width)
    est = counts[0][idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, counts[d][idx[d]])
    return est
