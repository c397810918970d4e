"""HyperLogLog — constant-memory approximate COUNT(DISTINCT).

Pure-numpy vectorized implementation of the classic estimator
(Flajolet/Fusy/Gandouet/Meunier 2007) with the standard small-range
linear-counting correction.  Registers are a ``uint8`` array of
``m = 2**p`` cells (p=12 → 4 KB, ~1.6 % standard error); per-batch
register arrays merge with an elementwise ``max``, which is what makes
the sketch embarrassingly distributable: every batch reduces to one
4 KB row, partial sketches merge associatively/commutatively in any
order, and the final estimate reads one register array.

Hashing is the engine's shuffle convention —
``pd.util.hash_pandas_object`` (64-bit, process-stable, vectorized) —
so the same value hashes identically in every task.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "new_registers",
    "update_registers",
    "grouped_registers",
    "merge_registers",
    "estimate",
]


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized ``int.bit_length`` for a uint64 array (float
    log2 is off-by-one near exact powers of two at 53+ bits)."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    return bl + x.astype(np.int64)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def new_registers(p: int) -> np.ndarray:
    return np.zeros(1 << p, np.uint8)


def update_registers(hashes: np.ndarray, p: int,
                     regs: np.ndarray | None = None) -> np.ndarray:
    """Fold a batch of 64-bit hashes into (new or existing) registers:
    the top ``p`` bits pick the register, the rank is the position of
    the first set bit in the remaining ``64-p``."""
    if regs is None:
        regs = new_registers(p)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def grouped_registers(hashes: np.ndarray, codes: np.ndarray,
                      n_groups: int, p: int) -> np.ndarray:
    """Registers per group code in one vectorized pass — returns a
    ``(n_groups, m)`` uint8 matrix (the grouped combiner; memory is
    m bytes × groups-in-batch, the inherent cost of grouped HLL)."""
    m = 1 << p
    flat = np.zeros(n_groups * m, np.uint8)
    if len(hashes) == 0:
        return flat.reshape(n_groups, m)
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(flat, codes.astype(np.int64) * m + idx, rho)
    return flat.reshape(n_groups, m)


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with the linear-counting
    small-range correction (the regime the correction matters in is
    exactly the per-group case)."""
    m = regs.shape[-1]
    est = _alpha(m) * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return float(m * np.log(m / zeros))
    return float(est)
