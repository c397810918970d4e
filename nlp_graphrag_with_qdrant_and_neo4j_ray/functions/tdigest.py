"""Merging t-digest — a mergeable quantile sketch (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests", 2019; public
algorithm).  The scale path for per-group quantiles over UNBOUNDED
groups, where the exact operator's contract (a whole group fits one
partition) breaks: each batch compresses its values into a bounded
centroid list, centroid lists merge associatively through the exchange,
and the final digest answers any quantile with rank error O(1/δ)
concentrated at the tails.

Pure numpy, deterministic for a given sequence of merges: centroids are
(mean, weight) pairs kept sorted by mean; compression walks them in
order and greedily merges while the k1 scale-function width
k(q_right) − k(q_left) ≤ 1, with k(q) = δ/(2π)·asin(2q−1).
"""

from __future__ import annotations

import numpy as np

__all__ = ["compress", "merge", "quantile", "from_values"]


def _k_scale(q: float, delta: float) -> float:
    import math

    return delta / (2.0 * math.pi) * math.asin(
        2.0 * min(max(q, 0.0), 1.0) - 1.0
    )


def _k_inv(k: float, delta: float) -> float:
    import math

    return (math.sin(2.0 * math.pi * k / delta) + 1.0) / 2.0


def compress(means: np.ndarray, weights: np.ndarray,
             delta: float = 200.0) -> tuple[np.ndarray, np.ndarray]:
    """Merge adjacent centroids (sorted by mean) under the k1 size
    constraint — the merging digest's compression, structured as a loop
    over OUTPUT clusters (≤ ~2δ iterations; each cluster's members are
    found by one ``searchsorted`` and reduced vectorized), not over
    input centroids, so a million singletons compress in ~2δ numpy
    slice reductions.  Cluster boundary: starting at cumulative
    quantile q_lo, the cluster may absorb weight up to
    ``q_limit = k⁻¹(k(q_lo) + 1)`` (Dunning & Ertl's merge rule)."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    means = np.asarray(means, np.float64)[order]
    weights = np.asarray(weights, np.float64)[order]
    total = float(weights.sum())
    cumw = np.cumsum(weights)

    out_m: list[float] = []
    out_w: list[float] = []
    idx, n = 0, len(means)
    w_before = 0.0
    while idx < n:
        q_limit = _k_inv(_k_scale(w_before / total, delta) + 1.0, delta)
        # rightmost centroid whose cumulative weight fits the cluster
        j = int(np.searchsorted(cumw, q_limit * total + 1e-9,
                                side="right"))
        j = max(j, idx + 1)  # always take at least one centroid
        w = float(cumw[j - 1]) - w_before
        out_m.append(
            float(np.dot(means[idx:j], weights[idx:j]) / w)
        )
        out_w.append(w)
        w_before = float(cumw[j - 1])
        idx = j
    return np.array(out_m), np.array(out_w)


def from_values(values: np.ndarray,
                delta: float = 200.0) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, np.float64)
    v = v[~np.isnan(v)]
    return compress(v, np.ones(len(v)), delta)


def merge(digests: list[tuple[np.ndarray, np.ndarray]],
          delta: float = 200.0) -> tuple[np.ndarray, np.ndarray]:
    """Associatively merge centroid lists: concatenate, re-sort,
    re-compress."""
    if not digests:
        return np.array([]), np.array([])
    means = np.concatenate([d[0] for d in digests])
    weights = np.concatenate([d[1] for d in digests])
    return compress(means, weights, delta)


def quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile by linear interpolation between centroid
    means at their midpoint ranks (the standard t-digest estimator)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    # midpoint cumulative rank of each centroid
    cum = np.cumsum(weights) - weights / 2.0
    target = q * total
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    idx = np.searchsorted(cum, target) - 1
    span = cum[idx + 1] - cum[idx]
    frac = 0.0 if span == 0 else (target - cum[idx]) / span
    return float(means[idx] + frac * (means[idx + 1] - means[idx]))
